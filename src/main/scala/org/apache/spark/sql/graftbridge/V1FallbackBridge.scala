package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Version bridge: [[V2TableWithV1Fallback]] is `private[sql]` at the
  * Scala level (public bytecode) — re-exported here so
  * `graft.plans.TxNamedTable` can implement it. DataStreamWriter.toTable
  * reads `v1Table.provider` + `location` off this trait to route a
  * streaming write to the V1 sink when the table doesn't advertise
  * STREAMING_WRITE. */
trait V1FallbackBridge extends V2TableWithV1Fallback

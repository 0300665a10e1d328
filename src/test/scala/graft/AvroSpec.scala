package graft

import graft.sources.Avro
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-trip identity for the Avro mini-connector across its full type
  * surface (q210 gates the orders-table subset against the oracle). */
class AvroSpec extends SparkSpecBase {

  test("write→read round-trips every supported type, nulls included") {
    import spark.implicits._
    val df = spark.range(0, 100)
      .select(col("id"),
        col("id").cast("int").as("i"),
        (col("id") * 1.5).as("d"),
        col("id").cast("float").as("f"),
        (col("id") % 2 === 0).as("b"),
        concat(lit("s"), col("id")).as("s"),
        when(col("id") % 7 === 3, lit(null)).otherwise(concat(lit("n"), col("id"))).as("ns"),
        to_date(lit("2024-01-01")).as("day"),
        lit("2024-03-05 06:07:08.123456").cast("timestamp").as("ts"),
        (col("id") * 100 + lit(0.25)).cast("decimal(18,2)").as("dec"),
        encode(concat(lit("b"), col("id")), "UTF-8").as("bin"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_spec"
    Avro.write(df, path)
    val back = Avro.read(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    val b = back.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    assert(a.toSeq === b.toSeq)
    assert(back.filter(col("ns").isNull).count() === df.filter(col("ns").isNull).count())
  }

  test("array columns round-trip: the embeddings table itself survives") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_emb"
    Avro.write(emb, path)
    val back = Avro.read(spark, path)
    assert(back.schema("embedding").dataType ===
      ArrayType(FloatType, containsNull = false))
    val a = emb.orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("files are standard OCF: a plain avro reader sees the rows") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_plain"
    Avro.write(df.repartition(1), path)
    val f = new java.io.File(path).listFiles()
      .find(_.getName.endsWith(".avro")).get
    val r = new org.apache.avro.file.DataFileReader(f,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val recs = try {
      val b = collection.mutable.ArrayBuffer.empty[(Long, String)]
      while (r.hasNext) { val rec = r.next(); b += ((rec.get("k").asInstanceOf[Long], rec.get("v").toString)) }
      b.toSeq
    } finally r.close()
    assert(recs.sorted === Seq((1L, "x"), (2L, "y")))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkSpecBase {
  /** One-time (per test JVM) wipe of the scratch warehouse: the catalog is
    * in-memory per JVM but `spark.sql.warehouse.dir` persists on disk, so
    * managed-table directories from a previous (possibly killed) run are
    * ORPHANS the fresh catalog knows nothing about — a raw `saveAsTable`
    * then dies with LOCATION_ALREADY_EXISTS. The Warehouse helpers clean
    * orphan locations themselves; tests using plain writers need a clean
    * slate. Runs before the shared session exists, so nothing can hold
    * references into the wiped tree. */
  private lazy val cleanWarehouse: Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse"))
  }
}

/** Shared local session for all suites (one JVM-wide session — getOrCreate
  * reuses it, so the suite pack pays Spark startup once). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSpecBase.cleanWarehouse
    Sessions.local("4")
  }
  lazy val sf: String = "/root/testdata/sf0.001"
}

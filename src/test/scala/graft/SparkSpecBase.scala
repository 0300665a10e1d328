package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — getOrCreate
  * reuses it, so the suite pack pays Spark startup once). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
  lazy val sf: String = "/root/testdata/sf0.001"
}

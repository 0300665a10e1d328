package graft

import org.apache.spark.sql.functions._

/** The custom kernels registered through SparkSessionExtensions must be
  * callable from plain SQL and agree with the Column API. */
class SqlFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("simhash64 / minhash_signature / ngram_hashes callable from SQL == Column API") {
    Seq((1L, Seq(11L, 22L, 33L, 44L))).toDF("id", "hs").createOrReplaceTempView("t_hashes")
    val sql = spark.sql(
      """SELECT simhash64(hs) AS sh, minhash_signature(hs, 8) AS mh,
        |       ngram_hashes(hs, 2) AS ng FROM t_hashes""".stripMargin).head
    val api = spark.table("t_hashes").select(
      graft.plans.TextExprs.simhash64($"hs").as("sh"),
      graft.plans.TextExprs.minhashSignature($"hs", 8).as("mh"),
      graft.plans.TextExprs.ngramHashes($"hs", 2).as("ng")).head
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getSeq[Long](1) == api.getSeq[Long](1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
  }

  test("float_array_dot and pair_array callable from SQL") {
    val r = spark.sql(
      """SELECT float_array_dot(CAST(array(1.0, 2.0) AS array<float>),
        |                       CAST(array(3.0, 4.0) AS array<float>)) AS d,
        |       pair_array(array(3L, 1L, 2L, 1L)) AS p""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    val pairs = r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("rolling_fingerprints callable from SQL; non-literal k rejected at analysis") {
    val ok = spark.sql("SELECT rolling_fingerprints('abcdefgh abcdefgh', 8, 4) AS f").head
    assert(ok.getSeq[Long](0).nonEmpty)
    val err = intercept[Exception] {
      spark.sql("SELECT rolling_fingerprints('abc', CAST(id AS INT), 4) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}

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
      ArrayType(FloatType, containsNull = true))
    val a = emb.orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("arrays with null elements round-trip as real nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0)),
      (2L, Seq[java.lang.Double](null)),
      (3L, Seq.empty[java.lang.Double])
    ).toDF("k", "xs")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_nullelem"
    Avro.write(df, path)
    val back = Avro.read(spark, path)
    assert(back.schema("xs").dataType === ArrayType(DoubleType, containsNull = true))
    val got = back.orderBy("k").collect().map(r => (r.getLong(0), r.getSeq[Any](1))).toSeq
    assert(got === Seq(
      (1L, Seq(1.0, null, 3.0)), (2L, Seq(null)), (3L, Seq.empty)))
  }

  test("struct columns round-trip, including null structs and null fields") {
    import spark.implicits._
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, named_struct('a', 10, 'b', 'x')),
        |  (2L, named_struct('a', CAST(NULL AS INT), 'b', 'y')),
        |  (3L, CAST(NULL AS STRUCT<a: INT, b: STRING>))
        |AS t(k, s)""".stripMargin)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_struct"
    Avro.write(df, path)
    val back = Avro.read(spark, path)
    assert(back.schema("s").dataType ===
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    val got = back.orderBy("k").collect().map(_.toSeq).toSeq
    assert(got === Seq(
      Seq(1L, org.apache.spark.sql.Row(10, "x")),
      Seq(2L, org.apache.spark.sql.Row(null, "y")),
      Seq(3L, null)))
  }

  test("array-of-struct (the product_metadata basket shape) round-trips") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(named_struct('product_id', 7L, 'quantity', 2, 'price', CAST(9.99 AS DOUBLE)),
        |             named_struct('product_id', 8L, 'quantity', 1, 'price', CAST(1.50 AS DOUBLE)))),
        |  (2L, array(CAST(NULL AS STRUCT<product_id: BIGINT, quantity: INT, price: DOUBLE>))),
        |  (3L, array())
        |AS t(txn, items)""".stripMargin)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_aos"
    Avro.write(df, path)
    val back = Avro.read(spark, path)
    val got = back.orderBy("txn").collect().map(_.toSeq).toSeq
    val want = df.orderBy("txn").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("a directory mixing incompatible writer schemas fails loudly") {
    import spark.implicits._
    val p1 = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_mix_a"
    val p2 = s"${System.getProperty("java.io.tmpdir")}/graft-io/avro_mix"
    // same column name, different decimal scale — the silent-corruption case
    Avro.write(Seq(1L).toDF("k").select(col("k"),
      lit("12.34").cast("decimal(10,2)").as("m")).repartition(1), p1)
    Avro.write(Seq(2L).toDF("k").select(col("k"),
      lit("12.345").cast("decimal(10,3)").as("m")).repartition(1), p2)
    val dir = new java.io.File(p2)
    val src = new java.io.File(p1).listFiles().find(_.getName.endsWith(".avro")).get
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(dir, "part-zzz-other.avro").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val ex = intercept[org.apache.spark.SparkException] {
      Avro.read(spark, p2).collect()
    }
    assert(ex.getMessage.contains("writer schema decodes to") ||
      Option(ex.getCause).exists(_.getMessage.contains("writer schema decodes to")))
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

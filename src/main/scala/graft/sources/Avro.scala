package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Minimal Avro container-file source/sink — third-format interchange
  * parity beside parquet and ORC (q131). The Spark distribution here
  * ships only the CORE avro libraries (no `spark-avro` DataSource
  * module), so this is a real mini-connector, not a format("avro")
  * shim: the writer runs as one `mapPartitions` pass emitting a
  * standard Avro Object Container File per partition (deflate codec,
  * standard logical types — date as int/date, timestamp as
  * long/timestamp-micros, decimal as bytes/decimal), and the reader
  * distributes one task per file. Any stock Avro tool reads the
  * output; files written by other producers read back as long as they
  * stick to the supported types.
  *
  * Type surface: primitives + the logical types above, STRUCT columns
  * (Avro record), and arrays of either — nested recursively, so the
  * reference's `product_metadata` basket shape (array of item records,
  * data_generator.py:63-67) rides the interchange format end-to-end
  * (q210b). Every field, nested field, and array ELEMENT is written as
  * a nullable union `[null, T]`: a null element in a
  * `containsNull` array round-trips as a real null instead of
  * corrupting to 0/""/NPE.
  *
  * Scale shape: write is embarrassingly parallel (one task = one file,
  * no shuffle); read parallelism is one task per file — Avro container
  * files are block-splittable in principle, but per-file tasks are the
  * right grain for interchange-sized extracts (the 100 TB fact paths
  * stay on parquet/ORC; Avro is the row-oriented EXCHANGE format, the
  * role it plays in every warehouse). Task retries overwrite their own
  * file (idempotent names, overwrite=true), so a re-executed task never
  * double-lands rows. The reader ships the FILE LIST (never a
  * comma-joined string — paths with commas stay intact) and closes its
  * container stream on task completion, so an early-terminating
  * consumer (`limit`) cannot leak handles.
  */
object Avro {

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  /** Spark → Avro schema for one (non-null) type. `path` builds unique
    * names for nested record types (Avro named-type requirement). */
  private def avroType(dt: DataType, path: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, _) =>
      Schema.createArray(nullable(avroType(et, s"${path}_item")))
    case st: StructType =>
      Schema.createRecord(path, null, "graft", false,
        st.fields.map { f =>
          new Schema.Field(f.name, nullable(avroType(f.dataType, s"${path}_${f.name}")),
            null, Schema.Field.NULL_DEFAULT_VALUE)
        }.toList.asJava)
    case other =>
      throw new IllegalArgumentException(
        s"Avro sink: unsupported Spark type $other at $path")
  }

  /** Spark → Avro schema. Every field (at any depth) and every array
    * element is a nullable union — the interchange-friendly default, and
    * what reading back through [[read]] assumes. */
  def avroSchema(st: StructType, recordName: String = "graft_row"): Schema =
    avroType(st, recordName)

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def sparkType(s0: Schema): DataType = {
    val s = unwrap(s0)
    (s.getType, Option(s.getLogicalType)) match {
      case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
      case (Schema.Type.LONG, Some(_: LogicalTypes.LocalTimestampMicros)) => TimestampNTZType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, Some(d: LogicalTypes.Decimal)) =>
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BYTES, _) => BinaryType
      case (Schema.Type.ARRAY, _) =>
        ArrayType(sparkType(s.getElementType), containsNull = true)
      case (Schema.Type.RECORD, _) =>
        StructType(s.getFields.asScala.map(f =>
          StructField(f.name(), sparkType(f.schema()), nullable = true)).toArray)
      case (t, _) =>
        throw new IllegalArgumentException(s"Avro source: unsupported type $t")
    }
  }

  /** Avro → Spark schema (unions `[null, T]` unwrap to nullable T). */
  def sparkSchema(avro: Schema): StructType =
    sparkType(avro).asInstanceOf[StructType]

  // ---- writer: Catalyst InternalRow → Avro generic ----------------------

  /** Recursive getter: reads ordinal `i` of `g` as Spark type `dt` and
    * returns the Avro-generic value (`avro` is the NON-NULL branch of
    * the target field/element schema). Null checks happen at the caller
    * (top level) or inside the array/struct walkers (nested). */
  private def toAvro(g: SpecializedGetters, i: Int, dt: DataType,
                     avro: Schema, conv: org.apache.avro.Conversions.DecimalConversion): AnyRef =
    dt match {
      case LongType => Long.box(g.getLong(i))
      case IntegerType => Int.box(g.getInt(i))
      case DoubleType => Double.box(g.getDouble(i))
      case FloatType => Float.box(g.getFloat(i))
      case BooleanType => Boolean.box(g.getBoolean(i))
      case StringType => g.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(g.getBinary(i))
      case DateType => Int.box(g.getInt(i)) // Catalyst date = epoch days
      case TimestampType | TimestampNTZType =>
        Long.box(g.getLong(i)) // Catalyst ts = micros
      case d: DecimalType =>
        conv.toBytes(g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal,
          avro, avro.getLogicalType)
      case ArrayType(et, _) =>
        val arr: ArrayData = g.getArray(i)
        val elemSchema = unwrap(avro.getElementType)
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(if (arr.isNullAt(j)) null
                  else toAvro(arr, j, et, elemSchema, conv))
          j += 1
        }
        out
      case st: StructType =>
        val row = g.getStruct(i, st.length)
        val rec = new GenericData.Record(avro)
        var j = 0
        while (j < st.length) {
          val f = st.fields(j)
          rec.put(f.name,
            if (row.isNullAt(j)) null
            else toAvro(row, j, f.dataType,
              unwrap(avro.getField(f.name).schema()), conv))
          j += 1
        }
        rec
      case other => sys.error(s"Avro sink: unsupported $other")
    }

  /** Write `df` as one Avro container file per partition under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = new Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(out, true); fs.mkdirs(out)
    // count() forces the job; the per-partition writer is the side effect
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val file = new Path(path, f"part-$pid%05d.avro")
      val fsw = file.getFileSystem(hconf.value)
      val os = fsw.create(file, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(schema, os)
      val conv = new org.apache.avro.Conversions.DecimalConversion
      var n = 0L
      rows.foreach { ir =>
        val rec = new GenericData.Record(schema)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name,
            if (ir.isNullAt(i)) null
            else toAvro(ir, i, f.dataType,
              unwrap(schema.getField(f.name).schema()), conv))
        }
        writer.append(rec); n += 1
      }
      writer.close()
      Iterator.single(n)
    }.count(): Unit
  }

  // ---- reader: Avro generic → Row ----------------------------------------

  private def fromAvro(v: AnyRef, dt: DataType,
                       conv: org.apache.avro.Conversions.DecimalConversion): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate
          .ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val us = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case d: DecimalType =>
        // decimal bytes carry their schema on the enclosing record field;
        // re-derive from precision/scale (two's-complement unscaled bytes)
        val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
        val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[AnyRef]].asScala
          .map(e => fromAvro(e, et, conv)).toSeq
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toSeq.map(f => fromAvro(rec.get(f.name), f.dataType, conv)))
      case _ => v
    }

  /** Read an Avro container-file directory back as a DataFrame. The
    * schema comes from the FIRST file's embedded writer schema (one
    * driver-side open); every file must carry a compatible one. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"Avro.read: no .avro files under $path")
    val first = new DataFileStream(fs.open(files.head),
      new GenericDatumReader[GenericRecord]())
    val writerSchema = try first.getSchema finally first.close()
    val st = sparkSchema(writerSchema)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val paths = files.map(_.toString).toSeq
    val rdd = spark.sparkContext
      .parallelize(paths, paths.length) // one task per file, no comma-join
      .flatMap { p =>
        val file = new Path(p)
        val in = new DataFileStream(file.getFileSystem(hconf.value).open(file),
          new GenericDatumReader[GenericRecord]())
        // every file must decode to the SAME Spark schema as the first
        // file's (decimal scale in particular is baked into fromAvro's
        // target type) — a producer mix with a different scale must fail
        // loudly here, not silently land values off by powers of ten
        val fileSt = sparkSchema(in.getSchema)
        if (fileSt != st)
          throw new IllegalStateException(
            s"Avro.read: $p writer schema decodes to $fileSt, " +
            s"but the directory schema (from the first file) is $st")
        // close on task COMPLETION, not iterator exhaustion — a limit()
        // that stops early must not leak the handle
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val conv = new org.apache.avro.Conversions.DecimalConversion
        new Iterator[Row] {
          def hasNext: Boolean = in.hasNext
          def next(): Row = {
            val rec = in.next()
            Row.fromSeq(st.fields.toSeq.map(f =>
              fromAvro(rec.get(f.name), f.dataType, conv)))
          }
        }
      }
    spark.createDataFrame(rdd, st)
  }
}

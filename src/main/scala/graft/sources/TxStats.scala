package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Per-file column min/max statistics riding the transaction log — the
  * Delta/Iceberg data-skipping move: each commit records, for every data
  * file it adds, the footer min/max of the skippable columns, and
  * [[TxFileIndex]] evaluates the scan's `dataFilters` against those
  * ranges BEFORE any task launches. At 100 TB this is the difference
  * between "prune to the partition" and "prune to the file": a point or
  * range predicate on a clustered/monotonic column (event time, ingest
  * batch key, id range) reads O(matching files), not O(partition).
  *
  * Collection is a footer-metadata job — O(files) tasks touching only
  * row-group headers, never data pages — run once per [[TxLog.stage]],
  * distributed so a large batch commit never serializes footer reads on
  * the driver. Skipping is CONSERVATIVE by construction: a file with no
  * recorded stat for a column (all-null row group, binary/string
  * physical type, pre-stats log generations, INT96 timestamps) is never
  * skipped, and only predicate shapes whose range logic is airtight
  * (comparison/equality/IN against a same-typed non-null literal)
  * participate. String bounds are recorded under the truncation contract
  * (prefix min, widened max — see [[eligible]]) with a strict UTF-8
  * round-trip guard, compared in UTF8String (unsigned byte) order —
  * exactly parquet's UNSIGNED sort order for STRING-annotated binary.
  *
  * Reference behavior anchor: the reference warehouse reads filter on
  * numeric/date keys after loading whole tables
  * (ecommerce-etl-pipeline `sales_analytics_dag.py` date-window scans);
  * here the same predicates prune at file granularity instead.
  */
object TxStats {

  /** Spark types whose parquet footer statistics are recorded. Strings
    * ride the Delta/Iceberg TRUNCATION contract: the recorded min is a
    * ≤[[StringStatChars]]-code-point prefix of the true min (a prefix is
    * ≤ the full value in UTF-8 byte order), the recorded max is the
    * truncated true max WIDENED by one code point (strictly above every
    * value sharing the prefix) — so bounds stay tiny in the log while
    * range logic stays conservative, and the reference's hottest
    * predicates (string keys like session_id / event_name,
    * `init_db.py:113-116`) prune at file granularity. */
  def eligible(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType |
         StringType => true
    case d: DecimalType => d.precision <= 18 // INT32/INT64-backed unscaled
    case _ => false
  }

  /** Code-point budget for recorded string bounds. */
  val StringStatChars = 32

  /** Footer-stat collection for freshly staged files — row-group
    * metadata only, no data page is ever read. Small batches (the
    * steady-state commit: a stream epoch, a partition-scoped compaction)
    * read footers on a driver-side thread pool — a Spark job's schedule/
    * serialize overhead would dominate sub-millisecond footer reads.
    * Large batches (an initial backfill staging thousands of files) fan
    * out as one job so the driver never serializes O(files) round trips
    * to an object store. Returns relFile → col → (min, max) in the
    * log's string encoding. */
  def collect(spark: SparkSession, root: String, relFiles: Seq[String],
              schema: StructType)
      : (Map[String, Map[String, (String, String)]], Map[String, Long]) = {
    val cols = schema.fields.filter(f => eligible(f.dataType)).map(_.name).toSet
    if (relFiles.isEmpty) return (Map.empty, Map.empty)
    val raw: Map[String, (Long, Map[String, (String, String)])] =
      if (relFiles.size <= DriverSideMax) {
        val conf = spark.sparkContext.hadoopConfiguration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, relFiles.size))
        try {
          import scala.jdk.CollectionConverters._
          val tasks = relFiles.map { rel =>
            new java.util.concurrent.Callable[(String, (Long, Map[String, (String, String)]))] {
              def call() = rel -> fileStats(conf, new Path(root, rel), cols)
            }
          }
          pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
        } finally pool.shutdown()
      } else {
        val conf = new SerializableWritable(spark.sparkContext.hadoopConfiguration)
        spark.sparkContext
          .parallelize(relFiles, math.max(1, math.min(relFiles.size, 32)))
          .map(rel => rel -> fileStats(conf.value, new Path(root, rel), cols))
          .collect().toMap
      }
    (raw.collect { case (f, (_, st)) if st.nonEmpty => f -> st },
      raw.map { case (f, (n, _)) => f -> n })
  }

  /** Below this many staged files, footer reads stay on the driver pool. */
  private val DriverSideMax = 512

  /** Footer ROW COUNT plus min/max per eligible column of one file. A
    * column with ANY row group lacking usable numeric stats yields no
    * entry at all — a partial range would skip files it must not. The
    * row count is exact regardless (every footer carries it). */
  private[sources] def fileStats(conf: Configuration, file: Path,
      cols: Set[String]): (Long, Map[String, (String, String)]) = {
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      var rows = 0L
      val acc = mutable.Map.empty[String, (Any, Any)]
      val dead = mutable.Set.empty[String]
      // FOOTER UNIT GUARD: the log's decode() assumes timestamp longs are
      // MICROS — a writer configured with outputTimestampType=
      // TIMESTAMP_MILLIS records millis, which decoded as micros are
      // ~1000× too small and would skip LIVE files. Record timestamp
      // stats only when the parquet logical type proves the unit.
      val schema = rdr.getFooter.getFileMetaData.getSchema
      def annotation(name: String) =
        schema.getFields.asScala.find(_.getName == name)
          .flatMap(t => Option(t.getLogicalTypeAnnotation))
      def unitOk(name: String): Boolean =
        annotation(name) match {
          case Some(ts: org.apache.parquet.schema.LogicalTypeAnnotation
                        .TimestampLogicalTypeAnnotation) =>
            ts.getUnit ==
              org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS
          case _ => true // non-timestamp logical types decode unit-free
        }
      // BINARY stats are usable only when the logical type proves UTF-8
      // content with the unsigned comparator (plain BINARY without the
      // STRING annotation orders however the writer chose)
      def isUtf8(name: String): Boolean =
        annotation(name).exists(
          _.isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation
            .StringLogicalTypeAnnotation])
      rdr.getFooter.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        block.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString // top-level columns only
          if (cols.contains(name) && !dead.contains(name)) {
            val st = cc.getStatistics
            val mnmx =
              if (st != null && !st.isEmpty && st.hasNonNullValue)
                (st.genericGetMin, st.genericGetMax)
              else null
            mnmx match {
              // INT32/INT64/FLOAT/DOUBLE physical stats only — Binary
              // (strings, INT96, wide decimals) and Boolean fall through.
              // A NaN in either bound poisons the column: a NaN-bearing
              // footer min/max makes every range comparison unsound
              // (legacy writers folded NaN in with Math.min/max semantics).
              case (mn: java.lang.Number, mx: java.lang.Number)
                  if supported(mn) && supported(mx) &&
                     !isNaN(mn) && !isNaN(mx) && unitOk(name) =>
                val merged = acc.get(name) match {
                  case Some((m0, x0)) => (minOf(m0, mn), maxOf(x0, mx))
                  case None => (mn: Any, mx: Any)
                }
                acc(name) = merged
              case (mn: org.apache.parquet.io.api.Binary,
                    mx: org.apache.parquet.io.api.Binary) if isUtf8(name) =>
                // strict UTF-8 round trip: a writer-truncated bound cut
                // mid-code-point would decode lossily and order wrong
                (utf8Strict(mn), utf8Strict(mx)) match {
                  case (Some(mnS), Some(mxS)) =>
                    val merged = acc.get(name) match {
                      case Some((m0: String, x0: String)) =>
                        (if (utf8Lt(mnS, m0)) mnS else m0,
                         if (utf8Lt(x0, mxS)) mxS else x0)
                      case _ => (mnS, mxS)
                    }
                    acc(name) = merged
                  case _ => dead += name; acc -= name
                }
              case _ =>
                dead += name
                acc -= name
            }
          }
        }
      }
      (rows, acc.flatMap {
        case (k, (mn: String, mx: String)) =>
          // string bounds leave the footer TRUNCATED: prefix-min is a
          // sound lower bound as-is; max needs the one-code-point widen
          // (rare unwidenable all-U+10FFFF prefixes drop the column)
          widenMax(mx).map(w => k -> (truncMin(mn), w))
        case (k, (mn, mx)) => Some(k -> (mn.toString, mx.toString))
      }.toMap)
    } finally rdr.close()
  }

  private def utf8Strict(b: org.apache.parquet.io.api.Binary): Option[String] = {
    val bytes = b.getBytes
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (java.util.Arrays.equals(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8), bytes)) Some(s)
    else None
  }

  private def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** First [[StringStatChars]] code points — a prefix is ≤ the full value
    * in UTF-8 byte order, so it is a sound recorded MIN. */
  private[graft] def truncMin(s: String): String = {
    val cut = s.offsetByCodePoints(0,
      math.min(s.codePointCount(0, s.length), StringStatChars))
    s.substring(0, cut)
  }

  /** Truncate to [[StringStatChars]] code points and, if anything was cut,
    * increment the last retained code point (skipping the surrogate gap,
    * carrying left past U+10FFFF) — the result is STRICTLY ABOVE every
    * string sharing the retained prefix, hence a sound recorded MAX.
    * None when no code point can carry (all-U+10FFFF prefix). */
  private[graft] def widenMax(s: String): Option[String] = {
    val cps = s.codePointCount(0, s.length)
    if (cps <= StringStatChars) return Some(s)
    var keep = StringStatChars
    while (keep > 0) {
      val at = s.offsetByCodePoints(0, keep - 1)
      val cp = s.codePointAt(at)
      if (cp < 0x10FFFF) {
        val next = if (cp == 0xD7FF) 0xE000 else cp + 1 // skip surrogates
        return Some(s.substring(0, at) +
          new String(Character.toChars(next)))
      }
      keep -= 1 // U+10FFFF cannot increment — carry into the previous cp
    }
    None
  }

  private def supported(n: Any): Boolean = n match {
    case _: java.lang.Integer | _: java.lang.Long |
         _: java.lang.Float | _: java.lang.Double => true
    case _ => false
  }

  private def isNaN(n: Any): Boolean = n match {
    case f: java.lang.Float => f.isNaN
    case d: java.lang.Double => d.isNaN
    case _ => false
  }

  private def minOf(a: Any, b: Any): Any = if (lt(b, a)) b else a
  private def maxOf(a: Any, b: Any): Any = if (lt(a, b)) b else a
  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => x < y
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: java.lang.Float, y: java.lang.Float) => x < y
    case (x: java.lang.Double, y: java.lang.Double) => x < y
    case _ => sys.error(s"TxStats: mixed stat types ${a.getClass}/${b.getClass}")
  }

  /** The log's string encoding back to the CATALYST-internal value of
    * the column's Spark type (days for dates, micros for timestamps,
    * unscaled long for decimals — exactly what the footer recorded). */
  private def decode(s: String, t: DataType): Any = t match {
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType | DateType => s.toInt
    case LongType | TimestampType | TimestampNTZType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case d: DecimalType => Decimal(s.toLong, d.precision, d.scale)
    case other => sys.error(s"TxStats: no decoder for $other")
  }

  /** Could `file` (with recorded `stats`) contain a row passing ALL of
    * `filters`? False ⇒ the file is provably irrelevant and is skipped.
    * Anything not provably irrelevant — unknown predicate shape, missing
    * stat, type mismatch, null/NaN/±0.0 literal — keeps the file. */
  def mightMatch(filters: Seq[Expression],
                 stats: Map[String, (String, String)]): Boolean =
    filters.forall(f => might(f, stats))

  private def might(e: Expression, st: Map[String, (String, String)]): Boolean =
    e match {
      case And(l, r) => might(l, st) && might(r, st)
      case Or(l, r) => might(l, st) || might(r, st)
      case EqualTo(a: AttributeReference, Literal(v, t)) => rng(st, a, v, t, "eq")
      case EqualTo(Literal(v, t), a: AttributeReference) => rng(st, a, v, t, "eq")
      case EqualNullSafe(a: AttributeReference, Literal(v, t)) if v != null =>
        rng(st, a, v, t, "eq")
      case EqualNullSafe(Literal(v, t), a: AttributeReference) if v != null =>
        rng(st, a, v, t, "eq")
      case GreaterThan(a: AttributeReference, Literal(v, t)) => rng(st, a, v, t, "gt")
      case GreaterThan(Literal(v, t), a: AttributeReference) => rng(st, a, v, t, "lt")
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, t)) => rng(st, a, v, t, "gte")
      case GreaterThanOrEqual(Literal(v, t), a: AttributeReference) => rng(st, a, v, t, "lte")
      case LessThan(a: AttributeReference, Literal(v, t)) => rng(st, a, v, t, "lt")
      case LessThan(Literal(v, t), a: AttributeReference) => rng(st, a, v, t, "gt")
      case LessThanOrEqual(a: AttributeReference, Literal(v, t)) => rng(st, a, v, t, "lte")
      case LessThanOrEqual(Literal(v, t), a: AttributeReference) => rng(st, a, v, t, "gte")
      case In(a: AttributeReference, elems) if elems.forall(_.isInstanceOf[Literal]) =>
        elems.exists { case Literal(v, t) => rng(st, a, v, t, "eq") }
      case InSet(a: AttributeReference, vs) =>
        vs.exists(v => rng(st, a, v, a.dataType, "eq"))
      case _ => true // IsNull/IsNotNull/Not/casts/UDF shapes: never skip
    }

  /** Range check; true = might match (keep the file). */
  private def rng(st: Map[String, (String, String)], a: AttributeReference,
                  v: Any, t: DataType, op: String): Boolean = {
    if (v == null || t != a.dataType || floatEdge(v)) return true
    // FLOAT/DOUBLE upper bounds are unverifiable: Spark orders NaN ABOVE
    // every value, but footers exclude NaN from min/max — a file whose
    // recorded max is 10 can still hold NaN rows matching `x > 100`.
    // `gt`/`gte` (max-side proofs) therefore never prune floats; eq and
    // lt/lte stay sound (a NaN row equals no literal and is < nothing).
    val floatType = a.dataType == FloatType || a.dataType == DoubleType
    if (floatType && (op == "gt" || op == "gte")) return true
    st.get(a.name) match {
      case None => true
      case Some((mnS, mxS)) =>
        try {
          val ord = TypeUtils.getInterpretedOrdering(a.dataType)
            .asInstanceOf[Ordering[Any]]
          val mn = decode(mnS, a.dataType)
          val mx = decode(mxS, a.dataType)
          if (isNaN(mn) || isNaN(mx)) return true // legacy NaN-folded bound
          op match {
            case "eq" => ord.lteq(mn, v) && ord.gteq(mx, v)
            case "gt" => ord.gt(mx, v) // a row with a.value > v exists?
            case "gte" => ord.gteq(mx, v)
            case "lt" => ord.lt(mn, v)
            case "lte" => ord.lteq(mn, v)
            case _ => true
          }
        } catch { case scala.util.control.NonFatal(_) => true }
    }
  }

  /** NaN never lands in footer bounds and ±0.0 ordering differs between
    * IEEE compare and SQL equality — both make range logic unsound, so
    * such literals never prune. */
  private def floatEdge(v: Any): Boolean = v match {
    case f: java.lang.Float => f.isNaN || f.floatValue() == 0.0f
    case d: java.lang.Double => d.isNaN || d.doubleValue() == 0.0d
    case _ => false
  }

  // ---- Column-native variant (distributed skipping over a parquet
  // checkpoint payload) ----------------------------------------------------

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{isnan, lit}

  /** [[mightMatch]] as a Spark Column over a `map<string, struct<mn
    * string, mx string>>` stats column — the DISTRIBUTED skipping path:
    * a big table's per-file bounds live in a parquet checkpoint payload
    * and this predicate prunes them inside the payload scan, so the
    * driver only ever sees the surviving files. Mirrors [[might]]/[[rng]]
    * shape for shape (same conservative fallbacks, same float/NaN and
    * truncated-string rules); a file whose map lacks the column — or
    * whose stats map is NULL entirely — is always kept. */
  def mightMatchColumn(filters: Seq[Expression], stats: Column): Column =
    filters.map(f => mightCol(f, stats)).reduceOption(_ && _)
      .getOrElse(lit(true))

  private def mightCol(e: Expression, st: Column): Column = e match {
    case And(l, r) => mightCol(l, st) && mightCol(r, st)
    case Or(l, r) => mightCol(l, st) || mightCol(r, st)
    case EqualTo(a: AttributeReference, Literal(v, t)) => rngCol(st, a, v, t, "eq")
    case EqualTo(Literal(v, t), a: AttributeReference) => rngCol(st, a, v, t, "eq")
    case EqualNullSafe(a: AttributeReference, Literal(v, t)) if v != null =>
      rngCol(st, a, v, t, "eq")
    case EqualNullSafe(Literal(v, t), a: AttributeReference) if v != null =>
      rngCol(st, a, v, t, "eq")
    case GreaterThan(a: AttributeReference, Literal(v, t)) => rngCol(st, a, v, t, "gt")
    case GreaterThan(Literal(v, t), a: AttributeReference) => rngCol(st, a, v, t, "lt")
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, t)) => rngCol(st, a, v, t, "gte")
    case GreaterThanOrEqual(Literal(v, t), a: AttributeReference) => rngCol(st, a, v, t, "lte")
    case LessThan(a: AttributeReference, Literal(v, t)) => rngCol(st, a, v, t, "lt")
    case LessThan(Literal(v, t), a: AttributeReference) => rngCol(st, a, v, t, "gt")
    case LessThanOrEqual(a: AttributeReference, Literal(v, t)) => rngCol(st, a, v, t, "lte")
    case LessThanOrEqual(Literal(v, t), a: AttributeReference) => rngCol(st, a, v, t, "gte")
    case In(a: AttributeReference, elems) if elems.forall(_.isInstanceOf[Literal]) =>
      elems.map { case Literal(v, t) => rngCol(st, a, v, t, "eq") }
        .reduce(_ || _)
    case InSet(a: AttributeReference, vs) =>
      vs.toSeq.map(v => rngCol(st, a, v, a.dataType, "eq")).reduce(_ || _)
    case _ => lit(true)
  }

  /** Internal stat-string decode as a Column (same unit contract as
    * [[decode]]: days/micros/unscaled-long ride their raw numeric form,
    * strings compare in the default UTF8-binary collation = parquet's
    * unsigned order), and the literal's INTERNAL value as a Column in
    * the same domain. None = undecodable type (never prune). */
  private def decodePair(mnmx: (Column, Column), v: Any, t: DataType)
      : Option[(Column, Column, Column)] = {
    val (mn, mx) = mnmx
    t match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some((mn.cast(LongType), mx.cast(LongType),
          lit(v.asInstanceOf[Number].longValue())))
      case DateType =>
        Some((mn.cast(IntegerType), mx.cast(IntegerType),
          lit(v.asInstanceOf[Int])))
      case TimestampType | TimestampNTZType =>
        Some((mn.cast(LongType), mx.cast(LongType), lit(v.asInstanceOf[Long])))
      case FloatType =>
        Some((mn.cast(FloatType), mx.cast(FloatType),
          lit(v.asInstanceOf[Float])))
      case DoubleType =>
        Some((mn.cast(DoubleType), mx.cast(DoubleType),
          lit(v.asInstanceOf[Double])))
      case StringType => Some((mn, mx, lit(v.toString)))
      case d: DecimalType if d.precision <= 18 =>
        Some((mn.cast(LongType), mx.cast(LongType),
          lit(v.asInstanceOf[Decimal].toUnscaledLong)))
      case _ => None
    }
  }

  private def rngCol(st: Column, a: AttributeReference, v: Any,
                     t: DataType, op: String): Column = {
    if (v == null || t != a.dataType || floatEdge(v)) return lit(true)
    val floatType = a.dataType == FloatType || a.dataType == DoubleType
    if (floatType && (op == "gt" || op == "gte")) return lit(true)
    val entry = st.getItem(a.name)
    decodePair((entry.getField("mn"), entry.getField("mx")), v, t) match {
      case None => lit(true)
      case Some((mn, mx, l)) =>
        val nanGuard =
          if (floatType) isnan(mn) || isnan(mx) else lit(false)
        val cmp = op match {
          case "eq" => mn <= l && mx >= l
          case "gt" => mx > l
          case "gte" => mx >= l
          case "lt" => mn < l
          case "lte" => mn <= l
          case _ => lit(true)
        }
        st.isNull || entry.isNull || nanGuard || cmp
    }
  }
}

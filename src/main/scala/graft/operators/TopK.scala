package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k as a true AGGREGATE, not a window.
  *
  * [[Windows.topKPerGroup]] (the T4 reference shape,
  * customer_analytics_dag.py-style "head(k) per group") shuffles EVERY row
  * of the group to one reducer and sorts it there — correct, but at 100 TB
  * a hot group is a straggler and the shuffle carries the full fact table.
  * This operator instead keeps a k-bounded ordered buffer inside a typed
  * [[Aggregator]], so the map side already reduces each partition to ≤ k
  * rows PER GROUP before the exchange: shuffle volume is
  * O(groups × k × partitions) worst case, independent of fact rows, and no
  * per-group sort ever materializes.
  *
  * Ordering is the total order (value DESC, id ASC) — the id tie-break
  * makes the result partitioning-independent, which OperatorsSpec pins by
  * bit-comparing against the window implementation across parallelisms.
  */
object TopK {

  /** Ordered k-bounded buffer; `items` is kept sorted best-first under
    * (value DESC, id ASC). Product-encoded (no kryo) so the ObjectHash
    * aggregation path can sort-fallback safely. */
  final case class Buf(items: List[(Double, Long)])
  final case class Out(items: List[(Double, Long)])

  /** `(value, id)` beats `(value2, id2)` under value DESC, id ASC. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Merge two best-first sorted lists keeping the k best. */
  private def mergeK(x: List[(Double, Long)], y: List[(Double, Long)],
                     k: Int): List[(Double, Long)] = {
    val out = List.newBuilder[(Double, Long)]
    var (xs, ys, n) = (x, y, 0)
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      if (ys.isEmpty || (xs.nonEmpty && beats(xs.head, ys.head))) {
        out += xs.head; xs = xs.tail
      } else { out += ys.head; ys = ys.tail }
      n += 1
    }
    out.result()
  }

  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Buf, Out] {
    require(k > 0, "k must be positive")
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, in: (Double, Long)): Buf =
      // insert-in-order, O(k) per row; drop immediately when beaten by k others
      Buf(mergeK(b.items, in :: Nil, k))
    override def merge(a: Buf, b: Buf): Buf = Buf(mergeK(a.items, b.items, k))
    override def finish(b: Buf): Out = Out(b.items)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Top-k rows per group by `valueCol` DESC (ties: `idCol` ASC), as
    * (group…, rank, id, value). Null values/ids are dropped up front (a
    * null can't rank). The plan is groupBy→ObjectHashAggregate with a
    * partial stage — `.explain` shows partial_topkagg before the exchange —
    * then one posexplode of the ≤k-element result array. */
  def perGroupTopK(df: DataFrame, group: Seq[String], valueCol: String,
                   idCol: String, k: Int): DataFrame = {
    val fn = udaf(new TopKAgg(k), Encoders.product[(Double, Long)])
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(group.map(col): _*)
      .agg(fn(col(valueCol).cast("double"), col(idCol).cast("long")).as("__top"))
      .select(group.map(col) ++ Seq(posexplode(col("__top.items"))): _*)
      .select(group.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as(idCol),
        col("col._1").as(valueCol)): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-item operators (SURVEY §2.3 U1/U2, §2.2 P17).
  *
  * The reference iterates `product_metadata` JSON arrays row by row in Python
  * (product_analytics_dag.py:53-65, 197-206); here the same semantics are
  * declarative: `from_json` + `explode` + higher-order functions, all inside
  * whole-stage codegen, and pair mining is a within-order self-join (shuffle
  * once on the order key, never a driver loop).
  */
object Baskets {
  /** Schema of the e-commerce `product_metadata` item array
    * (data_generator.py:63-67 shape). */
  val itemSchema: ArrayType = ArrayType(new StructType()
    .add("product_id", IntegerType)
    .add("quantity", IntegerType)
    .add("item_price", LongType))

  /** S5: parse a JSON item-array column. */
  def parseItems(jsonCol: Column): Column = from_json(jsonCol, itemSchema)

  /** S5 with a caller-supplied item schema (e.g. double-typed prices). */
  def parseItems(jsonCol: Column, schema: ArrayType): Column = from_json(jsonCol, schema)

  /** U1: one row per order item with `total_value = quantity*item_price`. */
  def explodeItems(df: DataFrame, items: Column, keep: Seq[Column]): DataFrame =
    df.select(keep :+ explode(items).as("item"): _*)
      .withColumn("product_id", col("item.product_id"))
      .withColumn("quantity", col("item.quantity"))
      .withColumn("item_price", col("item.item_price"))
      .withColumn("total_value", col("item.quantity") * col("item.item_price"))
      .drop("item")

  /** P17: per-row basket totals via higher-order functions — no explode, no
    * shuffle. `num_unique_products` reproduces the reference's array-*length*
    * semantics (misnomer preserved deliberately, SURVEY §7.4.5). */
  def basketTotals(items: Column): Seq[(String, Column)] = Seq(
    "total_items" -> aggregate(items, lit(0), (acc, x) => acc + x.getField("quantity")),
    "total_product_value" -> aggregate(items, lit(0L),
      (acc, x) => acc + x.getField("quantity").cast("long") * x.getField("item_price")),
    "num_unique_products" -> size(items)
  )

  /** U2: unordered distinct product pairs per order, canonicalized
    * (least, greatest) — a self-join co-partitioned on the order key.
    * Input: any df with (orderCol, productCol); duplicates of a product
    * within one order are collapsed first (one pair per distinct pairing). */
  def pairs(df: DataFrame, orderCol: String, productCol: String): DataFrame = {
    val d = df.select(col(orderCol).as("ok"), col(productCol).as("pk")).distinct()
    val a = d.as("a")
    val b = d.as("b")
    a.join(b, col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.ok").as(orderCol),
              col("a.pk").as("product_1"), col("b.pk").as("product_2"))
  }

  /** U2 scale path: the same canonical pairs generated locally after ONE
    * shuffle (the groupBy on the order key to collect each basket). The
    * self-join form ([[pairs]]) shuffles twice and joins; this is the plan
    * to run at 100 TB. Pair expansion is the codegen'd
    * [[graft.plans.PairArray]] kernel + built-in explode, which keeps the
    * stage inside whole-stage codegen (the [[graft.plans.PairCombinations]]
    * Generator form computes the same rows but pins its Generate stage to
    * the interpreted fallback path — OperatorsSpec asserts all three forms
    * agree). */
  def pairsViaGenerator(df: DataFrame, orderCol: String, productCol: String): DataFrame =
    df.groupBy(col(orderCol))
      // collect_list, not collect_set: the PairArray kernel dedups while
      // sorting anyway, so the aggregate skips its per-group hash-dedup
      .agg(collect_list(col(productCol).cast("long")).as("basket"))
      .select(col(orderCol),
        explode(graft.plans.PairArray.pairArray(col("basket"))).as("p"))
      .select(col(orderCol), col("p.product_1"), col("p.product_2"))

  /** A7: pair frequencies over [[pairs]]/[[pairsViaGenerator]] output. */
  def pairFrequencies(pairsDf: DataFrame): DataFrame =
    pairsDf.groupBy("product_1", "product_2")
      .agg(count(lit(1)).as("frequency"))
}

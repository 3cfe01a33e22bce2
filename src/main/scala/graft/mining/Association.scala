package graft.mining

import org.apache.spark.ml.fpm.{FPGrowth, FPGrowthModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining + association rules (SURVEY.md §2.4 A7–A10, M27).
  *
  * The reference hand-rolls Apriori capped at k≤2 itemsets
  * (蔬菜价格相关性分析.py:116-209). Spark-first mapping: `ml.fpm.FPGrowth` computes
  * ALL frequent itemsets distributed (strictly more general), and its
  * `associationRules` emits antecedent/consequent/confidence/lift/support —
  * the exact metrics the reference derives by hand.
  *
  * For oracle-checkable parity with the k≤2 subset, `pairSupport` computes
  * 2-itemset supports relationally (explode + self-join on basket id), which
  * a SQL oracle reproduces verbatim.
  */
object Association {

  /** A7 — 1-itemset support counts from a transactions frame
    * (`basketCol`: basket id, `itemsCol`: array<string>).
    */
  def itemSupport(tx: DataFrame, itemsCol: String, minCount: Long): DataFrame =
    tx.select(explode(col(itemsCol)).as("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("support_count"))
      .filter(col("support_count") >= minCount)

  /** A8 — 2-itemset support counts, relational form: explode each basket and
    * self-join on the basket id with `item1 < item2` (canonical pair order,
    * matching the reference's `tuple(sorted(pair))`). One shuffle on basket
    * id, one on the pair — both map-side combinable.
    */
  def pairSupport(tx: DataFrame, basketCol: String, itemsCol: String, minCount: Long): DataFrame = {
    val items = tx.select(col(basketCol).as("bid"), explode(col(itemsCol)).as("item"))
    val a = items.as("a")
    val b = items.as("b")
    a.join(b, col("a.bid") === col("b.bid") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item1"), col("b.item").as("item2"))
      .agg(count(lit(1)).as("support_count"))
      .filter(col("support_count") >= minCount)
  }

  /** M27 — FPGrowth over the transactions frame. */
  def fpgrowth(tx: DataFrame, itemsCol: String, minSupport: Double, minConfidence: Double): FPGrowthModel =
    new FPGrowth()
      .setItemsCol(itemsCol)
      .setMinSupport(minSupport)
      .setMinConfidence(minConfidence)
      .fit(tx)

  /** A9/A10, relational form — association rules over 1-item antecedents and
    * consequents (the reference's k≤2 subset, 蔬菜价格相关性分析.py:173-209) derived
    * purely from support counts, so a SQL oracle reproduces every value:
    * confidence(a→b) = supp(ab)/supp(a), lift = confidence/(supp(b)/n),
    * support = supp(ab)/n. Each unordered frequent pair yields both
    * directions.
    *
    * Scale shape: pair counts shuffle on basket id then (item1, item2)
    * (both map-side combinable); the item-support side is a post-aggregation
    * frame keyed by item — broadcast into the two direction joins, so the
    * rule derivation itself adds no shuffle.
    *
    * Baskets must carry DISTINCT items (build with `collect_set`) — support
    * here means per-basket presence, and duplicated items would inflate
    * both the item and pair counts.
    */
  def rulesRelational(
      tx: DataFrame,
      basketCol: String,
      itemsCol: String,
      minSupport: Double,
      minConfidence: Double): DataFrame = {
    // tx feeds three jobs (count, item supports, pair supports) — cache it
    // so the upstream pipeline runs once; the count() materializes the cache
    // (callers' bench/verify harnesses clear caches between queries)
    tx.persist()
    val n = tx.count()
    val minCount = math.ceil(minSupport * n).toLong
    val items = itemSupport(tx, itemsCol, minCount = 1L)
    val pairs = pairSupport(tx, basketCol, itemsCol, minCount)
    val directed = pairs.select(col("item1").as("antecedent"), col("item2").as("consequent"),
        col("support_count"))
      .unionAll(pairs.select(col("item2").as("antecedent"), col("item1").as("consequent"),
        col("support_count")))
    directed
      .join(broadcast(items.select(col("item"), col("support_count").as("ant_count"))),
        col("antecedent") === col("item")).drop("item")
      .join(broadcast(items.select(col("item"), col("support_count").as("cons_count"))),
        col("consequent") === col("item")).drop("item")
      .withColumn("confidence", col("support_count") / col("ant_count"))
      .filter(col("confidence") >= minConfidence)
      .withColumn("lift", col("confidence") / (col("cons_count") / lit(n.toDouble)))
      .withColumn("support", col("support_count") / lit(n.toDouble))
      .select(col("antecedent"), col("consequent"), col("support_count"),
        col("confidence"), col("lift"), col("support"))
  }

  /** A9/A10 — rules with quality metrics, sorted for top-N consumption. */
  def rules(model: FPGrowthModel): DataFrame =
    model.associationRules
      .withColumn("antecedent_str", concat_ws(",", array_sort(col("antecedent"))))
      .withColumn("consequent_str", concat_ws(",", array_sort(col("consequent"))))
      .orderBy(desc("confidence"), asc("antecedent_str"), asc("consequent_str"))
}

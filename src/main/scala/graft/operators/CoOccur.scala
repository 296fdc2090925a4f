package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-basket co-occurrence pair generation — the candidate step of
  * market-basket mining and co-occurrence-graph construction
  * (MiningQueries.q_market_basket / q_triangle_count).
  *
  * The self-join key is the basket id, so the shuffle is one hash
  * partition by basket and the blow-up is bounded by max basket size
  * squared — O(k²) per basket, never O(n²) globally. That bound is the
  * whole scale story, which makes the single pathological case a
  * MEGA-basket: one order/page/session with 10⁵ items contributes 10¹⁰
  * pairs and a straggler task that kills the stage. `maxBasketSize`
  * closes it deterministically: baskets over the cap contribute only
  * their cap-smallest item ids (a per-basket rank window — parallelism
  * |baskets|, state one basket), so every basket's pair count is
  * ≤ C(cap, 2) and reruns/partitionings produce byte-identical output
  * (a random or arrival-order sample would not). Capped pair counts are
  * a lower bound for the dropped baskets — the standard trade for
  * bounding worst-case work; pass None (default) for exact semantics,
  * as the oracle-gated queries do at test scale.
  */
object CoOccur {

  /** Distinct (basketCol, itemCol) membership → oriented pairs
    * (pa < pb) with co-occurrence counts `cab`.
    */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Option[Int] = None): DataFrame = {
    val b0 = df.select(col(basketCol).as("__basket"),
      col(itemCol).as("item")).distinct()
    val b = maxBasketSize match {
      case Some(cap) =>
        require(cap >= 2, s"cap=$cap cannot form pairs")
        val w = Window.partitionBy(col("__basket")).orderBy(col("item"))
        b0.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= cap)
          .drop("__rk")
      case None => b0
    }
    val l = b.select(col("__basket"), col("item").as("pa"))
    val r = b.select(col("__basket"), col("item").as("pb"))
    l.join(r, Seq("__basket")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cab"))
  }
}

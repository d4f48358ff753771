package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket mining over the order→part bipartite graph: frequent
  * item pairs with association-rule stats (support / confidence /
  * lift), and item-item co-occurrence cosine similarity — the two
  * workhorses of retail analytics and item-based recommenders
  * (Agrawal & Srikant 1994; Sarwar et al. 2001).
  *
  * Execution shape, sized for 100 TB:
  *   - baskets = DISTINCT(order, item): one shuffle on the order key.
  *   - candidate pairs come from a SELF-JOIN on the basket key — both
  *     sides shuffle on the same key, so the join is co-partitioned
  *     (one exchange each, no broadcast of a fact-sized frame). The
  *     `item_a < item_b` predicate halves the output and fixes the
  *     orientation.
  *   - pair generation is QUADRATIC in basket size, which is the real
  *     scale risk (one pathological 10⁵-item basket = 5·10⁹ pairs).
  *     [[pairCounts]] therefore caps basket width: baskets wider than
  *     `maxBasket` are dropped whole (the standard Apriori hygiene —
  *     a mega-basket is a crawler/bot artifact, not signal, and every
  *     published implementation prunes it). The cap makes worst-case
  *     output ≤ rows·maxBasket/2 — linear in the fact table.
  *   - support thresholds are derived FROM the data (`max(3,
  *     ⌈n_baskets/5000⌉)`) so the same query is selective at every
  *     scale factor instead of degenerating to all-pairs at sf1.
  *
  * All derived ratios are exact-integer arithmetic pushed through
  * IEEE double division in ONE spelled order (cast → multiply →
  * divide), so DuckDB reproduces them bit-for-bit.
  */
object MarketBasket {

  /** DISTINCT (basket, item) pairs from the lineitem fact — snapshot
    * (localCheckpoint) because every downstream frame (width cap,
    * item supports, both self-join sides, basket count) branches from
    * it: without the barrier the tape is re-scanned once per branch
    * (PlanAuditSpec's registry-wide scan audit). */
  def baskets(l: DataFrame): DataFrame =
    graft.util.Caches.snapshot(
      l.select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
        .distinct())

  /** Co-occurrence counts for unordered item pairs, basket-width
    * capped. One co-partitioned self-join + one pair-keyed aggregate. */
  def pairCounts(b: DataFrame, maxBasket: Int): DataFrame = {
    val width = b.groupBy(col("basket")).agg(count(lit(1)).as("bw"))
    val kept = b.join(width, "basket").where(col("bw") <= maxBasket)
      .select(col("basket"), col("item"))
    val left = kept.select(col("basket"), col("item").as("item_a"))
    val right = kept.select(col("basket").as("basket_r"),
      col("item").as("item_b"))
    left.join(right,
        col("basket") === col("basket_r") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_supp"))
  }

  /** Per-item basket counts. */
  def itemCounts(b: DataFrame): DataFrame =
    b.groupBy(col("item")).agg(count(lit(1)).as("item_supp"))

  /** Association rules over pairs with data-derived min support:
    * (item_a, item_b, supports, conf both ways, lift). */
  def rules(l: DataFrame, maxBasket: Int = 1000): DataFrame = {
    val b = baskets(l)
    val nb = b.agg(countDistinct(col("basket")).as("n_baskets"))
    val items = itemCounts(b)
    val pairs = pairCounts(b, maxBasket)
    val d = (c: String) => col(c).cast("double")
    pairs
      .crossJoin(broadcast(nb))
      .where(col("pair_supp") >=
        greatest(lit(3L), ceil(col("n_baskets") / lit(5000.0)).cast("long")))
      .join(items.select(col("item").as("item_a"),
        col("item_supp").as("supp_a")), "item_a")
      .join(items.select(col("item").as("item_b"),
        col("item_supp").as("supp_b")), "item_b")
      .select(
        col("item_a"), col("item_b"),
        col("pair_supp"), col("supp_a"), col("supp_b"),
        (d("pair_supp") / d("supp_a")).as("conf_ab"),
        (d("pair_supp") / d("supp_b")).as("conf_ba"),
        ((d("pair_supp") * d("n_baskets")) / (d("supp_a") * d("supp_b")))
          .as("lift"))
  }

  /** Item-item cosine similarity over co-occurrence vectors
    * (sim = pair/√(supp_a·supp_b)), global top-k with a unique
    * (item_a, item_b) tiebreak → TakeOrderedAndProject, never a
    * global sort. */
  def similarity(l: DataFrame, k: Int, maxBasket: Int = 1000): DataFrame = {
    val b = baskets(l)
    val items = itemCounts(b)
    pairCounts(b, maxBasket)
      .join(items.select(col("item").as("item_a"),
        col("item_supp").as("supp_a")), "item_a")
      .join(items.select(col("item").as("item_b"),
        col("item_supp").as("supp_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("pair_supp"),
        (col("pair_supp").cast("double") /
          sqrt((col("supp_a") * col("supp_b")).cast("double"))).as("cosine"))
      .orderBy(desc("cosine"), asc("item_a"), asc("item_b"))
      .limit(k)
  }
}

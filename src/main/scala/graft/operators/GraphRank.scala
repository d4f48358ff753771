package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PageRank in SCALED INTEGER arithmetic — centrality
  * over the near-dup similarity graph (which duplicate clusters
  * dominate a corpus, which documents are the "hubs" a canonical-pick
  * should prefer). Float PageRank is a cross-engine parity trap: sums
  * of doubles are order-dependent, so a DuckDB oracle could never
  * hash-match a shuffled Spark aggregation. Every quantity here is a
  * BIGINT in units of scale⁻¹ (rank mass starts at scale/N per node)
  * and every operation is integer (+, *, div on non-negative values —
  * truncating div == floor div on both engines), so the 5-iteration
  * result is bit-identical no matter the partitioning or aggregation
  * order, and the oracle can unroll the same recurrence as CTEs.
  *
  * Recurrence (damping d = dampNum/dampDen, canonical 17/20 = 0.85):
  *   r₀(v)    = scale div N
  *   contrib  = r(u) div deg(u)
  *   r'(v)    = (dampDen−dampNum)·(scale div N) div dampDen
  *              + dampNum · Σ_in contrib div dampDen
  * Dangling mass (deg-0 nodes) leaks rather than redistributes — the
  * standard simplification; on a similarity graph isolated docs are
  * the common case and their rank pins at the teleport floor.
  *
  * Scale shape (100 TB): edges and degrees are snapshotted once
  * (multi-branch reuse without registering in the session cache
  * manager), each iteration is one equi-shuffle of the rank frame
  * against the edge list keyed by node id plus one hash aggregate
  * keyed by destination — no driver-side graph state, no global
  * ordering; iteration count is the only driver loop (fixed, 5). */
object GraphRank {

  /** PageRank over an UNDIRECTED pair list (`pairs`: id_a, id_b —
    * symmetrized internally). Returns (doc_id, deg, rank_scaled). */
  def pagerankInt(nodes: DataFrame, pairs: DataFrame, iters: Int,
      scale: Long, dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val nodesS = graft.util.Caches.snapshot(nodes.select(col("doc_id")))
    // bounded-collect(single scalar: the node count feeds the integer
    // teleport constants; O(1) driver state)
    val n = nodesS.count()
    val r0 = scale / n
    val tele = (dampDen - dampNum) * r0 / dampDen
    val edges = graft.util.Caches.snapshot(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"),
          col("id_a").as("dst"))))
    val deg = graft.util.Caches.snapshot(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val edgeDeg = edges.join(deg, "src")

    var ranks = nodesS.select(col("doc_id"), lit(r0).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edgeDeg
        .join(ranks, edgeDeg("src") === ranks("doc_id"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodesS.join(contrib, nodesS("doc_id") === contrib("dst"),
          "left")
        .select(nodesS("doc_id"),
          (lit(tele) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("r"))
    }
    ranks.join(deg, ranks("doc_id") === deg("src"), "left")
      .select(ranks("doc_id"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("r").as("rank_scaled"))
  }

  /** The identical recurrence unrolled as DuckDB CTEs. Expects the
    * caller's WITH-chain to already define `nodes(doc_id)` and
    * `pr(id_a, id_b, …)`; appends edges/deg/r0..r<iters> and a final
    * CTE `ranked(doc_id, deg, rank_scaled)`. Sums are cast back to
    * BIGINT (DuckDB sum(BIGINT) widens to HUGEINT). */
  def duckPagerankCtes(iters: Int, scale: Long,
      dampNum: Long = 17L, dampDen: Long = 20L): String = {
    val base =
      s"""nn AS (SELECT count(*) AS n FROM nodes),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION ALL
         |  SELECT id_b AS src, id_a AS dst FROM pr
         |),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT doc_id, $scale // n AS r FROM nodes, nn)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""c$k AS (
         |  SELECT e.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
         |  FROM edges e
         |  JOIN r${k - 1} r ON e.src = r.doc_id
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY 1
         |),
         |r$k AS (
         |  SELECT nd.doc_id,
         |    (${dampDen - dampNum} * ($scale // nn.n)) // $dampDen
         |      + ($dampNum * coalesce(c$k.s, 0)) // $dampDen AS r
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN c$k ON nd.doc_id = c$k.dst
         |)""".stripMargin
    }
    val fin =
      s"""ranked AS (
         |  SELECT r.doc_id, coalesce(d.deg, 0) AS deg, r.r AS rank_scaled
         |  FROM r$iters r LEFT JOIN deg d ON r.doc_id = d.src
         |)""".stripMargin
    (base +: steps :+ fin).mkString(",\n")
  }
}

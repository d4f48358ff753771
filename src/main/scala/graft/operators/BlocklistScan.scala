package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scan via Aho–Corasick (1975) — the
  * banned-phrase audit every training-data pipeline runs before
  * release. The naive declarative form is a docs × patterns cross
  * join (each document scanned once PER PATTERN — production
  * blocklists run 10⁴–10⁶ entries, so that's 10⁴–10⁶ passes over
  * 100 TB of text). The automaton scans each character exactly once
  * regardless of pattern count: goto/fail transitions make the match
  * work O(|text| + hits), which is the only shape that survives at
  * scale.
  *
  * Execution shape: the automaton is compiled ONCE from the pattern
  * list and shipped to executors (here via the task closure — the
  * list is tiny; a production-sized blocklist would ship the compiled
  * int arrays with `SparkContext.broadcast`). `mapPartitions` is the
  * honest tool for a stateful per-character scan (SURVEY's preference
  * ladder: compose > Expression > plan > mapPartitions — a codegen'd
  * Expression can't hold the automaton tables), and the scan is
  * embarrassingly parallel per document with ZERO shuffle before the
  * final pattern-grained aggregate (≤ |patterns| rows).
  *
  * Oracle equivalence: every pattern is BORDERLESS (no proper prefix
  * equals a suffix — pinned by Round15bSpec), so occurrences cannot
  * self-overlap and the automaton's all-occurrence count equals the
  * oracle's non-overlapping replace() count. */
object BlocklistScan {

  /** The default blocklist — borderless phrases over the synthetic
    * corpus vocabulary. */
  val Patterns: Seq[String] = Seq(
    "scan slow", "fast table", "merge batch", "query big",
    "window stream", "slow filter", "agg join", "spark",
    "vector", "customer query", "big table", "group fast")

  /** Compiled Aho–Corasick automaton: dense goto maps, BFS fail
    * links, and per-node aggregated output pattern ids (each node's
    * outputs include its fail-chain's outputs, so the scan never
    * walks fail links on a hit). */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    private val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.HashMap.empty[Char, Int]
          outs += Nil
          next.length - 1
        })
      }
      outs(s) = id :: outs(s)
    }
    private val fail = Array.fill(next.length)(0)
    // BFS: child fail = deepest proper-suffix state; outputs inherit.
    private val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(t) = if (next(f).contains(c) && next(f)(c) != t) next(f)(c) else 0
        outs(t) = outs(t) ++ outs(fail(t))
        queue.enqueue(t)
      }
    }
    private val outArr: Array[Array[Int]] = outs.map(_.toArray).toArray

    /** One pass over `text`: per-pattern occurrence counts. */
    def scan(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        s = next(s).getOrElse(c, 0)
        val o = outArr(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Per-pattern corpus audit: (pattern, n_docs, n_hits). Patterns
    * with zero hits still surface (left join against the list). */
  def audit(spark: SparkSession, docs: DataFrame,
      patterns: Seq[String] = Patterns): DataFrame = {
    import spark.implicits._
    val pats = patterns // avoid capturing `this`
    // NULL text never reaches the automaton (t.length would NPE the
    // task); the oracle's cross join drops NULLs the same way (a NULL
    // count falls out of the FILTER/sum)
    val hits = docs.select(col("text").cast("string"))
      .where(col("text").isNotNull).as[String]
      .mapPartitions { texts =>
        val ac = new Automaton(pats)
        texts.flatMap { t =>
          val c = ac.scan(t)
          c.indices.iterator.filter(c(_) > 0L).map(i => (i, c(i)))
        }
      }
      .toDF("pid", "hits")
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_docs"), sum(col("hits")).as("n_hits"))
    pats.zipWithIndex.map { case (p, i) => (i, p) }.toDF("pid", "pattern")
      .join(hits, Seq("pid"), "left")
      .select(col("pattern"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** DuckDB spelling: the cross-join occurrence count the automaton
    * replaces — equal because the patterns are borderless. */
  def duckAudit: String = {
    val values = Patterns.map(p => s"('$p')").mkString(", ")
    s"""WITH pat(pattern) AS (VALUES $values),
       |h AS (
       |  SELECT p.pattern,
       |    (length(d.text) - length(replace(d.text, p.pattern, '')))
       |      // length(p.pattern) AS c
       |  FROM documents d CROSS JOIN pat p)
       |SELECT pattern,
       |  count(*) FILTER (WHERE c > 0) AS n_docs,
       |  CAST(coalesce(sum(c), 0) AS BIGINT) AS n_hits
       |FROM h GROUP BY pattern""".stripMargin
  }
}

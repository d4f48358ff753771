package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Discoverability catalog — the Spark-native analog of the
  * reference's AI-discoverability module
  * (`src/gapless_deribit_clickhouse/probe.py:1-120`): structured,
  * typed descriptions of the data sources, the callable API surface,
  * and every registered verifiable query, so an agent (or a human)
  * can enumerate what the library does without reading the code.
  *
  * Unlike the reference's hand-maintained lists, [[queryCatalog]] is
  * DERIVED from the live registry, and `ProbeSpec` pins that the
  * hand-written [[families]] table stays total over it — the catalog
  * cannot silently drift from the shipped operators. */
object Probe {

  /** A queryable data source (the reference's `DataSource`). */
  final case class DataSource(
      name: String,
      description: String,
      table: String,
      keyFields: Seq[String],
      useCases: Seq[String])

  /** A callable capability (the reference's `Capability`). */
  final case class Capability(
      name: String,
      function: String,
      description: String,
      example: String,
      parameters: Map[String, String])

  /** One registry family: the key prefix every entry name carries. */
  final case class Family(prefix: String, description: String)

  val dataSources: Seq[DataSource] = Seq(
    DataSource(
      name = "Options Trades",
      description = "Historical options trades (BTC/ETH), derived " +
        "deterministically from the events tape in this harness; a " +
        "deployment points Tables.load at the real fact table",
      table = "trades",
      keyFields = Seq("trade_id", "instrument_name", "timestamp",
        "price", "amount", "iv", "underlying", "expiry", "strike",
        "option_type"),
      useCases = Seq("options flow analysis", "IV tracking",
        "large trade detection", "historical price analysis")),
    DataSource(
      name = "Spot Ticks",
      description = "Spot price tick series per underlying symbol",
      table = "spot_ticks",
      keyFields = Seq("symbol", "timestamp", "close"),
      useCases = Seq("moneyness enrichment", "realized vol",
        "microstructure estimators")),
    DataSource(
      name = "Documents",
      description = "Text corpus with source/lang provenance for the " +
        "LLM curation pipeline",
      table = "documents",
      keyFields = Seq("doc_id", "text", "lang", "source", "n_chars"),
      useCases = Seq("dedup", "quality filtering", "tokenization",
        "retrieval", "curation")),
    DataSource(
      name = "Embeddings",
      description = "Float vector embeddings with labels",
      table = "embeddings",
      keyFields = Seq("vec_id", "embedding", "label"),
      useCases = Seq("ANN search", "semantic dedup", "clustering")),
    DataSource(
      name = "Events",
      description = "User event stream (ts, user, type, value, props)",
      table = "events",
      keyFields = Seq("event_id", "ts", "user_id", "event_type",
        "value", "props"),
      useCases = Seq("sessionization", "funnels", "retention",
        "attribution", "experimentation")))

  val capabilities: Seq[Capability] = Seq(
    Capability(
      name = "Fetch Historical Trades",
      function = "graft.api.TradesApi.fetch(trades, FetchParams(...))",
      description = "Query trades with validated, pushdown-friendly " +
        "filters, FINAL dedup and top-k",
      example = "TradesApi.fetch(t, FetchParams(underlying = " +
        "Some(\"BTC\"), optionType = Some(\"C\"), limit = Some(100)))",
      parameters = Map(
        "underlying" -> "BTC or ETH",
        "start/end" -> "inclusive date bounds",
        "optionType" -> "C or P",
        "expiry" -> "expiration date filter",
        "strike" -> "strike filter",
        "limit" -> "top-k by timestamp desc")),
    Capability(
      name = "Collect Trades",
      function = "graft.sources.Backfill.collect(...)",
      description = "Cursor-paged history backfill with continuity " +
        "validation, idempotent batched insert and checkpoint resume",
      example = "Backfill.collect(spark, pager, store, checkpoint)",
      parameters = Map(
        "pager" -> "descending-cursor page source",
        "store" -> "idempotent batch sink",
        "checkpoint" -> "resume state")),
    Capability(
      name = "Registered Analytics",
      function = "graft.SparkEntry.queries(name)(spark, sfDir)",
      description = "Every verifiable operator in one registry; each " +
        "entry returns a DataFrame and carries a DuckDB oracle " +
        "(SparkEntry.oracleSql) the driver hash-compares",
      example = "SparkEntry.queries(\"q1_agg\")(spark, dir)",
      parameters = Map(
        "name" -> "registry key (see Probe.queryCatalog)",
        "sfDir" -> "parquet table directory")))

  /** Hand-written family table — `ProbeSpec` pins totality over the
    * registry, so adding an entry with a new prefix forces a row. */
  val families: Seq[Family] = Seq(
    Family("s", "sources, ingest, store layout & schema system"),
    Family("st", "structured-streaming variants"),
    Family("f", "parametrized filters & validity masks"),
    Family("j", "joins (broadcast, as-of, interval, nearest)"),
    Family("a", "aggregations & resamples"),
    Family("w", "window analytics (gaps, percentiles, ranks)"),
    Family("o", "ordering, top-k & dedup"),
    Family("p", "parsing & projection chains"),
    Family("q", "relational surface (rollup/cube/sets/unpivot)"),
    Family("m", "quant models & microstructure estimators"),
    Family("x", "scale techniques (salting, bucketing, DPP, bloom)"),
    Family("ev", "event/user analytics"),
    Family("llm", "LLM corpus pipeline (dedup, quality, tokens, ANN)"),
    Family("mm", "multimodal (decode, frames, features, VAD, phash)"),
    Family("pii", "PII scrubbing & curation"))

  /** Longest matching family prefix for a registry key (prefixes are
    * letters-only; `llm_x` must match `llm`, not a one-letter rule). */
  def familyOf(entry: String): String = {
    val p = entry.takeWhile(_.isLetter)
    families.map(_.prefix).filter(p.startsWith)
      .sortBy(-_.length).headOption.getOrElse(p)
  }

  /** The live query catalog: one row per registry entry with its
    * family, family description and whether a full SQL oracle gates
    * it (vs a rows-only / dynamic gate). */
  def queryCatalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val oracles = SparkEntry.oracleSql.keySet
    val fam = families.map(f => f.prefix -> f.description).toMap
    SparkEntry.queries.keys.toSeq.sorted
      .map { name =>
        val f = familyOf(name)
        (name, f, fam.getOrElse(f, "unknown"), oracles.contains(name))
      }
      .toDF("entry", "family", "family_description", "sql_oracle")
  }
}

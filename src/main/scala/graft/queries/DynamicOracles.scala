package graft.queries

/** Oracles that can only be authored once the query has run — e.g.
  * the trained-ANN re-rank gate, whose DuckDB SQL embeds the
  * deterministic shortlist ids the Spark side just computed. Query
  * fns stash SQL here as they build their result; `Verify` dumps
  * `SparkEntry.oracleSql` after running every query, so stashed
  * entries land in oracle_sql.json alongside the static ones. If a
  * stashing query never ran, its entry is simply absent — the driver
  * falls back to the rows-only gate, same as a `None` oracle. */
object DynamicOracles {
  private val stash = scala.collection.concurrent.TrieMap.empty[String, String]

  def put(name: String, sql: String): Unit = stash.put(name, sql)

  def snapshot: Map[String, String] = stash.toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-domain registries under
  * `graft.queries`; each carries its own DuckDB oracle where the
  * semantics are SQL-expressible (SURVEY §5.2).
  */
object SparkEntry {

  def registries: Seq[Q.Registry] = Seq(
    RelationalQueries, WindowQueries, StatsQueries, MlQueries, LlmQueries,
    IngestQueries)

  def allQueries: Seq[Q] = registries.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlFor(Set.empty)

  /** [[oracleSql]] restricted to `names` (empty = all). The name filter
    * runs BEFORE any `Q.oracle` thunk is forced — several oracles are
    * GENERATED (x10/x15 fit OLS models, x11 fits K-Means, x6 integrates
    * a quadrature grid), so a filtered dump must not pay for oracles it
    * won't emit. */
  def oracleSqlFor(names: Set[String]): Map[String, String] =
    allQueries
      .filter(q => names.isEmpty || names(q.name))
      .flatMap(q => q.oracle.map(q.name -> _)).toMap
}

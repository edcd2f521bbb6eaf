package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus, where the
  * semantics are ANSI-SQL-expressible, the DuckDB oracle the driver
  * hash-compares against (SURVEY §5.2). `oracle = None` → the driver
  * records a weaker rows-only check; those operators are covered by
  * ScalaTest specs instead.
  *
  * The oracle SQL is BY-NAME and memoized: some oracles are generated
  * (x6 interpolates a grid of exactly-integrated studentized-range
  * quantiles, ~2 s of Gauss–Legendre on first touch), so building the
  * registries must not pay that — only consumers that actually read
  * `oracle` (Verify's oracle_sql.json dump) do.
  */
final class Q(
    val name: String,
    val doc: String,
    val fn: (SparkSession, String) => DataFrame,
    oracleThunk: () => Option[String]) {
  lazy val oracle: Option[String] = oracleThunk()
}

object Q {
  def apply(name: String, doc: String, fn: (SparkSession, String) => DataFrame,
            oracle: => Option[String]): Q = new Q(name, doc, fn, () => oracle)

  /** Registry contract: each domain object exposes `all: Seq[Q]`. */
  trait Registry { def all: Seq[Q] }
}

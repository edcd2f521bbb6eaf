package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus, where the
  * semantics are ANSI-SQL-expressible, the DuckDB oracle the driver
  * hash-compares against (SURVEY §5.2). `oracle = None` → the driver
  * records a weaker rows-only check; those operators are covered by
  * ScalaTest specs instead.
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Registry contract: each domain object exposes `all: Seq[Q]`. */
  trait Registry { def all: Seq[Q] }
}

package graft.loaders

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the "bucketing for co-located joins" scale
  * lever: two tables bucketed (and sorted) by the same key into the
  * same bucket count join WITHOUT a shuffle, because the partitioning
  * is baked into the storage layout. At 100 TB this turns every
  * fact-to-fact equi-join on the bucket key from a full-network
  * shuffle into a local zip of matching buckets.
  *
  * BucketingSpec proves the property at the plan level: the join of
  * two co-bucketed tables contains no shuffle exchange.
  */
object Bucketing {

  /** Persist `df` as a bucketed + in-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}

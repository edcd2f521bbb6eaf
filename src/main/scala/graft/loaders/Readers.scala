package graft.loaders

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader/sink surface (SURVEY §2.1 S3-S7, S9): CSV/TSV scans with the
  * reference's messy-input tolerance, robust multi-encoding reads, and
  * JDBC wrappers.
  *
  * Reference provenance: TSV scans 01:43-44 / 03_data_merge.ipynb:40-43
  * (S4), robust encoding×separator sniffing
  * 06_tableau_master_dataset.ipynb:32-48 (S5), comma CSV 03:46 (S6),
  * JDBC scan etl_job.py:120-121 (S3), JDBC append etl_job.py:125,129
  * (S7), CSV sink 02:224 / 06:86 (S9), header strip/dedup 06:40-41.
  */
object Readers {

  /** S4/S6: header CSV scan with explicit separator + encoding. */
  def readCsv(spark: SparkSession, path: String, sep: String = ",",
              encoding: String = "UTF-8", inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("encoding", encoding)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  /** S5: robust scan — try encoding × separator combos until one parses
    * into >1 column (the reference's smart_read_csv, 06:32-48), then
    * normalize headers. Driver-side retry loop over lazy scans: each
    * attempt reads only the header until a candidate wins. */
  def robustReadCsv(spark: SparkSession, path: String,
                    encodings: Seq[String] = Seq("UTF-8", "Big5", "CP950", "ISO-8859-1"),
                    seps: Seq[String] = Seq(",", "\t")): DataFrame = {
    val attempts = for (enc <- encodings; sep <- seps) yield (enc, sep)
    val hit = attempts.iterator
      .map { case (enc, sep) =>
        try {
          val df = readCsv(spark, path, sep, enc, inferSchema = false)
          if (df.columns.length > 1) Some(df) else None
        } catch { case _: Exception => None }
      }
      .collectFirst { case Some(df) => df }
    normalizeColumns(hit.getOrElse(
      throw new IllegalArgumentException(s"no encoding/separator combination parsed $path")))
  }

  /** Header normalization: strip whitespace, drop duplicate-named
    * columns keeping the first (06:40-41,63). Positional temp names
    * sidestep the ambiguity of selecting a duplicated column by name. */
  def normalizeColumns(df: DataFrame): DataFrame = {
    val trimmed = df.columns.map(_.trim)
    val tmp = df.toDF(trimmed.indices.map(i => s"__c$i"): _*)
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    val keep = trimmed.zipWithIndex.filter { case (c, _) => seen.add(c) }
    tmp.select(keep.map { case (_, i) =>
      org.apache.spark.sql.functions.col(s"__c$i")
    }.toIndexedSeq: _*).toDF(keep.map(_._1).toIndexedSeq: _*)
  }

  /** S9: CSV sink (02:224, 03:91, 06:86). `single=true` mirrors the
    * reference's one-file export — harness-scale only; a 100 TB write
    * keeps the natural partitioning. */
  def writeCsv(df: DataFrame, path: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S3: JDBC scan (etl_job.py:120-121). Exercised end-to-end against
    * embedded Derby in JdbcSpec (write-append → read-back → predicate
    * pushdown). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S7: JDBC append sink (etl_job.py:125,129). See [[readJdbc]] note. */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)
}

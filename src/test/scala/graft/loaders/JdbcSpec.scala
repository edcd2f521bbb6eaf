package graft.loaders

import java.nio.file.Files
import java.util.Properties

import graft.SparkSpec

/** S3 (JDBC scan) + S7 (JDBC append) exercised against an embedded
  * Derby database (ships with Spark for the Hive metastore) — the same
  * `spark.read.jdbc` / `df.write.jdbc` path a MySQL warehouse uses,
  * minus the network. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("S7 append + S3 scan round-trip through a real JDBC database") {
    val dim = Seq(("s1", "Daan", 28), ("s2", "Xinyi", 40)).toDF("station_no", "district", "total_spaces")
    Readers.appendJdbc(dim, url, "station_info", props)
    // append twice more rows — mode("append") must not clobber
    Readers.appendJdbc(Seq(("s3", "Wenshan", 22)).toDF("station_no", "district", "total_spaces"),
      url, "station_info", props)
    val back = Readers.readJdbc(spark, url, "station_info", props)
    assert(back.count() === 3)
    assert(back.columns.toSeq.map(_.toLowerCase) === Seq("station_no", "district", "total_spaces"))
    val keys = back.select("station_no").as[String].collect().toSet
    assert(keys === Set("s1", "s2", "s3"))
  }

  test("S3 dedup-set scan shape: select one column from the warehouse (etl_job.py:120-121)") {
    val existing = Readers.readJdbc(spark, url, "station_info", props)
      .select("station_no")
    // the J4 anti-join consumes exactly this shape
    val incoming = Seq("s2", "s9").toDF("station_no")
    val newOnly = graft.ingest.IngestBatch.newDimsOnly(incoming, existing, "station_no")
      .as[String].collect().toSet
    assert(newOnly === Set("s9"))
  }
}

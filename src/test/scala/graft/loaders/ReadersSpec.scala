package graft.loaders

import java.nio.file.Files

import graft.SparkSpec

/** Loader-surface tests: robust CSV read (encoding/sep sniffing,
  * header normalization) and the CSV sink round-trip (S4/S5/S6/S9). */
class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir = Files.createTempDirectory("graft-csv").toString

  test("readCsv reads TSV with explicit separator (S4, 01:43-44)") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Path.of(dir, "t.tsv"), "a\tb\n1\tx\n2\ty\n")
    val df = Readers.readCsv(spark, s"$dir/t.tsv", sep = "\t")
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.count() === 2)
  }

  test("robustReadCsv sniffs the separator on a TSV payload (S5, 06:32-48)") {
    val dir = tmpDir
    // tab-separated: the comma attempt parses to 1 column and is rejected
    Files.writeString(java.nio.file.Path.of(dir, "m.csv"),
      "sno\tname\n1\tfoo\n")
    val df = Readers.robustReadCsv(spark, s"$dir/m.csv")
    assert(df.columns.toSeq === Seq("sno", "name"))
    val r = df.collect()(0)
    assert(r.getString(0) === "1" && r.getString(1) === "foo")
  }

  test("normalizeColumns strips padded names and drops post-strip duplicates (06:40-41,63)") {
    // Spark's CSV reader already trims/dedup-renames headers itself, so
    // the normalize utility targets frames from joins/other sources.
    val df = Seq((1, "a", "b")).toDF(" sno ", "name", "name ")
    val out = Readers.normalizeColumns(df)
    assert(out.columns.toSeq === Seq("sno", "name")) // keeps the FIRST name
    assert(out.collect()(0).getString(1) === "a")
  }

  test("robustReadCsv raises when nothing parses to >1 column") {
    val dir = tmpDir
    Files.writeString(java.nio.file.Path.of(dir, "bad.csv"), "justonecolumn\nvalue\n")
    assertThrows[IllegalArgumentException](Readers.robustReadCsv(spark, s"$dir/bad.csv"))
  }

  test("writeCsv/readCsv round-trips values incl. header (S9)") {
    val dir = s"$tmpDir/out"
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    Readers.writeCsv(df, dir, single = true)
    val back = Readers.readCsv(spark, dir)
    assert(back.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      === Seq((1, "x"), (2, "y")))
  }
}

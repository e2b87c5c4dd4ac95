package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._

/** A1/A3/A4 end-to-end: raw CSV files with header tags, valid-line
  * slicing, ignore-lines, filename- and tag-derived fields — the
  * reference's Partrans flow over synthetic raw PM files.
  */
class EtlSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val rawDir: String = {
    val d = java.nio.file.Files.createTempDirectory("rawpm")
    def write(name: String, body: String): Unit =
      java.nio.file.Files.writeString(d.resolve(name), body)
    write("NODE_A_20240105.csv",
      """#COLLECTOR=cell-east-1
        |#SKIP ME
        |id|cnt1|cnt2
        |1|10|100
        |2|20|200
        |IGNORE_ROW
        |3|30|300
        |#footer junk""".stripMargin)
    write("NODE_B_20240106.csv",
      """#COLLECTOR=cell-west-9
        |#SKIP ME
        |id|cnt1|cnt2
        |7|70|700
        |8|80|800
        |#footer junk""".stripMargin)
    d.toString
  }

  test("rawCsv: valid-line slice + ignore_lines + delimiter split") {
    val df = ChillPipeline.rawCsv(spark, rawDir + "/*.csv", "|",
      Seq("id", "cnt1", "cnt2"), skipHeader = 3, skipFooter = 1,
      ignoreLines = Set("IGNORE_ROW"))
    assert(df.count() == 5)
    assert(df.filter(col("id") === "3").select("cnt2").collect().head.getString(0) == "300")
  }

  test("rawCsv derives columns from the feed header when none are configured") {
    // slice [2:-1] keeps the header line first — the reference's
    // read_csv takes names from it; the body then starts one line on
    val df = ChillPipeline.rawCsv(spark, rawDir + "/*.csv", "|",
      Seq.empty, skipHeader = 2, skipFooter = 1,
      ignoreLines = Set("IGNORE_ROW"))
    assert(df.columns.toSet == Set("_file", "id", "cnt1", "cnt2"))
    assert(df.count() == 5) // header lines are consumed, not data rows
    assert(df.filter(col("id") === "7").select("cnt1").collect().head.getString(0) == "70")
  }

  test("rawFixedWidth: positional slice, trim, valid-line controls") {
    val d = java.nio.file.Files.createTempDirectory("fwpm")
    // layout: id 1-4 (left-padded), name 5-12 (right-padded), qty 13-18
    java.nio.file.Files.writeString(d.resolve("FEED_20240107.dat"),
      """HEADER 2024-01-07
        |0001alpha   000042
        |0002beta    000007
        |SKIPME
        |0003gamma       99
        |TRAILER 3 RECORDS""".stripMargin)
    val df = ChillPipeline.rawFixedWidth(spark, d.toString + "/*.dat",
      Seq(ChillPipeline.FixedWidthCol("id", 1, 4),
        ChillPipeline.FixedWidthCol("name", 5, 8),
        ChillPipeline.FixedWidthCol("qty", 13, 6)),
      skipHeader = 1, skipFooter = 1, ignoreLines = Set("SKIPME"))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("id")).toSeq == Seq("0001", "0002", "0003"))
    // right-padded text trims to the payload; left-padded numerics
    // keep their zeros (they are characters, not padding spaces)
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("alpha", "beta", "gamma"))
    assert(rows.map(_.getAs[String]("qty")).toSeq ==
      Seq("000042", "000007", "99"))
    // trimmed=false keeps the raw slice, padding and all
    val raw = ChillPipeline.rawFixedWidth(spark, d.toString + "/*.dat",
      Seq(ChillPipeline.FixedWidthCol("name", 5, 8, trimmed = false)),
      skipHeader = 1, skipFooter = 1, ignoreLines = Set("SKIPME"))
    assert(raw.orderBy("name").collect().head.getAs[String]("name") == "alpha   ")
  }

  test("rawCsvQuoted: embedded delimiters, doubled quotes, line controls") {
    val d = java.nio.file.Files.createTempDirectory("qcsv")
    java.nio.file.Files.writeString(d.resolve("FEED.csv"),
      """#header
        |1,"alpha, beta",10
        |2,"say ""hi"", now",20
        |3,plain,30
        |#trailer""".stripMargin)
    val df = ChillPipeline.rawCsvQuoted(spark, d.toString + "/*.csv",
      Seq("id", "payload", "qty"), skipHeader = 1, skipFooter = 1,
      ignoreLines = Set.empty)
    val rows = df.orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("payload"),
        r.getAs[String]("qty")))
    assert(rows.toSeq == Seq(
      ("1", "alpha, beta", "10"),
      ("2", "say \"hi\", now", "20"),
      ("3", "plain", "30")))
  }

  test("rawJsonLines: schema-on-read, missing fields null, corrupt flagged") {
    val d = java.nio.file.Files.createTempDirectory("jsonl")
    java.nio.file.Files.writeString(d.resolve("FEED.jsonl"),
      """{"id": 1, "name": "a", "qty": 10}
        |{"id": 2, "qty": 20}
        |not json at all
        |{"id": 4, "name": "d", "qty": 40}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("id BIGINT, name STRING, qty BIGINT")
    val df = ChillPipeline.rawJsonLines(spark, d.toString + "/*.jsonl", schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4)
    val corrupt = rows.filter(_.getAs[Boolean]("_corrupt"))
    assert(corrupt.length == 1)
    val byId = rows.filterNot(_.getAs[Boolean]("_corrupt"))
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[String]("name")), r.getAs[Long]("qty"))).toMap
    assert(byId == Map(1L -> (Some("a"), 10L), 2L -> (None, 20L),
      4L -> (Some("d"), 40L)))
  }

  test("slicing is exact when one file spans many splits") {
    // force multi-split reads so the per-split offset arithmetic is
    // exercised across chunk boundaries (at 100 TB every big file is
    // read this way)
    val d = java.nio.file.Files.createTempDirectory("rawsplit")
    val lines = (1 to 200).map(i => f"L$i%03d|$i%d")
    java.nio.file.Files.writeString(d.resolve("big.csv"), lines.mkString("\n"))
    java.nio.file.Files.writeString(d.resolve("small.csv"), "H|0\nS1|1\nS2|2\nF|0")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val df = ChillPipeline.rawCsv(spark, d.toString + "/*.csv", "|",
        Seq("id", "n"), skipHeader = 1, skipFooter = 1, ignoreLines = Set())
      val scan = df.queryExecution.executedPlan.toString
      assert(df.rdd.getNumPartitions > 4, s"file did not split:\n$scan")
      val got = df.select("id").collect().map(_.getString(0)).toSet
      val want = (2 to 199).map(i => f"L$i%03d").toSet ++ Set("S1", "S2")
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("filename- and tag-derived fields flow into the pipeline") {
    val raw = ChillPipeline.rawCsv(spark, rawDir + "/*.csv", "|",
      Seq("id", "cnt1", "cnt2"), skipHeader = 3, skipFooter = 1,
      ignoreLines = Set("IGNORE_ROW"))
    val tagRule = FromTag("collector", "#COLLECTOR",
      line => regexp_extract(line, "#COLLECTOR=(.*)", 1))
    val withTags = ChillPipeline.withTagColumns(spark, rawDir + "/*.csv", raw, Seq(tagRule))
    val rules: Seq[FieldRule] = Seq(
      FromFilename("node", "([A-Z_]+_[AB])_", 1),
      tagRule,
      Derived("total", col("cnt1").cast("long") + col("cnt2").cast("long")),
      Constant("source_system", lit("pm")))
    val out = FieldRule.applyAll(withTags, rules)
      .select("id", "node", "collector", "total", "source_system")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows == Set(
      ("1", "NODE_A", "cell-east-1", 110L),
      ("2", "NODE_A", "cell-east-1", 220L),
      ("3", "NODE_A", "cell-east-1", 330L),
      ("7", "NODE_B", "cell-west-9", 770L),
      ("8", "NODE_B", "cell-west-9", 880L)))
  }

  test("routing splits one feed into per-table outputs") {
    val raw = ChillPipeline.rawCsv(spark, rawDir + "/*.csv", "|",
      Seq("id", "cnt1", "cnt2"), skipHeader = 3, skipFooter = 1,
      ignoreLines = Set("IGNORE_ROW"))
    val routed = ChillPipeline.run(raw, Seq(
      Derived("idn", col("id").cast("long"))), Seq(
      TableRoute("low", col("idn") < 5, Seq("id", "cnt1")),
      TableRoute("high", col("idn") >= 5, Seq("id", "cnt2"))))
    assert(routed("low").count() == 3 && routed("high").count() == 2)
    assert(routed("low").columns.toSeq == Seq("id", "cnt1"))
  }

  test("report renders junit xml with capped failures") {
    val li = Tables.lineitem(spark, sf)
    val cc = operators.Reconcile.countCompare(li, li.filter(col("l_linenumber") =!= 7), "l_orderkey")
    val report = operators.Report.merge(
      operators.Report.countSuite(cc, "l_orderkey"),
      operators.Report.missingColumnsSuite(spark, "lineitem", Seq(), Seq()))
    val xml = operators.Report.toJunitXml(report, maxFailures = 5)
    assert(xml.contains("<testsuite name=\"record_counts\""))
    assert(xml.contains("failures="))
    assert(xml.split("<testcase").length <= 12) // capped
    assert(xml.contains("missing_columns"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl._
import graft.operators.Maintenance

/** The full reference cycle end-to-end: raw files → transform →
  * partition-overwrite load → readback → reconcile → junit, plus
  * idempotency of the reload.
  */
class LibraryRunSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeRaw(dir: java.nio.file.Path, name: String, day: String, ids: Range): Unit =
    java.nio.file.Files.writeString(dir.resolve(name),
      "id|cnt\n" + ids.map(i => s"$i|${i * 10}").mkString("\n"))

  test("library run: load, reconcile clean, junit reports zero failures") {
    val rawDir = java.nio.file.Files.createTempDirectory("lib_raw")
    val wh = java.nio.file.Files.createTempDirectory("lib_wh").toString
    writeRaw(rawDir, "F_20240101.csv", "2024-01-01", 1 to 20)
    writeRaw(rawDir, "F_20240102.csv", "2024-01-02", 21 to 40)

    val cfg = LibraryConfig(
      rawPath = rawDir.toString + "/*.csv",
      delimiter = "|",
      rawColumns = Seq("id", "cnt"),
      skipHeader = 1, skipFooter = 0, ignoreLines = Set(),
      rules = Seq(
        FromFilename("day", "F_(\\d{8})\\.csv", 1),
        Derived("idn", col("id").cast("long")),
        Derived("cntn", col("cnt").cast("long")),
        Constant("lib", lit("PM_LIB"))),
      tagRules = Seq(),
      routes = Seq(
        TableRoute("counters", col("idn") > 0, Seq("day", "id", "cntn", "lib"))),
      partitionCol = "day",
      warehouseDir = wh)

    val result = LibraryRun.run(spark, cfg, keyCols = Seq("day", "id"))
    assert(result.tables("counters").count() == 40)
    val failed = result.report.filter(col("status") === "failed").count()
    assert(failed == 0, s"clean load must reconcile clean:\n${result.junitXml}")
    assert(result.junitXml.contains("failures=\"0\""))

    // reload only day 2 with changed data: partition overwrite must
    // replace that day and leave day 1 untouched
    writeRaw(rawDir, "F_20240102.csv", "2024-01-02", 21 to 45)
    val result2 = LibraryRun.run(spark, cfg, keyCols = Seq("day", "id"))
    val byDay = result2.tables("counters").groupBy("day").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(byDay("20240101") == 20 && byDay("20240102") == 25)
  }

  test("overwritePartitions is idempotent and partition-scoped") {
    val wh = java.nio.file.Files.createTempDirectory("ow_wh").toString + "/t"
    import spark.implicits._
    val day1 = Seq(("d1", 1), ("d1", 2)).toDF("day", "v")
    val day2 = Seq(("d2", 3)).toDF("day", "v")
    Maintenance.overwritePartitions(day1, wh, "day")
    Maintenance.overwritePartitions(day2, wh, "day")
    assert(spark.read.parquet(wh).count() == 3)
    // re-write day2 with different rows: only day2 replaced
    val day2b = Seq(("d2", 30), ("d2", 31)).toDF("day", "v")
    Maintenance.overwritePartitions(day2b, wh, "day")
    val out = spark.read.parquet(wh)
    assert(out.count() == 4)
    assert(out.filter(col("day") === "d2").count() == 2)
  }
}

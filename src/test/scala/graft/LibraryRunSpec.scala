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

    import spark.implicits._
    val dim = (1 to 45).map(i => (i.toString, s"name$i")).toDF("k", "nm")
    val cfg = LibraryConfig(
      rawPath = rawDir.toString + "/*.csv",
      delimiter = "|",
      rawColumns = Seq("id", "cnt"),
      skipHeader = 1, skipFooter = 0, ignoreLines = Set(),
      rules = Seq(
        FromFilename("day", "F_(\\d{8})\\.csv", 1),
        Derived("idn", col("id").cast("long")),
        Derived("cntn", col("cnt").cast("long")),
        Constant("lib", lit("PM_LIB")),
        Lookup("id_name", dim, Seq(("id", "k")), "nm", lit("?"))),
      tagRules = Seq(),
      routes = Seq(
        TableRoute("counters", col("idn") > 0,
          Seq("day", "id", "cntn", "lib", "id_name"))),
      partitionCol = "day",
      warehouseDir = wh)

    val result = LibraryRun.run(spark, cfg, keyCols = Seq("day", "id"))
    assert(result.tables("counters").count() == 40)
    val failed = result.report.filter(col("status") === "failed").count()
    assert(failed == 0, s"clean load must reconcile clean:\n${result.junitXml}")
    assert(result.junitXml.contains("failures=\"0\""))
    // the reference's compare_data runs FIVE check kinds per table
    // (HlxTools.py:785-936); all five must be present in the report
    val kinds = result.report.select("suite").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("record_counts", "missing_records", "value_diffs",
      "missing_columns", "referential"), s"suite kinds: $kinds")

    // reload only day 2 with changed data: partition overwrite must
    // replace that day and leave day 1 untouched
    writeRaw(rawDir, "F_20240102.csv", "2024-01-02", 21 to 45)
    val result2 = LibraryRun.run(spark, cfg, keyCols = Seq("day", "id"))
    val byDay = result2.tables("counters").groupBy("day").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(byDay("20240101") == 20 && byDay("20240102") == 25)
  }

  test("library run parses the raw feed once for a 3-route config") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

    val rawDir = java.nio.file.Files.createTempDirectory("lib_raw1p")
    val wh = java.nio.file.Files.createTempDirectory("lib_wh1p").toString
    writeRaw(rawDir, "F_20240101.csv", "2024-01-01", 1 to 30)
    val cfg = LibraryConfig(
      rawPath = rawDir.toString + "/*.csv",
      delimiter = "|",
      rawColumns = Seq("id", "cnt"),
      skipHeader = 1, skipFooter = 0, ignoreLines = Set(),
      rules = Seq(
        FromFilename("day", "F_(\\d{8})\\.csv", 1),
        Derived("idn", col("id").cast("long")),
        Derived("cntn", col("cnt").cast("long"))),
      tagRules = Seq(),
      routes = Seq(
        TableRoute("low", col("idn") <= 10, Seq("day", "id", "cntn")),
        TableRoute("mid", col("idn") > 10 && col("idn") <= 20, Seq("day", "id", "cntn")),
        TableRoute("high", col("idn") > 20, Seq("day", "id", "cntn"))),
      partitionCol = "day",
      warehouseDir = wh)

    val qes = scala.collection.mutable.ArrayBuffer[QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qes.synchronized { qes += qe }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    // collect tree nodes, descending through AQE wrappers (collect()
    // treats AdaptiveSparkPlanExec and QueryStageExec — including
    // TableCacheQueryStageExec, which wraps every cached-relation
    // read under AQE — as leaves); innerChildren of InMemoryTableScan
    // are deliberately NOT traversed — a text scan inside the cached
    // relation's plan executes once at cache build, which is exactly
    // what this test permits
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case x => x }.flatMap {
        case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
        case s: QueryStageExec        => s +: nodes(s.plan)
        case x                        => Seq(x)
      }
    spark.listenerManager.register(listener)
    try {
      val result = LibraryRun.run(spark, cfg, keyCols = Seq("day", "id"))
      assert(result.tables.keySet == Set("low", "mid", "high"))
      assert(result.tables.values.map(_.count()).sum == 30)
      // listener events are async; wait for all actions to report
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        qes.synchronized(qes.size) < 3) Thread.sleep(100)
      val all = qes.synchronized(qes.toVector)
      assert(all.nonEmpty)
      val rawScans = all.flatMap(qe => nodes(qe.executedPlan)).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("lib_raw1p")) => f
      }
      assert(rawScans.isEmpty,
        s"an action re-parsed the raw feed instead of reading the cached parse:\n${all.map(_.executedPlan).mkString("\n---\n")}")
      val cacheReads = all.count(qe =>
        nodes(qe.executedPlan).exists(_.isInstanceOf[InMemoryTableScanExec]))
      assert(cacheReads >= 3,
        s"route writes should read the persisted transform (got $cacheReads cache-reading actions)")
    } finally spark.listenerManager.unregister(listener)
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

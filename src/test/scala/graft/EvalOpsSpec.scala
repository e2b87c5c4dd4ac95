package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.text.Evaluate

/** Specs for the evaluation-metric family (exact AUC, calibration
  * bins, Cohen's kappa) and the RFM / market-basket warehouse ops.
  */
class EvalOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def scored(rows: Seq[(String, Long, Int)]) =
    rows.toDF("grp", "score", "pos")

  test("AUC is 1 for perfect separation, 0 for perfectly inverted") {
    val perfect = scored(Seq(("g", 1L, 0), ("g", 2L, 0), ("g", 3L, 1), ("g", 4L, 1)))
    val out = Evaluate.aucByGroup(perfect, col("score"), col("pos"), col("grp"))
      .collect().head
    assert(out.getAs[Double]("auc") == 1.0)
    val inverted = scored(Seq(("g", 4L, 0), ("g", 3L, 0), ("g", 2L, 1), ("g", 1L, 1)))
    val out2 = Evaluate.aucByGroup(inverted, col("score"), col("pos"), col("grp"))
      .collect().head
    assert(out2.getAs[Double]("auc") == 0.0)
  }

  test("AUC midrank tie handling: all-tied scores give exactly 0.5, " +
    "and a half-informative score gives the hand value") {
    val tied = scored(Seq(("g", 7L, 0), ("g", 7L, 1), ("g", 7L, 0), ("g", 7L, 1)))
    val a = Evaluate.aucByGroup(tied, col("score"), col("pos"), col("grp"))
      .collect().head
    assert(a.getAs[Double]("auc") == 0.5)
    // scores: neg {1, 3}, pos {3, 5} -> pairs: (1<3)=1, (1<5)=1,
    // (3,3)=0.5, (3<5)=1 -> AUC = 3.5/4
    val half = scored(Seq(("g", 1L, 0), ("g", 3L, 0), ("g", 3L, 1), ("g", 5L, 1)))
    val b = Evaluate.aucByGroup(half, col("score"), col("pos"), col("grp"))
      .collect().head
    assert(b.getAs[Double]("auc") == 3.5 / 4)
  }

  test("AUC is null for single-class groups and groups stay independent") {
    val df = scored(Seq(("only_pos", 1L, 1), ("only_pos", 2L, 1),
      ("mixed", 1L, 0), ("mixed", 2L, 1)))
    val m = Evaluate.aucByGroup(df, col("score"), col("pos"), col("grp"))
      .collect().map(r => r.getString(0) -> Option(r.getAs[java.lang.Double]("auc"))).toMap
    assert(m("only_pos").isEmpty)
    assert(m("mixed").contains(1.0))
  }

  test("calibration bins: exact counts, clamped top edge, exact rates") {
    val df = Seq((0L, 0), (50L, 0), (100L, 1), (950L, 1), (1000L, 1))
      .toDF("sm", "pos")
    val out = Evaluate.calibrationBins(df, col("sm"), col("pos"), 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // bin 0: sm 0, 50; bin 1: sm 100; bin 9: sm 950 and clamped 1000
    assert(out == Map(0L -> (2L, 50L, 0L), 1L -> (1L, 100L, 1L),
      9L -> (2L, 1950L, 2L)))
  }

  test("kappa: identical labelers 1.0, hand-checked 2x2 value, " +
    "degenerate single-label pair null") {
    val same = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("x", "y")
    val k1 = Evaluate.cohenKappa(same, col("x"), col("y")).collect().head
    assert(k1.getAs[Double]("kappa") == 1.0)
    // n=4, agree=2, rows a:2 b:2, cols a:2 b:2 -> sum_rc=8,
    // kappa = (8-8)/(16-8) = 0
    val indep = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")).toDF("x", "y")
    val k2 = Evaluate.cohenKappa(indep, col("x"), col("y")).collect().head
    assert(k2.getAs[Double]("kappa") == 0.0)
    val degen = Seq(("a", "a"), ("a", "a")).toDF("x", "y")
    val k3 = Evaluate.cohenKappa(degen, col("x"), col("y")).collect().head
    assert(k3.isNullAt(k3.fieldIndex("kappa")))
  }

  test("RFM tiers: deterministic, 1 = best on each axis, segment concat") {
    val orders = Seq(
      // custkey, orderdate, totalprice
      (1L, "2024-01-10", 500.0), (1L, "2024-03-01", 500.0),
      (2L, "2024-02-01", 100.0),
      (3L, "2024-01-01", 10.0),
      (4L, "2023-12-01", 2000.0),
      (5L, "2023-11-01", 50.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date")).drop("d")
    val out = Analytics.rfmSegments(orders, 5)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("segment")).toMap
    // recency order: 1 (Mar), 2 (Feb), 3 (Jan), 4 (Dec), 5 (Nov)
    // frequency: 1 has 2 orders, rest 1 (tie -> custkey order)
    // monetary: 4 (2000), 1 (1000), 2 (100), 5 (50), 3 (10)
    assert(out == Map(1L -> "112", 2L -> "223", 3L -> "335",
      4L -> "441", 5L -> "554"))
    val again = Analytics.rfmSegments(orders, 5)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("segment")).toMap
    assert(out == again)
  }

  test("basket lift: exact support, confidence, and lift on hand data") {
    // baskets: {1,2,3}, {1,2}, {1,3}, {2} -> pair (1,2) in 2 baskets
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketLift(li, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    // c_1=3, c_2=3, c_3=2, n=4
    // (1,2): c_ab=2, conf=2/3, lift=4*2/(3*3)
    // (1,3): c_ab=2, conf=2/3, lift=4*2/(3*2)
    assert(out.keySet == Set((1L, 2L), (1L, 3L)))
    assert(out((1L, 2L)) == ((2L, 2.0 / 3, 8.0 / 9)))
    assert(out((1L, 3L)) == ((2L, 2.0 / 3, 8.0 / 6)))
  }

  test("alarm hysteresis: on above hi, holds in the dead band, off below lo") {
    // one type, five days, counts 10,10,30,12,5 -> total 67, n_days 5
    // hi edge: 25c > 402 (c > 16.08) -> day 3; lo edge: 25c < 268
    // (c < 10.72) -> days 1,2,5; day 4 (c=12) is dead band -> holds on
    val counts = Seq(10, 10, 30, 12, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (s"2024-01-0${d + 1} 0${i % 10}:00:00", "t"))
    }
    val ev = rows.toDF("tss", "event_type")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = graft.operators.Kpi.alarmHysteresis(ev)
      .collect().map(r => r.getDate(1).toString ->
        (Option(r.getString(3)), r.getString(4))).toMap
    assert(out("2024-01-01") == ((Some("off"), "off")))
    assert(out("2024-01-02") == ((Some("off"), "off")))
    assert(out("2024-01-03") == ((Some("on"), "on")))
    assert(out("2024-01-04") == ((None, "on"))) // dead band holds
    assert(out("2024-01-05") == ((Some("off"), "off")))
  }

  test("label propagation: two disconnected triangles converge to " +
    "their min labels in 2 rounds") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("s1", "s2")
    val out = graft.operators.Graph.labelPropagation(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("event paths: sliding trigrams per user in (ts, event_id) order") {
    val ev = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:01"),
      (1L, 2L, "B", "2024-01-01 00:00:02"),
      (1L, 3L, "C", "2024-01-01 00:00:03"),
      (1L, 4L, "D", "2024-01-01 00:00:04"),
      (2L, 5L, "A", "2024-01-01 00:00:01"),
      (2L, 6L, "B", "2024-01-01 00:00:02"),
      (2L, 7L, "C", "2024-01-01 00:00:03"))
      .toDF("user_id", "event_id", "event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.eventPaths(ev, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("A>B>C" -> 2L, "B>C>D" -> 1L))
  }

  test("data gaps: maximal missing runs with exact bounds and lengths") {
    val ev = Seq(1, 2, 5, 6, 10)
      .map(d => ("t", f"2024-01-$d%02d 12:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.dataGaps(ev)
      .collect().map(r => (r.getDate(1).toString, r.getDate(2).toString,
        r.getInt(3))).toSet
    assert(out == Set(("2024-01-03", "2024-01-04", 2),
      ("2024-01-07", "2024-01-09", 3)))
  }

  test("ann recall: perfect on separable data, bounded by k, one row per query") {
    // 12 vectors in two tight clusters; quantization cannot reorder
    // neighbors across clusters, so recall@3 is exactly 1
    val emb = (0L until 6L).map(i => (i, Seq(1f, 0.01f * i, 0f))) ++
      (6L until 12L).map(i => (i, Seq(0f, 0.01f * i, 1f)))
    val df = emb.toDF("vec_id", "embedding")
    val out = graft.ann.Ann.annRecall(df, df.filter(col("vec_id") < 2), 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("recall"))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out.values.forall { case (n, rec) =>
      n <= 3 && rec >= 0.0 && rec <= 1.0 })
    assert(out.values.forall(_._2 == 1.0))
  }

  test("time to convert: first view anchors, earlier purchases ignored, " +
    "non-converters excluded") {
    val ev = Seq(
      (1L, "purchase", "2024-01-01 00:00:05"), // before the first view
      (1L, "view", "2024-01-01 00:00:10"),
      (1L, "purchase", "2024-01-01 00:00:20"), // first qualifying: +10s
      (1L, "purchase", "2024-01-01 00:00:30"),
      (2L, "purchase", "2024-01-01 00:00:01"), // no view at all
      (3L, "view", "2024-01-01 00:00:01")) // never converts
      .toDF("user_id", "event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val r = Analytics.timeToConvert(ev, "view", "purchase").collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 10000000L && r.getLong(2) == 10000000L)
    assert(r.getDouble(3) == 1.0e7 && r.getDouble(4) == 1.0e7)
  }

  test("adoption curve: first-seen days and exact running total") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 10:00:00"),
      (2L, "2024-01-01 11:00:00"),
      (3L, "2024-01-03 09:00:00"))
      .toDF("user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.adoptionCurve(ev)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("2024-01-01" -> ((2L, 2L)), "2024-01-03" -> ((1L, 3L))))
  }

  test("feed staleness: lagging family flagged with exact day count") {
    val ev = Seq(
      ("a", "2024-01-05 10:00:00"), ("a", "2024-01-01 10:00:00"),
      ("b", "2024-01-03 10:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = graft.operators.Maintenance.feedStaleness(ev)
      .collect().map(r => r.getString(0) ->
        (r.getInt(r.fieldIndex("days_stale")), r.getBoolean(r.fieldIndex("is_stale"))))
      .toMap
    assert(out == Map("a" -> ((0, false)), "b" -> ((2, true))))
  }

  test("busy hour: deterministic argmax with hr tie-break, exact share") {
    val ev = (Seq.fill(3)("2024-01-01 09:10:00") ++
      Seq.fill(3)("2024-01-02 07:30:00") ++ // ties 3-3 -> hr 7 wins
      Seq.fill(2)("2024-01-01 13:00:00"))
      .map(t => ("t", t)).toDF("event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val r = graft.operators.Kpi.busyHour(ev).collect().head
    assert(r.getInt(1) == 7 && r.getLong(2) == 3L && r.getLong(3) == 8L)
    assert(r.getDouble(4) == 3.0 / 8)
  }

  test("dow profile: 0 = Sunday, shares sum to one per family") {
    // 2024-01-07 is a Sunday
    val ev = Seq(("t", "2024-01-07 10:00:00"), ("t", "2024-01-08 10:00:00"),
      ("t", "2024-01-08 11:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = graft.operators.Kpi.dowProfile(ev)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(out == Map(0 -> ((1L, 1.0 / 3)), 1 -> ((2L, 2.0 / 3))))
  }

  test("degree distribution: exact histogram and shares on a path graph") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s1", "s2")
    val out = graft.operators.Graph.degreeDistribution(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out == Map(1L -> ((2L, 2.0 / 3)), 2L -> ((1L, 1.0 / 3))))
  }

  test("blocking recall: partial candidate coverage measured exactly") {
    val exact = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val cand = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L)).toDF("doc_a", "doc_b")
    val r = graft.dedup.Dedup.blockingRecall(exact, cand).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 2.0 / 3 && r.getDouble(4) == 2.0 / 4)
    // empty-on-both-sides edge: counts stay 0 (not null), rates null —
    // the contract the former count-based aggregate gave for free
    val z = graft.dedup.Dedup.blockingRecall(
      exact.limit(0), cand.limit(0)).collect().head
    assert(z.getLong(0) == 0L && z.getLong(1) == 0L && z.getLong(2) == 0L)
    assert(z.isNullAt(3) && z.isNullAt(4))
  }

  test("basket lift dedups repeated lines of the same part in a basket") {
    val li = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.basketLift(li, 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 2L)
  }
}

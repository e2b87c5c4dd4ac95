package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.{Analytics, Reconcile}

/** Specs for the reconciliation/ops batch: order-insensitive bucket
  * checksums, sliding-window burst detection, the cross-source
  * duplication matrix, and ship-lag percentiles.
  */
class ReconBatchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]) =
    rows.toDF("event_id", "user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  test("bucket checksum: hand value, order-insensitive, bit-sensitive") {
    val a = ev(Seq((1L, 10L, "2024-01-01 00:00:00"),
      (2L, 20L, "2024-01-01 01:00:00")))
    def h(id: Long, uid: Long, us: Long) =
      (id % 1000003L) * 2097143L + (uid % 1000033L) * 4093L + us % 1000000007L
    val us0 = 1704067200000000L // 2024-01-01T00:00:00Z
    val expect = h(1, 10, us0) + h(2, 20, us0 + 3600L * 1000000)
    val out = Reconcile.bucketChecksums(a).collect().head
    assert(out.getAs[Long]("n_rows") == 2L)
    assert(out.getAs[Long]("checksum") == expect)
    // same rows, reversed order -> identical checksum
    val b = ev(Seq((2L, 20L, "2024-01-01 01:00:00"),
      (1L, 10L, "2024-01-01 00:00:00")))
    assert(Reconcile.bucketChecksums(b).collect().head
      .getAs[Long]("checksum") == expect)
    // one changed user id -> different checksum
    val c = ev(Seq((1L, 11L, "2024-01-01 00:00:00"),
      (2L, 20L, "2024-01-01 01:00:00")))
    assert(Reconcile.bucketChecksums(c).collect().head
      .getAs[Long]("checksum") != expect)
  }

  test("burst detect: window width decides which events co-count") {
    val e = ev(Seq((1L, 7L, "2024-01-01 00:00:00"),
      (2L, 7L, "2024-01-01 00:00:30"),
      (3L, 7L, "2024-01-01 00:01:10")))
    // 60s window: {t0,t30} then {t30,t70} -> peak 2
    val narrow = Analytics.burstDetect(e, 60000000L).collect().head
    assert(narrow.getAs[Long]("max_burst") == 2L)
    assert(narrow.getAs[Long]("n_events") == 3L)
    // 100s window covers all three
    val wide = Analytics.burstDetect(e, 100000000L).collect().head
    assert(wide.getAs[Long]("max_burst") == 3L)
  }

  test("cross-source matrix: unordered pairs collapse, diagonal kept") {
    val docs = Seq((0L, "A"), (1L, "B"), (2L, "A"), (3L, "B"))
      .toDF("doc_id", "source")
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.crossSourceMatrix(docs, pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (0,1)=A-B, (1,2)=B-A -> both A,B; (0,2)=A-A diagonal
    assert(out == Map(("A", "B") -> 2L, ("A", "A") -> 1L))
  }

  test("lang confusion: counts and recall per true language") {
    val docs = Seq(
      (0L, "en", "the cat and the dog is a pet"), // en scored
      (1L, "en", "zzz qqq"),                      // no stopwords -> und
      (2L, "fr", "le chat et les chiens des"))    // fr scored
      .toDF("doc_id", "lang", "text")
    val out = graft.text.TextOps.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_true"),
          r.getAs[Double]("share_of_true"))).toMap
    assert(out(("en", "en")) == (1L, 2L, 0.5))
    assert(out(("en", "und")) == (1L, 2L, 0.5))
    assert(out(("fr", "fr")) == (1L, 1L, 1.0))
  }

  test("partition skew: shares and even-split ratios are exact") {
    val df = (Seq.fill(6)(0L) ++ Seq.fill(2)(1L)).toDF("user_id")
    val out = graft.operators.Layout.partitionSkew(df, col("user_id"), 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        r.getAs[Double]("share"), r.getAs[Double]("ratio_to_even"))).toMap
    assert(out(0L) == (6L, 0.75, 1.5))
    assert(out(1L) == (2L, 0.25, 0.5))
  }

  test("delta encode: varint ladder and first-event full width") {
    val e = ev(Seq(
      (1L, 7L, "2024-01-01 00:00:00"),       // first: 8 bytes
      (2L, 7L, "2024-01-01 00:00:00.000100"), // delta 100us -> 1 byte
      (3L, 7L, "2024-01-01 00:01:00"),       // delta ~60M us -> 4 bytes
      (4L, 8L, "2024-01-01 00:00:00")))      // new user: 8 bytes
    val r = graft.operators.Layout.deltaEncodingAdvisor(e).collect().head
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("raw_bytes") == 32L)
    assert(r.getAs[Long]("varint_bytes") == (8L + 1L + 4L + 8L))
    assert(r.getAs[Double]("compression_ratio") == 32.0 / 21)
  }

  test("session stats: bounce and duration math over a hand session table") {
    val sessions = Seq(
      (1L, 1L, 3L, "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
      (2L, 1L, 1L, "2024-01-01 11:00:00", "2024-01-01 11:00:00"),
      (3L, 1L, 2L, "2024-01-02 09:00:00", "2024-01-02 09:30:00"))
      .toDF("user_id", "session_id", "n_events", "s", "e")
      .withColumn("session_start", col("s").cast("timestamp"))
      .withColumn("session_end", col("e").cast("timestamp"))
    val out = Analytics.sessionStats(sessions).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounce"),
          r.getAs[Double]("bounce_rate"), r.getAs[Double]("avg_dur_us"))).toMap
    // Jan 1: 600s + 0s over 2 sessions, one bounce
    assert(out("2024-01-01") == (2L, 1L, 0.5, 300000000.0))
    assert(out("2024-01-02") == (1L, 0L, 0.0, 1800000000.0))
  }

  test("compaction plan: width model and ceil-divisions are exact") {
    val e = Seq((1L, 1L, "ab", "xyz", "2024-01-01 00:00:00"),
      (2L, 1L, "ab", null, "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "props", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    // widths: 28+2+3 = 33 and 28+2+0 = 30 -> 63 bytes
    val r = graft.operators.Layout.compactionPlan(e, 50L).collect().head
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(r.getAs[Long]("est_bytes") == 63L)
    assert(r.getAs[Long]("n_files") == 2L)   // ceil(63/50)
    assert(r.getAs[Long]("rows_per_file") == 1L)
  }

  test("windowed funnel: a step outside the horizon does not convert") {
    def e(uid: Long, t: String, ts: String) = (uid, t, ts)
    val ev = Seq(
      // u1 converts fully inside the 1h horizon
      e(1, "view", "2024-01-01 10:00:00"), e(1, "click", "2024-01-01 10:30:00"),
      e(1, "purchase", "2024-01-01 11:00:00"),
      // u2's click comes 2h after the view -> stalls at stage 1
      e(2, "view", "2024-01-01 10:00:00"), e(2, "click", "2024-01-01 12:00:00"),
      // u3 never views
      e(3, "click", "2024-01-01 10:00:00"))
      .map { case (u, t, s) => (u, t, s) }
      .toDF("user_id", "event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.funnelWindowed(ev, Seq("view", "click", "purchase"), 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(3 -> 1L, 1 -> 1L, 0 -> 1L))
    // the unbounded funnel would have let u2 through to stage 2
    val unbounded = Analytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(unbounded == Map(3 -> 1L, 2 -> 1L, 0 -> 1L))
  }

  test("theil-sen: one outlier day cannot move the median slope") {
    // type t: days 1..5 with counts 1,2,3,4,100 (the 100 is an outlier)
    val ev = (Seq.fill(1)(1) ++ Seq.fill(2)(2) ++ Seq.fill(3)(3) ++
      Seq.fill(4)(4) ++ Seq.fill(100)(5))
      .map(d => ("t", f"2024-01-0$d%d 10:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val r = Analytics.theilSenSlope(ev).collect().head
    assert(r.getAs[Long]("n_pairs") == 10L)
    // slopes: six pairs among days 1-4 are all 1.0; the four pairs
    // involving day 5 are 24.75, 32.67, 48.5, 96 -> median sits at 1
    // only if >half the slopes are 1; here median of
    // [1,1,1,1,1,1,24.75,32.67,48.5,96] = 1.0
    assert(r.getAs[Double]("sen_slope") == 1.0)
  }

  test("gini: uniform counts score 0, total concentration approaches 1") {
    val uniform = (1 to 4).flatMap(u => Seq.fill(5)((u.toLong, "t")))
      .toDF("user_id", "event_type")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val g0 = Analytics.giniConcentration(uniform).collect().head
    assert(g0.getAs[Double]("gini") == 0.0)
    // one whale: counts [1, 1, 1, 97] over 4 users
    val whale = (Seq.fill(1)(1L) ++ Seq.fill(1)(2L) ++ Seq.fill(1)(3L) ++
      Seq.fill(97)(4L)).map((_, "t"))
      .toDF("user_id", "event_type")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val g1 = Analytics.giniConcentration(whale).collect().head
    // i*x sorted asc: 1*1+2*1+3*1+4*97 = 394; gini = 2*394/(4*100) - 5/4
    assert(g1.getAs[Double]("gini") == 2.0 * 394 / 400 - 1.25)
    assert(g1.getAs[Double]("gini") > 0.7)
  }

  test("ship lag: exact percentile interpolation per priority") {
    val li = Seq((1L, "2024-01-05"), (1L, "2024-01-11"),
      (2L, "2024-02-03"), (2L, "2024-02-05"))
      .toDF("l_orderkey", "sd")
      .withColumn("l_shipdate", col("sd").cast("timestamp")).drop("sd")
    val o = Seq((1L, "HI", "2024-01-01"), (2L, "HI", "2024-02-01"))
      .toDF("o_orderkey", "o_orderpriority", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
    val r = Analytics.shipLag(li, o).collect().head
    // lags: 4, 10, 2, 4 -> sorted 2,4,4,10; p50 = 4, min 2, max 10
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("min_days") == 2L)
    assert(r.getAs[Long]("max_days") == 10L)
    assert(r.getAs[Double]("p50_days") == 4.0)
  }
}

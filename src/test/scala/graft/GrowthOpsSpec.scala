package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.{Analytics, Graph}
import graft.text.TextOps

/** Specs for the round-6 batch: seasonal-naive backtest, weekly
  * growth accounting, quantile normalization, edit-distance dedup,
  * personalized PageRank, and the vocabulary growth curve.
  */
class GrowthOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def events(rows: Seq[(String, String)]) =
    rows.toDF("event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  test("seasonal naive: day-7 forecast, exact errors, unmatched days dropped") {
    // type a: Jan 1 ×2, Jan 8 ×3 (scored), Jan 15 missing, Jan 22 ×1
    // (not scored: Jan 15 has no actual so Jan 22 has no forecast)
    val ev = events(
      Seq.fill(2)(("a", "2024-01-01 10:00:00")) ++
      Seq.fill(3)(("a", "2024-01-08 10:00:00")) ++
      Seq(("a", "2024-01-22 10:00:00")))
    val out = Analytics.seasonalNaive(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[java.sql.Date]("day").toString == "2024-01-08")
    assert(r.getAs[Long]("n_actual") == 3L)
    assert(r.getAs[Long]("n_forecast") == 2L)
    assert(r.getAs[Long]("abs_err") == 1L)
    assert(r.getAs[Double]("ape") == 1.0 / 3)
  }

  test("growth accounting: retained/new/resurrected/churned classify exactly") {
    // weeks: w1 = Jan 1, w2 = Jan 8, w3 = Jan 15 (2024-01-01 is a Monday)
    // u1: w1, w2, w3 (retained twice); u2: w1 only (churns in w2);
    // u3: w2, w3 (new in w2); u4: w1, w3 (resurrected in w3)
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-08"), (1L, "2024-01-15"),
      (2L, "2024-01-02"),
      (3L, "2024-01-09"), (3L, "2024-01-16"),
      (4L, "2024-01-03"), (4L, "2024-01-17"))
      .toDF("user_id", "d")
      .withColumn("ts", col("d").cast("timestamp"))
      .withColumn("event_type", lit("t")).drop("d")
    val out = Analytics.growthAccounting(ev).collect()
      .map(r => r.getAs[java.sql.Date]("wk").toString ->
        (r.getAs[Long]("active"), r.getAs[Long]("retained"),
          r.getAs[Long]("new_users"), r.getAs[Long]("resurrected"),
          Option(r.getAs[java.lang.Long]("churned")).map(_.toLong)))
      .toMap
    assert(out("2024-01-01") == (3L, 0L, 3L, 0L, None))
    // w2: u1 retained, u3 new; churned = 3 actives(w1) - 1 retained = 2
    assert(out("2024-01-08") == (2L, 1L, 1L, 0L, Some(2L)))
    // w3: u1 retained, u3 retained, u4 resurrected; churned = 2 - 2 = 0
    assert(out("2024-01-15") == (3L, 2L, 0L, 1L, Some(0L)))
  }

  test("quantile normalization maps within-source ranks onto pooled scores") {
    val docs = Seq(
      (0L, "A", 1L), (1L, "A", 2L), (2L, "A", 3L), (3L, "A", 4L),
      (4L, "B", 10L), (5L, "B", 20L))
      .toDF("doc_id", "source", "n_chars")
    val out = TextOps.quantileNormalize(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("norm_score")).toMap
    // pool sorted: 1,2,3,4,10,20 (N=6); A (n=4): ranks 1..4 ->
    // ceil(6k/4) = 2,3,5,6 -> 2,3,10,20; B (n=2): ceil(6k/2) = 3,6 -> 3,20
    assert(out == Map(0L -> 2L, 1L -> 3L, 2L -> 10L, 3L -> 20L,
      4L -> 3L, 5L -> 20L))
  }

  test("edit-distance pairs: bounded verify, band adjacency, token blocking") {
    val docs = Seq(
      (0L, "hello world foo bar baz"),
      (1L, "hello world foo bar qux"),   // dist 3 from doc 0
      (2L, "hello " + ("x" * 40)),       // same tok0, next length band
      (3L, "hello " + ("x" * 39) + "y"), // dist 1 from doc 2
      (4L, "goodbye world foo bar baz")) // close to doc 0 but tok0 differs
      .toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, 20, 32).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("dist")).toMap
    assert(out == Map((0L, 1L) -> 3L, (2L, 3L) -> 1L))
  }

  test("auto edit-distance blocking widens the key when a prefix stops " +
    "discriminating") {
    val docs = Seq(
      (0L, "a b c d e"), (1L, "a b c d f"), // share 2-token prefix
      (2L, "a c x y z"))                    // shares only 1 token with them
      .toDF("doc_id", "text")
    // targetBlock=2: a 1-token key puts all 3 docs in one block
    // (3 > 2*1), a 2-token key splits {a b} vs {a c} (3 <= 2*2)
    val out = Dedup.editDistancePairsAuto(docs, 20, 32, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L)))
    // a loose target keeps the recall-friendly 1-token key, which on
    // these short strings also surfaces doc 2 (4 edits away) — the
    // recall the wider key trades for scale, made visible
    val loose = Dedup.editDistancePairsAuto(docs, 20, 32, 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("hits: hand-computed hubs and authorities after two rounds") {
    val edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
      .toDF("src", "dst")
    val out = Graph.hits(edges, 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // r1: a(s1)=2, a(s2)=1; h(c1)=3, h(c2)=2
    // r2: a(s1)=3+2=5, a(s2)=3; h(c1)=5+3=8, h(c2)=5
    assert(out == Map(
      "c1" -> (8L, 0L), "c2" -> (5L, 0L),
      "s1" -> (0L, 5L), "s2" -> (0L, 3L)))
  }

  test("personalized pagerank: teleport mass stays on the seed set") {
    // cycle s -> a -> b -> s, seed = {s}, init = 100, boost = 15
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "s")).toDF("src", "dst")
    val seeds = Seq("s").toDF("node")
    val r1 = Graph.personalizedPageRank(edges, seeds, 1, 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == Map("s" -> 15L, "a" -> 85L, "b" -> 0L))
    val r2 = Graph.personalizedPageRank(edges, seeds, 2, 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 2: a <- 85*15 div 100 = 12, b <- 85*85 div 100 = 72, s = 15
    assert(r2 == Map("s" -> 15L, "a" -> 12L, "b" -> 72L))
  }

  test("readability: hand-counted syllables/sentences, floor at one sentence") {
    val docs = Seq(
      (1L, "the cat sat. it sat well!", "s1"),
      (2L, "go", "s1"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.readability(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: 6 words, 2 sentences, vowel runs: e,a,a,i,a,e = 6
    val (w1, s1, y1, f1) = out(1L)
    assert((w1, s1, y1) == (6L, 2L, 6L))
    assert(math.abs(f1 - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9)
    // doc 2: no sentence punctuation → floor at 1 keeps it defined
    assert(out(2L)._2 == 1L)
  }

  test("encoding qa: artifact classes count and flag per source") {
    val docs = Seq(
      (1L, "clean text", "a"),
      (2L, "mojibake Ã¡ and Â here", "a"),
      (3L, "lost � char � twice", "a"),
      (4L, "control\u0001char", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.encodingQa(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_flagged") == 2L)
    assert(a.getAs[Long]("mojibake_chars") == 2L)
    assert(a.getAs[Long]("replacement_chars") == 2L)
    assert(a.getAs[Double]("flagged_rate") == 2.0 / 3)
    assert(out("b").getAs[Long]("control_chars") == 1L)
  }

  test("capacity forecast: exact ramp crosses 2x peak on schedule, " +
    "flat series never does") {
    // type r: counts 1,2,3 on days 0,1,2 → fit y = 1 + x exactly;
    // threshold 6 is reached at x = 5 → 3 days past the last day
    val ev = events(
      Seq(("r", "2024-01-01 00:00:00")) ++
      Seq.fill(2)(("r", "2024-01-02 00:00:00")) ++
      Seq.fill(3)(("r", "2024-01-03 00:00:00")) ++
      Seq.fill(2)(("f", "2024-01-01 00:00:00")) ++
      Seq.fill(2)(("f", "2024-01-02 00:00:00")))
    val out = Analytics.capacityForecast(ev, 2L, 1L).collect()
      .map(r => r.getString(0) -> r).toMap
    val r = out("r")
    assert(r.getAs[Long]("peak_y") == 3L)
    assert(r.getAs[Long]("threshold") == 6L)
    assert(r.getAs[Double]("slope_per_day") == 1.0)
    assert(r.getAs[Long]("days_to_threshold") == 3L)
    // flat: slope 0 → never (-1 sentinel)
    assert(out("f").getAs[Long]("days_to_threshold") == -1L)
  }

  test("vocab sketch: whole-vocab sketches estimate exactly, small k caps") {
    // A and B share 2 of their 3+3 bigrams' union... construct:
    // A: "x y z" → bigrams (x y), (y z); B: "x y w" → (x y), (y w)
    // exact J = 1/3; k=32 captures both whole vocabs → estimate exact
    val docs = Seq(
      (1L, "x y z", "A"), (2L, "x y w", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.vocabJaccardSketch(docs, 32).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("A", "B"))
    assert(r.getAs[Long]("k_used") == 3L) // |union| = 3 < k
    assert(r.getAs[Long]("shared") == 1L)
    assert(r.getAs[Double]("jaccard_est") == 1.0 / 3)
    // k=2 caps the sketch at 2 hashes per source
    val capped = TextOps.vocabJaccardSketch(docs, 2).collect().head
    assert(capped.getAs[Long]("k_used") == 2L)
  }

  test("dow anomalies: weekly rhythm is baseline, only the spike flags") {
    // Mondays run at 10, Tuesdays at 2 — a flat median would flag
    // every Monday; the dow baseline flags only the 100-spike Monday
    val ev = events(
      Seq("2024-01-01", "2024-01-08", "2024-01-15")
        .flatMap(d => Seq.fill(10)(("m", s"$d 10:00:00"))) ++
      Seq.fill(100)(("m", "2024-01-22 10:00:00")) ++
      Seq("2024-01-02", "2024-01-09", "2024-01-16")
        .flatMap(d => Seq.fill(2)(("m", s"$d 10:00:00"))))
    val out = Analytics.dowAdjustedAnomalies(ev, 3L, 1L).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Double]("dow_median"), r.getAs[Boolean]("is_anomaly"))).toMap
    assert(out.size == 7)
    assert(out("2024-01-22") == (10.0, true))
    assert(out.filter(_._2._2).keySet == Set("2024-01-22"))
    assert(out("2024-01-02")._1 == 2.0)
  }

  test("tf cosine: repetition-aware similarity, df cap starves hot terms") {
    val docs = Seq(
      (1L, "a b"), (2L, "b c"),            // cos = 1/2 on unigrams
      (3L, "x x y"), (4L, "x x y"))        // identical → cos 1
      .toDF("doc_id", "text")
    val out = Dedup.tfCosinePairs(docs, 0.4, dfCap = 10, n = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // sqrt-division floats: compare to 1e-12, not bit-exact
    assert(math.abs(out((1L, 2L)) - 0.5) < 1e-12)
    assert(math.abs(out((3L, 4L)) - 1.0) < 1e-12)
    // cap at df <= 1: every shared term is starved out of the dot,
    // no pair survives — but norms still include the hot terms
    assert(Dedup.tfCosinePairs(docs, 0.01, dfCap = 1, n = 1).count() == 0)
  }

  test("counter types: monotone-with-reset classifies cumulative, " +
    "oscillation classifies gauge") {
    def rows(t: String, vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) =>
        (t, 7L, v, i.toLong, f"2024-01-01 10:${i}%02d:00") }
    // c: 20 monotone steps + 1 reset = 1/20 negatives → cumulative
    // g: alternating up/down → ~half negative → gauge
    val ev = (rows("c", (1 to 20).map(_.toDouble) :+ 2.0) ++
      rows("g", Seq(5.0, 1.0, 6.0, 2.0, 7.0, 3.0)))
      .toDF("event_type", "user_id", "value", "event_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = graft.operators.Rollups.counterTypeReport(ev).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_neg"),
        r.getAs[String]("kind"))).toMap
    assert(out("c") == (1L, "cumulative")) // 1 of 20 deltas ≤ 5%
    assert(out("g") == (3L, "gauge"))
  }

  test("counter deltas: monotone growth sums, a reset restarts from zero") {
    val ev = Seq(
      (1L, 10.0, "2024-01-01 10:00:00"), (2L, 15.0, "2024-01-01 11:00:00"),
      (3L, 3.0, "2024-01-02 10:00:00"), (4L, 4.5, "2024-01-02 11:00:00"))
      .toDF("event_id", "value", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .withColumn("event_type", lit("t")).withColumn("user_id", lit(7L))
    val out = graft.operators.Rollups.counterDeltas(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_samples"), r.getAs[Long]("delta_cents"),
          r.getAs[Long]("n_resets"))).toMap
    // day 1: first sample contributes 0, then 15-10 = 5.00
    assert(out("2024-01-01") == (2L, 500L, 0L))
    // day 2: 15 -> 3 is a reset (delta = the 3.00 reading), then +1.50
    assert(out("2024-01-02") == (2L, 450L, 1L))
  }

  test("interval coverage: overlapping and nested spans union exactly") {
    val orders = Seq(
      (1L, 100L, "2024-01-01"), (2L, 100L, "2024-01-03"),
      (3L, 100L, "2024-01-20"), (4L, 100L, "2024-01-04"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", col("d").cast("date")).drop("d")
    val li = Seq(
      (1L, "2024-01-02"), (1L, "2024-01-05"),  // o1 ends Jan 5
      (2L, "2024-01-07"),                       // o2 [3,7] overlaps o1
      (3L, "2024-01-21"),                       // o3 [20,21] separate
      (4L, "2024-01-04"))                       // o4 [4,4] nested in o1∪o2
      .toDF("l_orderkey", "d")
      .withColumn("l_shipdate", col("d").cast("date")).drop("d")
    val r = Analytics.intervalCoverage(orders, li).collect().head
    assert(r.getAs[Long]("o_custkey") == 100L)
    assert(r.getAs[Long]("n_islands") == 2L)   // [1..7] and [20..21]
    assert(r.getAs[Long]("n_orders") == 4L)
    assert(r.getAs[Long]("covered_days") == 9L) // 7 + 2
  }

  test("zone map advisor: clustered layout skips, interleaved cannot") {
    // physical order by `pos` interleaves the value ranges so every
    // early block straddles the probe; order by `v` isolates it
    val rows = Seq((1L, 1L), (8L, 2L), (2L, 3L), (7L, 4L),
      (3L, 5L), (6L, 6L), (4L, 7L), (5L, 8L)).toDF("v", "pos")
    def run(sortCols: Seq[String], label: String) =
      graft.operators.Layout
        .zoneMapAdvisor(rows, sortCols, "v", 2, Seq(3L), label)
        .collect().head
    val clustered = run(Seq("v"), "by_v")
    assert(clustered.getAs[Long]("n_blocks") == 4L)
    assert(clustered.getAs[Long]("n_scanned") == 1L)
    assert(clustered.getAs[Double]("skip_rate") == 0.75)
    // blocks {1,8},{2,7},{3,6},{4,5}: probe 3 inside three ranges
    val interleaved = run(Seq("pos"), "by_pos")
    assert(interleaved.getAs[Long]("n_scanned") == 3L)
  }

  test("duplicate keys: only violations survive, multiplicity exact") {
    val df = Seq((1L, 1), (1L, 1), (1L, 1), (1L, 2), (2L, 1))
      .toDF("k1", "k2")
    val out = graft.operators.Reconcile.duplicateKeys(df, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 1) -> 3L))
  }

  test("profile diff: null growth, cardinality collapse, range shift flag") {
    val l = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("k", "v")
    val r = Seq((1L, Some("a")), (2L, None)).toDF("k", "v")
    val out = graft.operators.Reconcile.profileDiff(l, r, Seq("k", "v"))
      .collect().map(x => x.getString(0) -> x).toMap
    val v = out("v")
    assert(v.getAs[Long]("rows_delta") == -1L)
    assert(v.getAs[Long]("nulls_delta") == 0L)   // 1 null each side
    assert(v.getAs[Long]("distinct_delta") == -1L) // {a,b} -> {a}
    assert(!v.getAs[Boolean]("min_changed"))
    assert(v.getAs[Boolean]("max_changed"))      // b -> a
    val k = out("k")
    assert(k.getAs[Long]("rows_delta") == -1L)
    assert(k.getAs[Boolean]("max_changed"))      // 3 -> 2
  }

  test("trending: rank moves day-over-day, new entrants flagged") {
    def day(d: String, pairs: (Long, Int)*) =
      pairs.flatMap { case (u, n) => Seq.fill(n)((u, s"$d 10:00:00")) }
    val ev = (day("2024-01-01", 1L -> 3, 2L -> 2, 3L -> 1) ++
      day("2024-01-02", 2L -> 5, 1L -> 4))
      .toDF("user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .withColumn("event_type", lit("t"))
    val out = Analytics.trendingTopK(ev, 2).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getLong(1)) ->
        (r.getAs[Long]("rnk"), r.getAs[Long]("rank_change"),
          r.getAs[Boolean]("is_new"))).toMap
    assert(out.size == 4) // k=2 per day; user 3 never makes the board
    assert(out(("2024-01-01", 1L)) == (1L, 0L, true))
    assert(out(("2024-01-01", 2L)) == (2L, 0L, true))
    // day 2: B climbs to 1 (+1), A slips to 2 (-1)
    assert(out(("2024-01-02", 2L)) == (1L, 1L, false))
    assert(out(("2024-01-02", 1L)) == (2L, -1L, false))
  }

  test("session-2 operators tolerate empty inputs") {
    val emptyEvents = Seq.empty[(Long, Long, String, java.sql.Timestamp, Double)]
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    assert(graft.operators.Kpi.winsorizedDailyMean(emptyEvents).count() == 0)
    assert(Analytics.capacityForecast(emptyEvents).count() == 0)
    assert(Analytics.dowAdjustedAnomalies(emptyEvents).count() == 0)
    assert(Analytics.trendingTopK(emptyEvents, 5).count() == 0)
    assert(graft.operators.Rollups.counterDeltas(emptyEvents).count() == 0)
    assert(graft.operators.Layout.zoneMapAdvisor(
      emptyEvents, Seq("event_id"), "user_id", 4, Seq(1L), "x").count() == 0)
    val emptyTrans = Seq.empty[(String, String, Long)]
      .toDF("prev_type", "event_type", "n_transitions")
    assert(Graph.markovStationary(emptyTrans, 2).count() == 0)
    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(TextOps.readabilityBands(emptyDocs).count() == 0)
    assert(TextOps.encodingQa(emptyDocs).count() == 0)
    assert(TextOps.vocabJaccardSketch(emptyDocs, 8).count() == 0)
    assert(Dedup.tfCosinePairs(emptyDocs, 0.5, 10).count() == 0)
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val m = graft.ann.Ann.fitPq(emptyEmb, 2, 2)
    assert(m.isEmpty)
    assert(graft.ann.Ann.pqSearch(m, emptyEmb, emptyEmb, 3).count() == 0)
    val emptyOrders = Seq.empty[(Long, Long, java.sql.Date)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val emptyLi = Seq.empty[(Long, java.sql.Date)]
      .toDF("l_orderkey", "l_shipdate")
    assert(Analytics.intervalCoverage(emptyOrders, emptyLi).count() == 0)
  }

  test("hyperball: sketch reach tracks exact BFS reach within the " +
    "small-set envelope, monotone in rounds") {
    // path a -> b -> c -> d plus a -> c shortcut
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
      .toDF("src", "dst")
    def reach(rounds: Int) = Graph.neighborhoodSize(edges, rounds)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r1 = reach(1); val r2 = reach(2)
    // exact 1-hop (incl. self): a:3 {a,b,c}, b:2, c:2, d:1
    // exact 2-hop: a:4 {a,b,c,d}, b:3, c:2, d:1
    val exact1 = Map("a" -> 3.0, "b" -> 2.0, "c" -> 2.0, "d" -> 1.0)
    val exact2 = Map("a" -> 4.0, "b" -> 3.0, "c" -> 2.0, "d" -> 1.0)
    for ((n, x) <- exact1) assert(math.abs(r1(n) - x) < 0.05, s"r1 $n")
    for ((n, x) <- exact2) assert(math.abs(r2(n) - x) < 0.05, s"r2 $n")
    // reach never shrinks as rounds grow (register max-merge)
    for (n <- r1.keys) assert(r2(n) >= r1(n) - 1e-9)
    // bit-reproducible
    assert(reach(2) == r2)
  }

  test("hyperball: deep rounds propagate through the changed-only " +
    "register path; extra rounds past the diameter are a no-op") {
    // a path a -> b -> c -> d -> e: rounds >= 2 exercise the
    // systolic register loop (round 1 is the update-mode shortcut)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    def reach(rounds: Int, p: Int = 12) =
      Graph.neighborhoodSize(edges, rounds, p)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r3 = reach(3)
    val exact3 = Map("a" -> 4.0, "b" -> 4.0, "c" -> 3.0, "d" -> 2.0, "e" -> 1.0)
    for ((n, x) <- exact3) assert(math.abs(r3(n) - x) < 0.05, s"r3 $n")
    val r4 = reach(4)
    assert(math.abs(r4("a") - 5.0) < 0.05)
    // rounds beyond the diameter change nothing: the changed set
    // empties and the loop exits early with identical sketches
    assert(reach(9) == r4)
    // the adaptive floor precision stays exact on small sets (the
    // linear-counting regime) — the decade-probe code path
    val r3floor = reach(3, p = 8)
    for ((n, x) <- exact3) assert(math.abs(r3floor(n) - x) < 0.1, s"p8 $n")
  }

  test("adaptive HLL precision: requested at small graphs, budget-" +
    "bound past ~10^6 nodes, floored at p=8") {
    // small graph: budget never binds, requested p wins
    assert(Graph.adaptiveHllPrecision(1000L, 12) == 12)
    assert(Graph.adaptiveHllPrecision(0L, 10) == 10)
    // the 16M-node decade probe: 8 GB / 16M = 536 B/node -> p=9
    assert(Graph.adaptiveHllPrecision(16000000L, 12) == 9)
    // web-scale node counts hit the Boldi–Vigna floor, never below
    assert(Graph.adaptiveHllPrecision(10000000000L, 12) == 8)
    // requested below the derived width is honored (caller's cap)
    assert(Graph.adaptiveHllPrecision(1000L, 6) == 6)
  }

  test("interval overlap: grid cells dedup, exact overlap days, " +
    "keys isolate") {
    def d(x: String) = java.sql.Date.valueOf(x)
    val iv = Seq(
      ("k", 1L, d("2024-01-01"), d("2024-01-10")),
      ("k", 2L, d("2024-01-05"), d("2024-01-20")),  // overlaps 1 by 6d
      ("k", 3L, d("2024-02-01"), d("2024-02-02")),  // disjoint
      ("j", 4L, d("2024-01-01"), d("2024-01-10")))  // other key
      .toDF("key", "id", "s", "e")
    // bucketDays = 2: the pair (1,2) shares several grid cells — the
    // distinct must collapse them to ONE measured pair
    val out = Analytics.intervalOverlapPairs(iv, 2).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("total_overlap_days"))).toMap
    assert(out == Map("k" -> (1L, 6L)))
    // the sweep-line aggregate form must agree with the pair miner —
    // including the e == s single-day-touch edge the strict
    // inequality must classify as overlapping
    val touch = Seq(("t", 7L, d("2024-03-01"), d("2024-03-05")),
      ("t", 8L, d("2024-03-05"), d("2024-03-09"))).toDF("key", "id", "s", "e")
    // multi-year spans: two boundary events each in the sweep (the
    // old day-explosion form fanned a 3-year interval to ~1100 rows)
    // and still EXACT against the pair miner
    val wide = Seq(("w", 11L, d("2021-01-01"), d("2024-01-01")),
      ("w", 12L, d("2022-06-15"), d("2022-06-20")),   // nested, 6d
      ("w", 13L, d("2023-12-31"), d("2024-02-01")))   // tail, 2d
      .toDF("key", "id", "s", "e")
    for (frame <- Seq(iv, touch, wide, iv.unionByName(touch).unionByName(wide))) {
      val pairsAgg = Analytics.intervalOverlapPairs(frame, 2).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val sweep = Analytics.intervalOverlapStats(frame).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(sweep == pairsAgg, s"sweep disagreed: $sweep vs $pairsAgg")
    }
  }

  test("cdc apply: latest wins, deletes remove, inserts land, " +
    "untouched keys pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "u1", "U", 1), (1L, "u2", "U", 2),  // later U wins
      (2L, "x", "U", 1), (2L, "x", "D", 2),    // D beats earlier U
      (9L, "new", "I", 1))                      // insert
      .toDF("k", "v", "op", "change_seq")
    val out = graft.operators.Maintenance.applyCdc(base, changes, "k",
      Seq("change_seq")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "u2", 3L -> "c", 9L -> "new"))
    // idempotent for a fixed change set
    val again = graft.operators.Maintenance.applyCdc(base, changes, "k",
      Seq("change_seq")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("borda ensemble: rank sums resist the outlier a mean cannot") {
    // doc 1 wins chars by a huge margin but is last on words; doc 2
    // is consistently second — rank aggregation puts 2 first, while
    // a score average would be dragged to 1 by the outlier
    val df = Seq((1L, 1000000L, 1L), (2L, 90L, 80L), (3L, 100L, 70L))
      .toDF("doc_id", "chars", "words")
    val out = TextOps.bordaEnsemble(df, "doc_id",
      Seq(("c", col("chars"), true), ("w", col("words"), true)))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("borda"), r.getAs[Long]("final_rank"))).toMap
    // ranks: chars 1,3,2; words 3,1,2 → borda 4,4,4?? compute:
    // doc1: c1 + w3 = 4; doc2: c3 + w1 = 4; doc3: c2 + w2 = 4 —
    // all tie; tie-break by id: 1,2,3
    assert(out(1L) == (4L, 1L) && out(2L) == (4L, 2L) && out(3L) == (4L, 3L))
    // break the tie: doc 2 takes words AND is second on chars over 3
    val df2 = Seq((1L, 1000000L, 1L), (2L, 90L, 80L), (3L, 80L, 70L))
      .toDF("doc_id", "chars", "words")
    val out2 = TextOps.bordaEnsemble(df2, "doc_id",
      Seq(("c", col("chars"), true), ("w", col("words"), true)))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("final_rank")).toMap
    assert(out2 == Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("ab test: hand-computed two-proportion z, verdict at 95%") {
    val users = (Seq.fill(60)((0, 1L)) ++ Seq.fill(40)((0, 0L)) ++
      Seq.fill(40)((1, 1L)) ++ Seq.fill(60)((1, 0L)))
      .toDF("variant", "success")
    val r = Analytics.abTest(users).collect().head
    assert(r.getAs[Double]("p_a") == 0.6 && r.getAs[Double]("p_b") == 0.4)
    assert(r.getAs[Double]("p_pool") == 0.5)
    // z = 0.2 / sqrt(0.25 * 0.02) = 2.8284...
    assert(math.abs(r.getAs[Double]("z") - 0.2 / math.sqrt(0.005)) < 1e-12)
    assert(r.getAs[Boolean]("significant_95"))
  }

  test("burstiness: topical repetition ranks above spread, df screens") {
    val docs = Seq(
      (1L, "x x x filler"), (2L, "x x x other"),        // x: tf 6, df 2
      (3L, "y a"), (4L, "y b"), (5L, "y c"), (6L, "y d"), (7L, "y e"))
      .toDF("doc_id", "text")
    val out = TextOps.burstiness(docs, 2L, 10).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("df"),
        r.getAs[Long]("tf"), r.getAs[Double]("burstiness")))
    assert(out.head._1 == "x" && out.head._2 == (2L, 6L, 3.0))
    val y = out.find(_._1 == "y").get._2
    assert(y == (5L, 5L, 1.0))
    // df < 2 words (a..e, filler, other) are screened out
    assert(out.map(_._1).toSet == Set("x", "y"))
  }

  test("seasonal decomposition: a pure weekly pattern leaves zero residual") {
    // 21 days, 10/day with a +3 bump every Monday — every full 7-day
    // window holds exactly one Monday, so trend is flat 73/7 and the
    // dow component absorbs the bump exactly
    val days = (0 until 21).map(i =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val ev = days.flatMap { d =>
      val n = if (d.getDayOfWeek == java.time.DayOfWeek.MONDAY) 13 else 10
      Seq.fill(n)(("s", s"$d 10:00:00"))
    }
    val out = Analytics.seasonalDecompose(events(ev)).collect()
    assert(out.length == 15) // 21 days minus 3 edge days each side
    assert(out.forall(r => math.abs(r.getAs[Double]("residual")) < 1e-12))
    assert(out.forall(r =>
      math.abs(r.getAs[Double]("trend") - 73.0 / 7) < 1e-12))
    val mon = out.filter(_.getAs[Long]("n") == 13L)
    assert(mon.nonEmpty &&
      mon.forall(r => math.abs(r.getAs[Double]("seasonal") - 18.0 / 7) < 1e-12))
  }

  test("peak concurrency: same-day churn cannot fake a peak, " +
    "earliest peak day wins") {
    def d(x: String) = java.sql.Date.valueOf(x)
    val iv = Seq(
      // two overlapping intervals peak at 2 on Jan 3..5
      ("k", d("2024-01-01"), d("2024-01-05")),
      ("k", d("2024-01-03"), d("2024-01-08")),
      // one interval ENDS Jan 9 as another STARTS Jan 10 — without
      // the per-day delta collapse a (+1,-1) order could fake 2
      ("k", d("2024-01-10"), d("2024-01-11")),
      ("j", d("2024-02-01"), d("2024-02-01")))
      .toDF("key", "s", "e")
    val out = Analytics.peakConcurrency(iv).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("peak_active"),
          r.getAs[java.sql.Date]("first_peak_day").toString)).toMap
    assert(out("k") == (2L, "2024-01-03"))
    assert(out("j") == (1L, "2024-02-01"))
  }

  test("hhi: even split vs monopoly, exact rational shares") {
    val df = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "d"),
      ("g2", "x"), ("g2", "x"), ("g2", "x")).toDF("grp", "m")
    val out = Analytics.hhiConcentration(df, "grp", "m").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hhi")).toMap
    assert(out("g1") == 0.25) // 4 even members -> 1/4
    assert(out("g2") == 1.0)  // monopoly
  }

  test("retention half-life: first halving offset, -1 when it never halves") {
    // cohort Jan-1: 4 users day0; day1 3 (not half), day2 2 (half)
    // cohort Jan-5: 1 user who stays every day -> never halves
    val ev = (Seq(1L, 2L, 3L, 4L).map(u => (u, "2024-01-01")) ++
      Seq(1L, 2L, 3L).map(u => (u, "2024-01-02")) ++
      Seq(1L, 2L).map(u => (u, "2024-01-03")) ++
      Seq((9L, "2024-01-05"), (9L, "2024-01-06")))
      .toDF("user_id", "d")
      .withColumn("ts", col("d").cast("timestamp")).drop("d")
    val out = Analytics.retentionHalfLife(ev).collect()
      .map(r => r.getAs[java.sql.Date]("cohort_day").toString ->
        (r.getAs[Long]("cohort_size"), r.getAs[Long]("halflife_days"))).toMap
    assert(out("2024-01-01") == (4L, 2L))
    assert(out("2024-01-05") == (1L, -1L))
  }

  test("k-anonymity: singles and small groups price the risk") {
    // groups: (en,a) x3, (en,b) x1, (de,a) x1 — with k=3 the two
    // singletons are below k: 2 of 5 rows at risk
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"),
      ("de", "a")).toDF("lang", "source")
    val r = Analytics.kAnonymityReport(df, Seq("lang", "source"), 3L)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_singletons") == 2L)
    assert(r.getAs[Long]("n_rows_below_k") == 2L)
    assert(r.getAs[Long]("min_group") == 1L)
    assert(r.getAs[Double]("at_risk_rate") == 0.4)
  }

  test("pii report counts exactly what the redactor would touch") {
    val docs = Seq(
      (1L, "mail me at a.b@x.co and c@y.org", "s"),
      (2L, "server 10.0.0.1 and phone +1 (555) 123-4567", "s"),
      (3L, "nothing sensitive here", "s"))
      .toDF("doc_id", "text", "source")
    val r = TextOps.piiReport(docs).collect().head
    assert(r.getAs[Long]("emails") == 2L)
    assert(r.getAs[Long]("ips") == 1L)
    assert(r.getAs[Long]("numbers") == 1L)
    assert(r.getAs[Long]("n_flagged") == 2L)
    // the redactor scrubs every counted span — report/scrub parity
    val scrubbed = docs.select(TextOps.redactText(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(TextOps.piiReport(
      docs.select(col("doc_id"), col("source"),
        TextOps.redactText(col("text")).as("text")))
      .collect().head.getAs[Long]("n_flagged") == 0L)
    assert(scrubbed.exists(_.contains("<EMAIL>")))
  }

  test("rollup audit: direct and cascaded daily rollups agree exactly") {
    val ev = Seq(
      ("a", "2024-01-01 00:02:00", 1.25), ("a", "2024-01-01 13:07:00", 2.50),
      ("a", "2024-01-02 08:00:00", 0.75), ("b", "2024-01-01 23:59:00", 9.99))
      .toDF("event_type", "tss", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = graft.operators.Reconcile.rollupAudit(ev).collect()
    assert(out.length == 3) // (a, 2 days) + (b, 1 day)
    assert(out.forall(_.getAs[Boolean]("is_match")),
      "decimal cascade must re-aggregate exactly")
    val a1 = out.find(r => r.getString(1) == "a" &&
      r.getLong(0) == 1704067200L).get
    assert(a1.getAs[Long]("n_direct") == 2L)
    assert(a1.getAs[Double]("sum_direct") == 3.75)
  }

  test("next word: deterministic top-k continuations with probabilities") {
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = TextOps.nextWordTable(docs, 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rnk")) ->
        (r.getString(2), r.getAs[Long]("n_pairs"), r.getAs[Double]("prob")))
      .toMap
    assert(out(("a", 1L)) == ("b", 2L, 2.0 / 3))
    assert(out(("a", 2L)) == ("c", 1L, 1.0 / 3))
    assert(out(("b", 1L)) == ("a", 2L, 1.0))
  }

  test("bpe train: the classic hand example, greedy left-to-right merges") {
    // word frequencies: hug x10, pug x5, pun x12, bun x4, hugs x5
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .mkString(" ")
    val docs = Seq((1L, text, "s")).toDF("doc_id", "text", "source")
    val merges = TextOps.bpeTrain(docs, 3)
    // r1: (u,g) 20 > (p,u) 17 > (u,n) 16; r2: (u,n) 16; r3: (h,ug) 15
    assert(merges == Seq((1, "u", "g", 20L), (2, "u", "n", 16L),
      (3, "h", "ug", 15L)))
    val enc = TextOps.bpeEncode(
      Seq((1L, "hug pun hugs", "s")).toDF("doc_id", "text", "source"),
      merges).collect().head
    // hug -> 1 symbol, pun -> "p un" = 2, hugs -> "hug s" = 2
    assert(enc.getAs[Long]("n_words") == 3L)
    assert(enc.getAs[Long]("n_symbols") == 5L)
    assert(enc.getAs[Double]("fertility") == 5.0 / 3)
  }

  test("markov stationary: hand-computed mass, absorbing state keeps its own") {
    // a -> b, b -> a (1/2), b -> c (1/2), c absorbing; init = 100
    val trans = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L))
      .toDF("prev_type", "event_type", "n_transitions")
    // r1: a <- 100//2 = 50, b <- 100, c <- 50 + own 100 = 150
    // r2: a <- 100//2 = 50, b <- 50, c <- 50 + own 150 = 200
    val out = Graph.markovStationary(trans, 2, 100L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.view.mapValues(_._1).toMap ==
      Map("a" -> 50L, "b" -> 50L, "c" -> 200L))
    // exact divisions here: mass is conserved, shares sum to 1
    assert(out("c")._2 == 200.0 / 300.0)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("winsorized mean: the clip band bounds what an outlier can do") {
    val ev = Seq(0.0, 10.0, 10.0, 10.0, 100.0)
      .map(v => ("x", "2024-01-01 10:00:00", v))
      .toDF("event_type", "tss", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val r = graft.operators.Kpi.winsorizedDailyMean(ev).collect().head
    // p05 = 0 + 0.2*(10-0) = 2.0; p95 = 10 + 0.8*(100-10) ≈ 82 (the
    // 0.95*4 = 3.8 fraction is inexact in IEEE — DuckDB's
    // quantile_cont computes the identical value, which is the point)
    assert(r.getAs[Double]("lo_bound") == 2.0)
    assert(math.abs(r.getAs[Double]("hi_bound") - 82.0) < 1e-9)
    // raw cents 13000 / 500; clipped 200+3000+8200 = 11400 / 500
    assert(r.getAs[Double]("raw_avg") == 26.0)
    assert(r.getAs[Double]("winsorized_avg") == 22.8)
    assert(r.getAs[Long]("n_events") == 5L)
  }

  test("nearest as-of: closest side wins, backward breaks ties") {
    def df(rows: Seq[(Long, Long, String)], v: String) =
      rows.toDF("event_id", "user_id", "tss")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        .withColumn("value", lit(1.0))
    val left = df(Seq((100L, 1L, "2024-01-01 00:00:10"),
      (101L, 2L, "2024-01-01 00:00:10"),
      (102L, 3L, "2024-01-01 00:00:10")), "l")
    val right = df(Seq(
      (1L, 1L, "2024-01-01 00:00:04"), (2L, 1L, "2024-01-01 00:00:13"),
      (3L, 2L, "2024-01-01 00:00:07"), (4L, 2L, "2024-01-01 00:00:13"),
      (5L, 3L, "2024-01-01 00:00:10")), "r")
      .withColumnRenamed("event_id", "err_id")
    val out = graft.operators.AsOf.asofJoinNearest(
      left, right, "user_id", "ts", Seq("err_id"), "err_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("asof_err_id")).toMap
    // u1: back 6s vs fwd 3s -> forward; u2: 3s tie -> backward;
    // u3: same-ts right = distance 0 backward
    assert(out == Map(100L -> 2L, 101L -> 3L, 102L -> 5L))
  }

  test("skyline: dominance, same-price groups, duplicate frontier points") {
    val parts = Seq(
      (1L, "a", 10.0, 5), // frontier
      (2L, "b", 10.0, 3), // dominated within its price group
      (3L, "c", 20.0, 9), // frontier (bigger than every cheaper max)
      (4L, "d", 20.0, 9), // duplicate frontier point survives
      (5L, "e", 30.0, 9), // dominated: same size, higher price
      (6L, "f", 40.0, 2)) // dominated outright
      .toDF("p_partkey", "p_name", "p_retailprice", "p_size")
    val out = Analytics.skyline(parts).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 4L))
  }

  test("order backlog: sweep counts open orders, unshipped orders stay open") {
    val orders = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("o_orderkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
    val li = Seq((1L, "2024-01-02"), (1L, "2024-01-05"), (2L, "2024-01-04"))
      .toDF("l_orderkey", "sd")
      .withColumn("l_shipdate", col("sd").cast("timestamp")).drop("sd")
    val out = Analytics.orderBacklog(orders, li).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("net"), r.getAs[Long]("backlog"))).toMap
    // Jan1 +1; Jan2 +1; Jan3 +1 (order 3 never ships); Jan4 -1; Jan5 -1
    assert(out == Map("2024-01-01" -> (1L, 1L), "2024-01-02" -> (1L, 2L),
      "2024-01-03" -> (1L, 3L), "2024-01-04" -> (-1L, 2L),
      "2024-01-05" -> (-1L, 1L)))
  }

  test("decile transition: tiers from decimal sums, only two-period users") {
    val ev = Seq(
      // u1: big A, small B; u2: small A, big B; u3: A only (dropped)
      (1L, "purchase", 100.0, "2024-01-01 10:00:00"),
      (1L, "purchase", 1.0, "2024-01-20 10:00:00"),
      (2L, "purchase", 1.0, "2024-01-02 10:00:00"),
      (2L, "purchase", 100.0, "2024-01-21 10:00:00"),
      (3L, "purchase", 50.0, "2024-01-03 10:00:00"),
      (1L, "view", 999.0, "2024-01-22 10:00:00")) // non-purchase ignored
      .toDF("user_id", "event_type", "value", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.decileTransition(ev, "2024-01-16 00:00:00", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // u1: tier_a 1 (100 > 1), tier_b 2; u2: tier_a 2, tier_b 1
    assert(out == Map((1, 2) -> 1L, (2, 1) -> 1L))
  }

  test("threshold sweep counts are cumulative from one pair pass") {
    val docs = Seq(
      (0L, "a b c d e f"), (1L, "a b c d e f"),   // jaccard 1.0
      (2L, "a b c d e x"), (3L, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text")
    val out = Dedup.thresholdSweep(docs, 3, Seq(0.5, 0.9)).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // pair (0,1) jac 1.0 counts everywhere; (0,2)/(1,2) share 3 of 5
    // grams (0.6) count only at 0.5; (3,*) containment pairs fall
    // below 0.5
    assert(out(0.9) == 1L)
    assert(out(0.5) == 3L)
  }

  test("fertility: exact token sums per group, one final division") {
    val docs = Seq(
      (0L, "en", "s1", "hello world"),     // ws 2, bpe 2
      (1L, "en", "s1", "it's a 42-page doc"), // ws 4, bpe: it ' s a 4 2 - page doc = 9
      (2L, "fr", "s1", "oui"))             // ws 1, bpe 1
      .toDF("doc_id", "lang", "source", "text")
    val out = TextOps.fertilityReport(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpeish_tokens"),
          r.getAs[Double]("fertility"))).toMap
    assert(out(("en", "s1")) == (6L, 11L, 11.0 / 6))
    assert(out(("fr", "s1")) == (1L, 1L, 1.0))
  }

  test("cluster size histogram counts clusters, not members") {
    val comps = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "group_id")
    val out = Dedup.clusterSizeHistogram(comps).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("quantile bands interpolate exactly per (type, day)") {
    val ev = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      ("t", v, s"2024-01-01 0$i:00:00")
    }.toDF("event_type", "value", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val r = graft.operators.Kpi.dailyBands(ev).collect().head
    assert(r.getAs[Long]("n_events") == 4L)
    assert(r.getAs[Double]("p50") == 2.5)
    assert(r.getAs[Double]("p10") == 1.3)
    assert(r.getAs[Double]("p90") == 3.7)
    assert(r.getAs[Double]("min_value") == 1.0)
    assert(r.getAs[Double]("max_value") == 4.0)
  }

  test("new vs returning: first-seen day splits both events and users") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 10:00:00"),
      (2L, "2024-01-02 10:00:00"))
      .toDF("user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.newVsReturning(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("2024-01-01") == (2L, 0L, 1L, 0L))
    assert(out("2024-01-02") == (1L, 1L, 1L, 1L))
  }

  test("embedding norm stats flag zero vectors, order-independent stats") {
    val emb = Seq(
      (0L, Array(3.0f, 4.0f), 1),   // norm 5
      (1L, Array(0.0f, 0.0f), 1),   // zero vector
      (2L, Array(0.0f, 2.0f), 1))   // norm 2
      .toDF("vec_id", "embedding", "label")
    val r = graft.ann.Ann.normStats(emb).collect().head
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("min_norm") == 0.0)
    assert(r.getAs[Double]("p50_norm") == 2.0)
    assert(r.getAs[Double]("max_norm") == 5.0)
  }

  test("dataset card: one exact row including the duplicate count") {
    val docs = Seq(
      (0L, "a b c", "en", "s1"), (1L, "a b c", "en", "s2"),
      (2L, "d e", "fr", "s1"), (3L, "f", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextOps.datasetCard(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("total_words") == 9L)
    assert(r.getAs[Double]("p50_words") == 2.5)
    assert(r.getAs[Long]("n_dup_docs") == 2L)
    assert(r.getAs[Double]("dup_rate") == 0.5)
  }

  test("winnowing: a shared window+2-word run guarantees a shared " +
    "fingerprint; unrelated docs pair with nothing") {
    val run = "alpha beta gamma delta epsilon zeta" // exactly 6 = window+2
    val docs = Seq(
      (0L, s"one two three $run four five six seven"),
      (1L, s"red green blue $run yellow purple orange pink"),
      (2L, "cat dog bird fish horse cow sheep goat llama duck"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowedPairs(docs, 4, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((0L, 1L)),
      s"only the shared-run pair may appear: ${out.keySet}")
    assert(out((0L, 1L)) >= 1L)
  }

  test("vocab growth: grams land in their first doc's bucket, short docs none") {
    val docs = Seq(
      (0L, "a b c"),       // gram "a b c"
      (1L, "a b c d"),     // "a b c" already seen, "b c d" new
      (2L, "e f"),         // too short for a trigram
      (3L, "x y z"))       // new gram in bucket 1
      .toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, 3, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(0L -> (2L, 2L), 1L -> (1L, 3L)))
  }
}

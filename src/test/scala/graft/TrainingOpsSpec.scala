package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann
import graft.operators.Analytics
import graft.text.TextOps

/** Specs for the round-6 widening: semantic dedup (SemDeDup),
  * diversity sampling, split assignment, epoch shard shuffle,
  * novelty scoring, user features, dyadic decay score.
  */
class TrainingOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def embDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("semantic dedup flags within-cell near-dups, keeps lowest id, " +
    "and does NOT compare across cells") {
    // seeds (2 lowest ids) span the two axes; 10 duplicates 0, 11 is
    // close to 1, 12 sits between the axes below threshold, and 13 is
    // near 11 (cos ~0.96) but lands in the OTHER cell — blocking means
    // that pair is never compared
    val df = embDf(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      10L -> Seq(0.99f, 0.1f), 11L -> Seq(0.5f, 0.866f),
      12L -> Seq(1f, -1f), 13L -> Seq(0.72f, 0.69f)))
    val out = Ann.semanticDedup(df, Ann.fitIvf(df, 2), 0.8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> false, 1L -> false, 10L -> true,
      11L -> true, 12L -> false, 13L -> false))
  }

  test("diversity sample returns min(k, |cell|) per cell, deterministically") {
    // cell 0 (x-axis) gets 5 members, cell 1 (y-axis) exactly one
    val df = embDf(
      Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)) ++
        (10L to 13L).map(i => i -> Seq(1f, i.toFloat / 100f)))
    val model = Ann.fitIvf(df, 2)
    val out = Ann.sampleDiverse(df, model, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.count(_._1 == 0L) == 2)
    assert(out.count(_._1 == 1L) == 1)
    val again = Ann.sampleDiverse(df, model, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("split assignment is total, disjoint, and threshold-consistent") {
    val docs = (0L until 500L).toDF("doc_id")
    val out = TextOps.splitAssign(docs, "doc_id", 80, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    assert(out.forall { case (_, b, s) =>
      s == (if (b < 80) "train" else if (b < 90) "val" else "test")
    })
    val bySplit = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("shard shuffle: every doc once per epoch, contiguous positions, " +
    "different order per epoch") {
    val docs = (0L until 100L).toDF("doc_id")
    val out = TextOps.shuffleShards(docs, "doc_id", 2, 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // each epoch holds each doc exactly once
    for (e <- 0 to 1)
      assert(out.filter(_._1 == e).map(_._4).sorted.toSeq == (0L until 100L))
    // positions within each (epoch, shard) are 1..n with no gaps
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // the two epochs order the corpus differently (hash reseeded)
    def order(e: Int) = out.filter(_._1 == e)
      .sortBy(t => (t._2, t._3)).map(_._4).toSeq
    assert(order(0) != order(1))
  }

  test("novelty: shared grams score 0, unique grams score 1") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = TextOps.novelty(docs, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0 && out(3L) == 1.0)
  }

  test("user features: per-type counts, exact value sums, null " +
    "purchase_value without purchases") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "click", 1.25),
      (1L, "2024-01-01 11:00:00", "purchase", 10.50),
      (1L, "2024-01-03 09:00:00", "view", 0.10),
      (2L, "2024-01-02 08:00:00", "error", 5.00))
      .toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.userFeatures(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(u1.fieldIndex("n_events")) == 3L)
    assert(u1.getLong(u1.fieldIndex("n_active_days")) == 2L)
    assert(u1.getLong(u1.fieldIndex("n_click")) == 1L)
    assert(u1.getLong(u1.fieldIndex("n_purchase")) == 1L)
    assert(u1.getDouble(u1.fieldIndex("total_value")) == 11.85)
    assert(u1.getDouble(u1.fieldIndex("purchase_value")) == 10.50)
    assert(u1.getInt(u1.fieldIndex("days_span")) == 3)
    val u2 = out(2L)
    assert(u2.isNullAt(u2.fieldIndex("purchase_value")))
    assert(u2.getInt(u2.fieldIndex("days_span")) == 1)
  }

  test("cms: cascade merge is bit-identical to direct sketching and " +
    "estimates bound true counts") {
    import graft.functions.CmsFunctions._
    val rows = for (u <- 0L until 20L; r <- 0 until (u % 5 + 1).toInt)
      yield (u % 2, u % 3, u, r)
    val df = rows.toDF("g", "d", "u", "r")
    val direct = df.groupBy($"g").agg(cmsSketch($"u", 4, 512).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val cascade = df.groupBy($"g", $"d").agg(cmsSketch($"u", 4, 512).as("sk"))
      .groupBy($"g").agg(cmsMerge($"sk").as("sk"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(direct.keySet == cascade.keySet)
    direct.foreach { case (g, sk) =>
      assert(java.util.Arrays.equals(sk, cascade(g)), s"cascade differs for g=$g")
    }
    // point estimates: always >= exact; == exact at this width/keyset
    // (deterministic hashes, no cross-row collision at width 512)
    val all = df.groupBy(lit(1).as("one")).agg(cmsSketch($"u", 4, 512).as("sk"))
    val probes = df.select($"u").distinct()
    val est = all.crossJoin(probes)
      .select($"u", cmsEstimate($"sk", $"u").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy($"u").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (u, n) => assert(est(u) == n, s"u=$u est=${est(u)} exact=$n") }
  }

  test("cms SQL surface: sketch/merge/estimate registered") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, 7L), (1L, 7L), (2L, 7L), (2L, 8L)).toDF("b", "k")
      .createOrReplaceTempView("cms_in")
    val out = spark.sql(
      """SELECT cms_estimate(cms_merge(sk), 7L) AS est FROM
        | (SELECT b, cms_sketch(k, 4, 64) AS sk FROM cms_in GROUP BY b)""".stripMargin)
      .collect()
    assert(out.head.getLong(0) == 3L)
  }

  test("weak labels: majority wins, ties go lexicographic, abstain-all " +
    "is unlabeled with null confidence") {
    val docs = Seq(
      (1L, "both tech rules fire"), (2L, "tie between labels"),
      (3L, "nothing matches here"))
      .toDF("doc_id", "text")
    val out = TextOps.weakLabels(docs, Seq(
      (col("text").contains("tech"), "tech"),
      (col("text").contains("rules"), "tech"),
      (col("text").contains("tie"), "zebra"),
      (col("text").contains("tie"), "alpha")))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("label"),
          if (r.isNullAt(r.fieldIndex("confidence"))) -1.0
          else r.getDouble(r.fieldIndex("confidence")))).toMap
    assert(out(1L) == (("tech", 1.0)))       // 2 of 2 votes
    assert(out(2L) == (("alpha", 0.5)))      // 1-1 tie -> lex smallest
    assert(out(3L) == (("unlabeled", -1.0))) // all rules abstained
  }

  test("mad outliers: a planted spike flags, steady days do not, and " +
    "the spike cannot inflate the threshold") {
    // 9 steady days at 10 +/- 1 and one 100-event spike: median 10,
    // MAD 1, spike dev 90 > 3 * 1; steady devs <= 1 stay in-band
    val days = (1 to 9).map(i => (s"2024-01-0$i".take(10), 10L + (i % 3) - 1)) :+
      ("2024-01-10", 100L)
    val ev = days.flatMap { case (d, n) =>
      (0L until n).map(i => ("click", s"$d 00:00:00", i))
    }.toDF("event_type", "ts", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.madOutliers(ev, 3).collect()
      .map(r => r.getDate(1).toString ->
        (r.getLong(2), r.getBoolean(r.fieldIndex("is_outlier")))).toMap
    assert(out("2024-01-10") == ((100L, true)))
    assert(out.filter(_._1 != "2024-01-10").values.forall(!_._2))
  }

  test("period change: first week null, deltas and pct exact") {
    val ev = (Seq.fill(10)("2024-01-01 12:00:00") ++
      Seq.fill(15)("2024-01-08 12:00:00") ++
      Seq.fill(12)("2024-01-15 12:00:00"))
      .map(("view", _)).toDF("event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.periodChange(ev).orderBy("week_start").collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(out(0).fieldIndex("prev_n")))
    assert(out(1).getLong(out(1).fieldIndex("delta")) == 5L)
    assert(out(1).getDouble(out(1).fieldIndex("pct_change")) == 0.5)
    assert(out(2).getLong(out(2).fieldIndex("delta")) == -3L)
    assert(out(2).getDouble(out(2).fieldIndex("pct_change")) == -0.2)
  }

  test("bfs depth: hop distances from seeds, unreached nodes absent, " +
    "shortest depth wins") {
    // path 0-1-2-3-4 plus a shortcut seed at 3: node 2 is reachable
    // at depth 2 from seed 0 and depth 1 from seed 3 - BFS keeps 1
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("s1", "s2")
    val seeds = Seq(0L, 3L).toDF("node")
    val out = graft.operators.Graph.bfsDepth(edges, seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 3L -> 0, 1L -> 1, 2L -> 1, 4L -> 1))
    // rounds=1 from seed 0 only: node 2 unreached -> absent
    val short = graft.operators.Graph
      .bfsDepth(edges, Seq(0L).toDF("node"), 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(short == Map(0L -> 0, 1L -> 1))
  }

  test("bfs until done: chain graph reached to its true eccentricity, " +
    "early exit fires, disconnected node stays absent") {
    // chain 0-1-2-3-4-5 plus an island edge 10-11; seed {0}. True
    // eccentricity from 0 is 5, so the empty frontier arrives at
    // round 6 (round 6 finds nothing new) - far below maxRounds=64.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("s1", "s2")
    val (df, rounds) = graft.operators.Graph
      .bfsDepthUntilDoneCounted(edges, Seq(0L).toDF("node"), 64)
    val out = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5),
      s"complete BFS depths wrong: $out")
    assert(rounds == 6, s"early exit did not fire at the empty frontier: $rounds")
    // the runaway bound still caps a too-deep graph like bfsDepth would
    val capped = graft.operators.Graph
      .bfsDepthUntilDone(edges, Seq(0L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("embed drift: identical snapshots cos ~ 1, a shifted version " +
    "drifts below, counts reported per side") {
    val base = embDf(Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0.9f, 0.1f), 2L -> Seq(0.8f, 0.2f)))
      .withColumn("label", lit(7))
    val same = Ann.embedDrift(base, base, "label").collect().head
    assert(same.getDouble(same.fieldIndex("cos_sim")) > 0.9999999)
    assert(same.getLong(same.fieldIndex("n_base")) == 3L)
    val shifted = base.filter(col("vec_id") =!= 0L)
    val drift = Ann.embedDrift(base, shifted, "label").collect().head
    assert(drift.getLong(drift.fieldIndex("n_current")) == 2L)
    assert(drift.getDouble(drift.fieldIndex("cos_sim")) <
      same.getDouble(same.fieldIndex("cos_sim")))
  }

  test("mixture temperature: alpha=0.5 flattens the head, fixed-point " +
    "weights normalize exactly") {
    // sources with 100 and 10k tokens: plain proportional sampling
    // gives the big source 100x the mass; sqrt gives it only 10x
    val docs = (
      (1 to 4).map(i => (i.toLong, "small", Seq.fill(25)("w").mkString(" "))) ++
        (5 to 8).map(i => (i.toLong, "big", Seq.fill(2500)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val out = TextOps.mixtureTemperature(docs, 10000L).collect()
      .map(r => r.getString(0) -> r).toMap
    val small = out("small"); val big = out("big")
    assert(small.getLong(small.fieldIndex("avail_tokens")) == 100L)
    assert(big.getLong(big.fieldIndex("avail_tokens")) == 10000L)
    // w = floor(sqrt(tokens)*1000): 10_000 and 100_000 -> ratio 10, not 100
    assert(small.getLong(small.fieldIndex("w")) == 10000L)
    assert(big.getLong(big.fieldIndex("w")) == 100000L)
    val pSmall = small.getDouble(small.fieldIndex("p"))
    assert(pSmall == 10000.0 / 110000.0)
    assert(big.getDouble(big.fieldIndex("upsample")) <
      small.getDouble(small.fieldIndex("upsample")))
  }

  test("hard negatives exclude same-label vectors and rank by cosine") {
    val df = Seq(
      (0L, 1, Seq(1f, 0f)),          // query, label 1
      (1L, 1, Seq(0.999f, 0.01f)),   // same label: excluded however close
      (2L, 2, Seq(0.9f, 0.1f)),      // different label, closest negative
      (3L, 2, Seq(0f, 1f)),          // different label, orthogonal
      (4L, 3, Seq(0.5f, 0.5f)))      // different label, middle
      .toDF("vec_id", "label", "embedding")
    val out = Ann.hardNegatives(df, df.filter(col("vec_id") === 0), 10)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(r.fieldIndex("neighbor_id")),
        r.getInt(r.fieldIndex("rnk").toInt)))
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 3L))
  }

  test("bpe pairs: counts adjacent char pairs, deterministic tie order") {
    val docs = Seq((1L, "abab ab x")).toDF("doc_id", "text")
    // "abab" -> ab, ba, ab; "ab" -> ab; "x" dropped (length 1)
    val out = TextOps.bpePairs(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("ab", 3L), ("ba", 1L)))
  }

  test("feature corr: exact moments, correct sign, repeatable to the bit") {
    // words/chars per doc: (2,5), (3,11), (2,3) — positively related
    val base = Seq(
      (1L, "s", "aa bb"), (2L, "s", "aaa bbb ccc"), (3L, "s", "a b"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.featureCorr(base).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getLong(row.fieldIndex("n")) == 3L)
    assert(row.getLong(row.fieldIndex("sx")) == 7L)   // 2+3+2
    assert(row.getLong(row.fieldIndex("sy")) == 19L)  // 5+11+3
    assert(row.getLong(row.fieldIndex("sxy")) == 49L) // 10+33+6
    val r = row.getDouble(row.fieldIndex("r"))
    assert(r > 0.9 && r <= 1.0)
    val again = TextOps.featureCorr(base).collect()
    assert(r == again.head.getDouble(again.head.fieldIndex("r")))
  }

  test("decay score: dyadic half-life weights are exact") {
    // anchor day = 2024-01-15; same-day events weigh 1, one half-life
    // (7 days) back weighs 0.5, two back weigh 0.25
    val ev = Seq(
      (1L, "2024-01-15 10:00:00"), (1L, "2024-01-15 11:00:00"),
      (1L, "2024-01-08 10:00:00"),
      (2L, "2024-01-01 10:00:00"))
      .toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Analytics.decayScore(ev, 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("decay_score"))).toMap
    assert(out(1L) == 2.5)
    assert(out(2L) == 0.25)
  }

  test("vec_moments kernel: exact hand values, partition-order-proof") {
    import graft.functions.MomentsFunctions.vecMoments
    val df = Seq(Seq(1, 2), Seq(3, 4)).toDF("qvec")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val m = d.agg(vecMoments(col("qvec")).as("m")).select("m.*").collect().head
      (m.getLong(0), m.getSeq[Long](1),
        m.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getInt(0), p.getInt(1)) -> p.getLong(2)).toMap)
    }
    val (n, s, sxy) = run(df)
    assert(n == 2L && s == Seq(4L, 6L))
    // (1,1): 1+9, (1,2): 2+12, (2,2): 4+16
    assert(sxy == Map((1, 1) -> 10L, (1, 2) -> 14L, (2, 2) -> 20L))
    assert(run(df.repartition(7)) == ((n, s, sxy)))
  }

  test("embedCovariance matches a naive driver-side computation") {
    val vecs = Seq(
      Seq(1f, 0f, 2f), Seq(0f, 1f, 2f), Seq(2f, 2f, 0f), Seq(1f, 1f, 1f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    // replay the quantization: round-half-up to int8 range
    val q = vecs.map { v =>
      val m = v.map(math.abs).max
      v.map(x => math.floor(x * 127.0 / m + 0.5).toLong)
    }
    val nL = q.length.toLong
    val out = Ann.embedCovariance(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    for (i <- 1 to 3; j <- i to 3) {
      val si = q.map(_(i - 1)).sum
      val sj = q.map(_(j - 1)).sum
      val sxy = q.map(v => v(i - 1) * v(j - 1)).sum
      val cov = (nL * sxy - si * sj).toDouble / (nL.toDouble * nL)
      assert(out((i, j)) == ((si, sj, sxy, cov)), s"pair ($i,$j)")
    }
  }

  test("pq: seed codebooks are vector slices, ADC is exact on codeword-" +
    "aligned corpora, ordering matches true distance") {
    // 4 dims, m=2 subspaces of 2; k=2 codewords seeded from vecs 0,1
    val corpus = embDf(Seq(
      0L -> Seq(1f, 0f, 0f, 1f), 1L -> Seq(0f, 1f, 1f, 0f)))
    val model = Ann.fitPq(corpus, m = 2, k = 2)
    assert(model.subDim == 2)
    assert(model.codebooks == Seq(
      Seq(Seq(1f, 0f), Seq(0f, 1f)), Seq(Seq(0f, 1f), Seq(1f, 0f))))
    // each corpus vector IS its codeword → codes (0,0) and (1,1), and
    // ADC distance equals the true squared L2 to that vector
    val codes = Ann.pqEncode(corpus, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes == Map(0L -> Seq(0, 0), 1L -> Seq(1, 1)))
    val q = embDf(Seq(7L -> Seq(1f, 0f, 0.5f, 0.5f)))
    val out = Ann.pqSearch(model, Ann.pqEncode(corpus, model), q, 2)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    // true L2²(q, v0) = 0.25+0.25 = 0.5; L2²(q, v1) = 1+1+0.5 = 2.5
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    assert(math.abs(out(0)._2 - 0.5) < 1e-6)
    assert(math.abs(out(1)._2 - 2.5) < 1e-6)
  }

  test("pq: Lloyd rounds converge subspace codewords to cluster means " +
    "and top-k recalls the query's cluster") {
    // two 1-D clusters {0, 1} and {10, 11}; m=1 so the subspace IS the
    // vector — after 3 rounds the codewords are the cluster means
    val corpus = embDf(Seq(
      0L -> Seq(0f), 1L -> Seq(1f), 2L -> Seq(10f), 3L -> Seq(11f)))
    val model = Ann.fitPq(corpus, m = 1, k = 2, iters = 3)
    assert(model.codebooks.head.map(_.head).sorted == Seq(0.5f, 10.5f))
    // a query at 10.2 retrieves the high cluster first — both its
    // members quantize to 10.5, so the tie breaks by neighbor id
    val q = embDf(Seq(9L -> Seq(10.2f)))
    val out = Ann.pqSearch(model, Ann.pqEncode(corpus, model), q, 2)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(2L, 3L))
  }

  test("random projection: exact sign formula, full output, deterministic") {
    val df = Seq((0L, Seq(127f, -127f))).toDF("vec_id", "embedding")
    // quantizes to (127, -127); sign(j,k) from the fixed hash
    def sign(j: Long, k: Long): Long =
      if (((j * 73856093L + k * 19349663L) % 97) % 2 == 0) 1L else -1L
    val out = Ann.randomProjection(df, 16).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out.keySet == (1 to 16).toSet)
    for (k <- 1 to 16)
      assert(out(k) == 127L * sign(1, k) - 127L * sign(2, k), s"k=$k")
    val again = Ann.randomProjection(df, 16).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out == again)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann
import graft.functions.FreqFunctions
import graft.operators.{BloomJoin, Layout, Scd}
import graft.text.Search

/** Specs for the round-4 widening: SCD2 intervals, BM25 search,
  * embedding centroids, heavy hitters, z-order layout, bloom
  * semi-join.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("scd2 collapses runs into versioned intervals") {
    val df = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L), (2L, "X", 15L, 5L))
      .toDF("user_id", "attr", "ts", "event_id")
    val out = Scd.scd2(df, "user_id", "attr", "ts", "event_id")
      .orderBy("user_id", "version")
      .select("user_id", "version", "attr", "valid_from", "valid_to",
        "n_rows", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, "A", 10L, 30L, 2L, 0),
      (1L, 2L, "B", 30L, 40L, 1L, 0),
      (1L, 3L, "A", 40L, -1L, 1L, 1),
      (2L, 1L, "X", 15L, -1L, 1L, 1)))
  }

  test("bm25 ranks multi-hit docs first and drops no-hit docs") {
    val docs = Seq(
      (1L, "spark spark join x"), (2L, "spark y z w"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = Search.bm25(docs, Seq("spark", "join"), 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(_.getDouble(1) > 0))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("keep-best dedup: survivor has max priority, then min doc_id") {
    // same text from sources of priorities 1 ("p"), 2 ("pp"), 2 ("qq"):
    // survivor must be the LOWEST doc_id among priority-2 copies
    val docs = Seq(
      (1L, "p", "same text"), (5L, "qq", "same text"), (3L, "pp", "same text"),
      (7L, "p", "solo"))
      .toDF("doc_id", "source", "text")
    val out = graft.dedup.Dedup.keepBest(docs, length(col("source")) % 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq((3L, "pp", 3L, 3L), (7L, "p", 1L, 1L)))
  }

  test("dup-rate profile: rate is 1 - unique/docs per source") {
    val docs = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), (4L, "b", "z"))
      .toDF("doc_id", "source", "text")
    val out = graft.dedup.Dedup.dupRateBySource(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq(("a", 3L, 2L, 1.0 - 2.0 / 3.0), ("b", 1L, 1L, 0.0)))
  }

  test("inverted index: df counts distinct docs, postings cap at lowest ids") {
    val docs = Seq(
      (3L, "b a"), (1L, "a a b"), (2L, "a c"), (4L, "a"))
      .toDF("doc_id", "text")
    val out = graft.text.Search.invertedIndex(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // 'a' in all 4 docs (df=4, repeated token counted once), head = 1,2;
    // 'b' in docs 1,3; 'c' only in doc 2
    assert(out == Seq(("a", 4L, 1L), ("a", 4L, 2L),
      ("b", 2L, 1L), ("b", 2L, 3L), ("c", 1L, 2L)))
  }

  test("length buckets: edge-exact binning and padding efficiency") {
    val docs = Seq(
      (1L, "w w w"), (2L, "w w w w"), (3L, "w w w w w"))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.lengthBuckets(docs, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    // 3 and 4 tokens land in the 4-bucket (4 is edge-exact, not pushed up);
    // 5 tokens in the 8-bucket
    assert(out == Seq(
      (4L, 2L, 7L, 8L, 7.0 / 8.0),
      (8L, 1L, 5L, 8L, 5.0 / 8.0)))
  }

  test("mixture plan: weights normalize, budget clamps at availability") {
    // sources: "s" (len 1 -> w=2), "ss" (len 2 -> w=3); total_w=5
    val docs = Seq(
      (1L, "s", "w w w w w w w w w w"),   // 10 tokens available
      (2L, "ss", "w w")                    //  2 tokens available
    ).toDF("doc_id", "source", "text")
    val out = graft.text.TextOps.mixturePlan(docs, 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).sortBy(_._1).toSeq
    // s: target floor(2/5*10)=4 of 10 -> rate 0.4, epochs 0.4
    // ss: target floor(3/5*10)=6 of 2 -> planned clamps to 2, epochs 3.0
    assert(out == Seq(
      ("s", 10L, 2L, 4L, 4L, 0.4, 0.4),
      ("ss", 2L, 3L, 6L, 2L, 1.0, 3.0)))
  }

  test("heavy hitters with capacity >= vocabulary is exact") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val exact = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = words
      .agg(FreqFunctions.heavyHitters(col("w"), 10000).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("heavy hitters at tiny capacity keeps the >n/k guarantee") {
    // 60 "hot" + 40 distinct cold items, interleaved, 4 partitions
    val items = (0 until 100).map(i => if (i % 5 < 3) "hot" else s"c$i")
    val df = items.toDF("w").repartition(4)
    val got = df.agg(FreqFunctions.heavyHitters(col("w"), 4).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= 4)
    // freq(hot)=60 > n/capacity=25 → guaranteed present, never overcounted
    assert(got.contains("hot"))
    assert(got("hot") <= 60L && got("hot") >= 60L - 25L)
    assert(got.forall { case (_, c) => c > 0 })
  }

  test("group centroids are element-wise means") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 1), (2L, Seq(3.0f, 4.0f), 1),
      (3L, Seq(0.5f, 0.5f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.groupCentroids(emb, "label").orderBy("label", "pos")
      .select("label", "pos", "n_vectors", "mean_v").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, 0, 2L, 2.0), (1, 1, 2L, 3.0), (2, 0, 1L, 0.5), (2, 1, 1L, 0.5)))
  }

  test("zorder key interleaves bits") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("a", "b")
    val z = df.select(Layout.zorderKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // spread(3)=0b101, spread(5)=0b10001 → 0b101 | 0b100010 = 39
    assert(z.toSeq == Seq(0L, 1L, 2L, 39L))
  }

  test("layoutForScan writes disjoint key ranges per file") {
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", Layout.zorderKey(col("x"), col("y")))
    val clustered = Layout.layoutForScan(df, col("z"), 8)
    assert(clustered.queryExecution.toString.toLowerCase
      .contains("rangepartitioning"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    clustered.write.mode("overwrite").parquet(tmp)
    val ranges = spark.read.parquet(tmp)
      .select(input_file_name().as("f"), col("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 8)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(lo > hi, "file ranges overlap")
      case _ => ()
    }
  }

  test("funnel counts ordered progressions only") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val ev = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      (2L, "click", ts(5)), (2L, "view", ts(10)), (2L, "click", ts(20)),
      (3L, "purchase", ts(5)), (3L, "view", ts(10)),
      (4L, "error", ts(10)))
      .toDF("user_id", "event_type", "ts")
    val out = graft.operators.Analytics
      .funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // u1 completes all 3; u2's click re-qualifies after its view; u3's
    // purchase precedes its view and must not count; u4 never enters
    assert(out == Map(3 -> 1L, 2 -> 1L, 1 -> 1L, 0 -> 1L))
  }

  test("cohort retention counts distinct users per (cohort, offset)") {
    import java.sql.Timestamp
    def day(d: Int) = new Timestamp(d * 86400L * 1000)
    val ev = Seq(
      (1L, day(0)), (1L, day(2)), (1L, day(2)),
      (2L, day(0)), (3L, day(1)))
      .toDF("user_id", "ts")
    val out = graft.operators.Analytics.cohortRetention(ev)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("1970-01-01", 0) -> 2L, ("1970-01-01", 2) -> 1L,
      ("1970-01-02", 0) -> 1L))
  }

  test("repeated grams finds cross-document boilerplate, deduped per doc") {
    val docs = Seq(
      (1L, "start a b c d e f end"),
      (2L, "other a b c d e f tail a b c d e f"), // gram twice in one doc → df 1
      (3L, "nothing shared here at all today ok"))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.repeatedGrams(docs, 6, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a b c d e f" -> 2L))
  }

  test("hll cascade: merged per-part sketches equal the direct sketch") {
    import graft.functions.HllFunctions._
    val vals = (0L until 5000L).map(v => (v % 7, v)).toDF("part", "v")
    val direct = vals.agg(hllSketch(col("v"), 12).as("s"))
      .select(hllEstimate(col("s"))).head.getDouble(0)
    val cascaded = vals.groupBy(col("part")).agg(hllSketch(col("v"), 12).as("s"))
      .agg(hllMerge(col("s")).as("m"))
      .select(hllEstimate(col("m"))).head.getDouble(0)
    // register-max is exact under any partition of the input: the
    // cascade must reproduce the direct sketch to the bit
    assert(cascaded == direct)
  }

  test("hll estimate lands within the p=12 error envelope") {
    import graft.functions.HllFunctions._
    val est = (0L until 10000L).toDF("v")
      .agg(hllSketch(col("v"), 12).as("s"))
      .select(hllEstimate(col("s"))).head.getDouble(0)
    // std error 1.04/sqrt(4096) ≈ 1.6%; assert 5% (3 sigma)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05, s"estimate $est")
    // tiny cardinality rides the linear-counting correction
    val small = (0L until 100L).toDF("v")
      .agg(hllSketch(col("v"), 12).as("s"))
      .select(hllEstimate(col("s"))).head.getDouble(0)
    assert(math.abs(small - 100.0) <= 3.0, s"small-range estimate $small")
  }

  test("hll functions work through the SQL registry") {
    graft.functions.GraftFunctions.register(spark)
    (0L until 1000L).map(v => (v % 4, v)).toDF("part", "v")
      .createOrReplaceTempView("hll_in")
    val est = spark.sql(
      """SELECT hll_estimate(hll_merge(s)) FROM
        | (SELECT part, hll_sketch(v, 12) AS s FROM hll_in GROUP BY part)""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.05)
  }

  test("sorted-neighborhood pairs finds word-set near-dups without hashing") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"), // 4/6 shared distinct words
      (3L, "omega psi chi phi upsilon"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.sortedNeighborPairs(docs, 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
  }

  test("rarity-weighted pairs rank rare-word overlap above common-word overlap") {
    // docs 1,2 share a RARE word; docs 3,4 share only the ubiquitous
    // filler that every doc carries — plain Jaccard scores the two
    // pairs equally, the weighting must not
    val docs = Seq(
      (1L, "filler quetzal"), (2L, "filler quetzal"),
      (3L, "filler aardvark"), (4L, "filler zebra"),
      (5L, "filler qq"), (6L, "filler zz"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.rarityWeightedPairs(docs, 0.0, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // shared rare word (weight 3) + shared filler (weight 1): sim = 4/4
    assert(out((1L, 2L)) == 1.0)
    // only filler (weight 1) shared; each total = 1 + 6 (unique word)
    assert(out((3L, 4L)) == 1.0 / 13.0)
    assert(out((1L, 2L)) > out((3L, 4L)))
  }

  test("canonical dedup collapses case/punct/whitespace variants") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world"))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.canonicalDedup(docs)
      .collect().map(r => r.getString(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    assert(out == Map(
      "hello world" -> ((1L, 3L)),
      "goodbye world" -> ((4L, 1L))))
  }

  test("bigram fluency scores the common-bigram hit rate") {
    val docs = Seq(
      (1L, "the cat sat"), // bigrams: "the cat", "cat sat"
      (2L, "the cat ran"), // "the cat", "cat ran"
      (3L, "zq xj"), //        "zq xj" — never repeats
      (4L, "solo")) //          no bigrams → dropped
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.bigramFluency(docs, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // only "the cat" reaches df 2; docs 1 and 2 each hit it once
    assert(out == Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((1L, 0L))))
  }

  test("passage dedup cuts corpus-hot passages and rewrites in order") {
    val boiler = "x y z"
    val docs = Seq(
      (1L, s"$boiler a b c"),
      (2L, s"d e f $boiler"),
      (3L, s"g h i $boiler"),
      (4L, boiler)) // doc that is ONLY boilerplate → empty rewrite
      .toDF("doc_id", "text")
    // "x y z" occurs 4 > 3 times; all other 3-word passages are unique
    val out = graft.text.TextOps.passageDedup(docs, 3, 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, "a b c")),
      2L -> ((2L, 1L, "d e f")),
      3L -> ((2L, 1L, "g h i")),
      4L -> ((1L, 1L, ""))))
  }

  test("upsert replaces matched keys and keeps the rest") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val inc = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val out = graft.operators.Maintenance.upsert(base, inc, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "C"))
  }

  test("anomalous days flags deviation from the per-type daily median") {
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400L * 1000)
    // type X: counts 10,10,10,20 per day → median 10, day 3 is +100%
    val rows = (0 until 3).flatMap(d => Seq.fill(10)(("X", ts(d)))) ++
      Seq.fill(20)(("X", ts(3))) ++
      (0 until 4).flatMap(d => Seq.fill(10)(("Y", ts(d))))
    val ev = rows.toDF("event_type", "ts")
    val out = graft.operators.Analytics.anomalousDays(ev, 5, 4)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(out.toSeq == Seq(("X", "1970-01-04", 20L)))
  }

  test("anomalous days surfaces a total-outage day as n_events=0") {
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(day * 86400L * 1000)
    // type X emits 10/day on days 0,1,2,4 and NOTHING on day 3: the
    // raw daily aggregate has no row for (X, day3), but the densified
    // grid must flag it as the worst possible anomaly (count=0)
    val rows = Seq(0, 1, 2, 4).flatMap(d => Seq.fill(10)(("X", ts(d))))
    val ev = rows.toDF("event_type", "ts")
    val out = graft.operators.Analytics.anomalousDays(ev, 5, 4)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(out.toSeq == Seq(("X", "1970-01-04", 0L)))
  }

  test("curate gates language, quality, dedups, and redacts in one plan") {
    val longText = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, longText + " contact me@example.com ok", "en", "s1"),
      (2L, longText + " contact me@example.com ok", "en", "s2"), // exact dup of 1
      (3L, "too short", "en", "s1"),                             // fails minWords
      (4L, (Seq.fill(30)("same")).mkString(" "), "en", "s1"),    // dup-word ratio 0.97
      (5L, longText, "zh", "s1"))                                // wrong lang
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.text.Curate.curate(docs, Seq("en", "es"), 25, 0.6)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getAs[String]("text").contains("<EMAIL>"))
  }

  test("salted join equals the plain equi-join, even on one constant hot key") {
    val hot = Seq.fill(500)((42L, "x")).toDF("k", "payload").repartition(4)
    val dim = Seq((42L, "d42"), (7L, "d7")).toDF("k", "d")
    val got = graft.operators.Skew.saltedJoin(hot, dim, "k", 8)
    val want = hot.join(dim, "k")
    assert(got.count() == 500)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("round-4 operators tolerate empty inputs") {
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(Search.bm25(emptyDocs, Seq("x"), 5).count() == 0)
    assert(graft.text.Curate.curate(emptyDocs, Seq("en"), 10, 0.5).count() == 0)
    assert(graft.text.TextOps.repeatedGrams(emptyDocs, 3, 2).count() == 0)
    assert(emptyDocs
      .groupBy("source")
      .agg(FreqFunctions.heavyHitters(col("text"), 4).as("hh"))
      .count() == 0)
    val emptyEvents = Seq.empty[(Long, String, java.sql.Timestamp, Long)]
      .toDF("user_id", "event_type", "ts", "event_id")
    assert(Scd.scd2(emptyEvents, "user_id", "event_type", "ts", "event_id").count() == 0)
    assert(graft.operators.Analytics.funnel(emptyEvents, Seq("a", "b")).count() == 0)
    assert(graft.operators.Analytics.cohortRetention(emptyEvents).count() == 0)
    assert(graft.operators.Analytics.anomalousDays(emptyEvents).count() == 0)
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Ann.groupCentroids(emptyEmb, "label").count() == 0)
  }

  test("incremental dedup screens a delivery batch against the corpus") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((1L, base), (2L, "totally different words here entirely"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base),                                    // exact dup of 1
      (11L, base.replace("kappa", "lambda")),         // near dup of 1
      (12L, "fresh new content nothing shared at all"))
      .toDF("doc_id", "text")
    val fresh = graft.dedup.Dedup.incrementalExactNew(corpus, incoming)
      .collect().map(_.getLong(0)).toSet
    assert(fresh == Set(10L, 11L, 12L) - 10L) // only the exact dup screens out
    val near = graft.dedup.Dedup
      .incrementalMinhashDups(corpus, incoming, 3, 0.5, 128, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((10L, 1L)), "exact dup must collide")
    assert(near.contains((11L, 1L)), "near dup must collide")
    assert(!near.exists(_._1 == 12L), "fresh doc must not collide")
  }

  test("typed datasets round-trip the driver tables") {
    val docs = Typed.documents(spark, sf)
    assert(docs.count() == Tables.documents(spark, sf).count())
    // typed access compiles and behaves; column filter still pushes down
    assert(docs.filter(_.lang == "en").count() ==
      Tables.documents(spark, sf).filter(col("lang") === "en").count())
    assert(Typed.events(spark, sf).head().event_id >= 0)
    assert(Typed.embeddings(spark, sf).head().embedding.length == 64)
  }

  test("bloom semi-join equals the exact semi-join") {
    val li = Tables.lineitem(spark, sf)
    val ord = Tables.orders(spark, sf).filter(col("o_totalprice") > 150000.0)
    val got = BloomJoin.bloomSemiJoin(li, "l_orderkey", ord, "o_orderkey", 100000L)
    val want = li.join(ord.select("o_orderkey").distinct(),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("bloom semi-join works when both sides share the key name") {
    val large = (1L to 100L).map(k => (k, s"p$k")).toDF("k", "payload")
    val small = Seq(3L, 7L, 42L).toDF("k")
    val got = BloomJoin.bloomSemiJoin(large, "k", small, "k", 100L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 7L, 42L))
  }

  test("bloom build on an empty or all-null build side filters everything") {
    // bloom_filter_agg yields NULL at zero cardinality (the sf100
    // q_triangles NPE); buildBloom must return a valid empty bloom
    // that rejects every probe instead
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("k", LongType))))
    val probe = Seq(1L, 2L, 3L).toDF("k")
    for (build <- Seq(empty, Seq[Option[Long]](None, None).toDF("k"))) {
      val bloom = BloomJoin.buildBloom(build, "k", 1000L, 0.02)
      assert(probe.filter(
        BloomJoin.mightContain(bloom, col("k"))).count() == 0)
      assert(BloomJoin.bloomSemiJoin(probe, "k", build, "k", 1000L).count() == 0)
    }
  }

  test("bloom keeps its fpp past the runtime-filter numBits cap") {
    // 10M expected items needs ~81 Mbit at fpp 0.02 — past the 64 Mbit
    // default cap that silently degrades stat.bloomFilter; buildBloom
    // raises the cap for its build job, so a disjoint probe set must
    // still miss at ~the requested rate (allow 4x headroom)
    val build = spark.range(0, 200000).select((col("id") * 2).as("k"))
    val bloom = BloomJoin.buildBloom(build, "k", 10000000L, 0.02)
    val probes = 100000L
    val hits = spark.range(0, probes).select((col("id") * 2 + 1).as("k"))
      .filter(BloomJoin.mightContain(bloom, col("k"))).count()
    assert(hits < probes * 0.08, s"fp rate ${hits.toDouble / probes}")
  }
}

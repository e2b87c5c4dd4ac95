package graft

import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Randomized properties for the native kernels, checked against
  * straightforward reference implementations (seeded generators —
  * deterministic across runs).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(r.passed, r.status.toString)
  }

  private val scoreGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1.0, 1.0), Gen.const(Double.NaN),
    Gen.const(0.0), Gen.const(-0.0), Gen.const(1.0))

  test("TopKBuffer equals sort-take-k under Double.compare ordering (incl NaN, ties)") {
    val rows = Gen.listOf(Gen.zip(scoreGen, Gen.choose(0L, 20L)))
    holds(Prop.forAll(rows, Gen.choose(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, t) => buf.add(s, t) }
      val got = buf.sorted.map(i => (buf.scores(i), buf.ties(i))).toSeq
      val expect = xs.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      }.take(k)
      // compare via bit patterns so NaN == NaN
      got.map { case (s, t) => (java.lang.Double.doubleToLongBits(s), t) } ==
        expect.map { case (s, t) => (java.lang.Double.doubleToLongBits(s), t) }
    })
  }

  test("TopKByScore buffers survive serialize/deserialize and merge like a union") {
    val agg = functions.TopKByScore(Literal(0.0), Literal(0L), 5)
    val rows = Gen.listOf(Gen.zip(scoreGen, Gen.choose(0L, 50L)))
    holds(Prop.forAll(rows, rows) { (xs, ys) =>
      def fill(zs: Seq[(Double, Long)]) = {
        val b = new TopKBuffer(5); zs.foreach { case (s, t) => b.add(s, t) }; b
      }
      val merged = agg.merge(agg.deserialize(agg.serialize(fill(xs))), fill(ys))
      val direct = fill(xs ++ ys)
      merged.sorted.map(i => (java.lang.Double.doubleToLongBits(merged.scores(i)), merged.ties(i))).toSeq ==
        direct.sorted.map(i => (java.lang.Double.doubleToLongBits(direct.scores(i)), direct.ties(i))).toSeq
    })
  }

  test("PairCombos equals the naive nested loop") {
    val ids = Gen.listOf(Gen.choose(0L, 1000L)).map(_.distinct.sorted)
    holds(Prop.forAll(ids) { xs =>
      val out = PairCombos(Literal.create(xs,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      val expect = for { i <- xs.indices; j <- (i + 1) until xs.length } yield (xs(i), xs(j))
      got == expect
    })
  }

  test("ShingleHashes matches a reference shingler") {
    val word = Gen.oneOf("a", "bb", "ccc", "d", "the", "x1")
    val text = Gen.listOf(word).map(_.mkString(" "))
    holds(Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val got = ShingleHashes(Literal(t), n)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val words = t.split(" ", -1)
      def wh(w: String) = {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }
      val expect = (0 until math.max(words.length - (n - 1), 1)).map { i =>
        words.slice(i, math.min(i + n, words.length)).foldLeft(0L)((h, w) => h * 1000003L + wh(w))
      }.distinct
      got == expect
    })
  }

  test("EditBagLowerBound never exceeds Levenshtein, subsumes length diff") {
    // alphabet mixes ASCII, a >127 char (é), and a supplementary code
    // point (𝕏, a surrogate pair) so the wide-histogram path and the
    // code-point stepping are both exercised
    val ch = Gen.oneOf("a", "b", "c", " ", "é", "𝕏")
    val str = Gen.listOf(ch).map(_.mkString)
    holds(Prop.forAll(str, str) { (a, b) =>
      val ua = org.apache.spark.unsafe.types.UTF8String.fromString(a)
      val ub = org.apache.spark.unsafe.types.UTF8String.fromString(b)
      val lb = EditBagLowerBound(Literal(a), Literal(b))
        .eval(null).asInstanceOf[Int]
      val dist = ua.levenshteinDistance(ub)
      val lenDiff = math.abs(a.codePointCount(0, a.length) - b.codePointCount(0, b.length))
      lb <= dist && lb >= lenDiff && (a != b || lb == 0)
    })
  }

  test("FoldedBagDistance of PackedCharBags never exceeds the full bag " +
    "bound (hence Levenshtein); interpreted and codegen agree") {
    val ch = Gen.oneOf("a", "b", "c", " ", "é", "𝕏", "0", "9", "w")
    val str = Gen.listOf(ch).map(_.mkString)
    holds(Prop.forAll(str, str) { (a, b) =>
      val ha = PackedCharBag(Literal(a)).eval(null).asInstanceOf[Long]
      val hb = PackedCharBag(Literal(b)).eval(null).asInstanceOf[Long]
      val folded = FoldedBagDistance(Literal(ha), Literal(hb))
        .eval(null).asInstanceOf[Int]
      val full = EditBagLowerBound(Literal(a), Literal(b))
        .eval(null).asInstanceOf[Int]
      val dist = org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .levenshteinDistance(org.apache.spark.unsafe.types.UTF8String.fromString(b))
      // the static helper MIRRORS the loop doGenCode emits (codegen
      // itself is exercised by SqlFunctionsSpec's whole-stage
      // projection parity test) — assert helper and eval agree
      folded == FoldedBagDistance.compute(ha, hb) &&
        folded <= full && folded <= dist && (a != b || folded == 0)
    })
  }

  test("FoldedBagDistance stays a valid lower bound past 8-bit saturation") {
    // 300 'a's vs 300 'b's + shared tail: both hot buckets saturate at
    // 255; the folded bound must CONTRACT (never exceed the true DP)
    val a = "a" * 300 + "zz"
    val b = "b" * 300 + "zz"
    val ha = PackedCharBag(Literal(a)).eval(null).asInstanceOf[Long]
    val hb = PackedCharBag(Literal(b)).eval(null).asInstanceOf[Long]
    val folded = FoldedBagDistance.compute(ha, hb)
    val dist = org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .levenshteinDistance(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(folded <= dist)
    assert(folded <= 255) // saturated counts can never claim more
  }

  test("editDistancePairs output is unchanged by the prefilters " +
    "(planted near/far pairs at every distance around the threshold)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // pairs at dist 0..6 around maxDist=4, same first token so all are
    // block-mates; plus length-incompatible pairs the packed filter
    // must not wrongly drop at exactly |Δlen| = maxDist
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),   // d=0
      (3L, "alpha beta gamma delt"),                                    // d=1 vs 1
      (4L, "alpha beta gamms deltx"),                                   // d=2 vs 1
      (5L, "alpha bXta gamms dZltx"),                                   // d=4 vs 1
      (6L, "alpha bXtQ gamWs dZltx"),                                   // d=6 vs 1 (out)
      (7L, "alpha beta gamma delta XYZW"),                              // Δlen=5 vs 1 (out)
      (8L, "alpha beta gamma delta XYZ")                                // Δlen=4 vs 1 (in iff dist≤4)
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.editDistancePairs(docs, maxDist = 4, bandWidth = 32)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // reference: brute-force over all pairs
    val texts = Seq(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "alpha beta gamma delt", 4L -> "alpha beta gamms deltx",
      5L -> "alpha bXta gamms dZltx", 6L -> "alpha bXtQ gamWs dZltx",
      7L -> "alpha beta gamma delta XYZW", 8L -> "alpha beta gamma delta XYZ")
    val expect = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      d = org.apache.spark.unsafe.types.UTF8String.fromString(ta)
        .levenshteinDistance(org.apache.spark.unsafe.types.UTF8String.fromString(tb))
      if d <= 4
    } yield (ia, ib, d.toLong)).sorted
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("FreqBuffer: never overcounts, MG error bound, heavy items always present") {
    val itemGen = Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.choose(0, 30).map(i => s"c$i"))
    holds(Prop.forAll(Gen.listOf(itemGen), Gen.choose(1, 8)) { (xs, cap) =>
      val buf = new FreqBuffer(cap)
      xs.foreach(buf.add)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      val bound = n / cap
      buf.counts.forall { case (k, c) =>
        c > 0 && c <= truth(k) && truth(k) - c <= bound
      } &&
        truth.forall { case (k, f) => f <= bound || buf.counts.contains(k) } &&
        buf.counts.size <= cap
    })
  }

  test("FreqBuffer merge keeps the summed-stream guarantees in any split") {
    val itemGen = Gen.frequency(
      4 -> Gen.const("hot"), 2 -> Gen.choose(0, 20).map(i => s"c$i"))
    holds(Prop.forAll(Gen.listOf(itemGen), Gen.listOf(itemGen), Gen.choose(1, 6)) {
      (xs, ys, cap) =>
        val a = new FreqBuffer(cap); xs.foreach(a.add)
        val b = new FreqBuffer(cap); ys.foreach(b.add)
        a.merge(b)
        val all = xs ++ ys
        val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bound = all.size.toLong / cap
        a.counts.size <= cap &&
          a.counts.forall { case (k, c) => c <= truth(k) } &&
          truth.forall { case (k, f) => f <= 2 * bound || a.counts.contains(k) }
    })
  }

  test("HeavyHitters aggregate survives serialize/deserialize round-trips") {
    val agg = HeavyHitters(Literal("x"), 4)
    holds(Prop.forAll(Gen.listOf(Gen.choose(0, 10).map(i => s"i$i"))) { xs =>
      val buf = new FreqBuffer(4)
      xs.foreach(buf.add)
      val rt = agg.deserialize(agg.serialize(buf))
      rt.counts == buf.counts
    })
  }

  /** CMS point-query over a buffer, matching CmsEstimate's read path. */
  private def cmsQuery(buf: CmsBuffer, h1: Long): Long = {
    val h2 = XXH64.hashLong(h1, CmsSketch.Seed2)
    (0 until buf.depth).map { d =>
      buf.counts(d * buf.width +
        java.lang.Math.floorMod(h1 + d.toLong * h2, buf.width.toLong).toInt)
    }.min
  }

  test("CmsBuffer: estimates never undercount, overcount bounded by " +
    "colliding mass, split-merge == direct to the bit") {
    val keyGen = Gen.choose(0L, 40L)
    holds(Prop.forAll(Gen.listOf(keyGen), Gen.listOf(keyGen),
      Gen.choose(1, 5), Gen.oneOf(8, 16, 64)) { (xs, ys, depth, width) =>
      def h(k: Long) = XXH64.hashLong(k, HllSketch.Seed)
      val all = xs ++ ys
      val direct = new CmsBuffer(depth, width)
      all.foreach(k => direct.add(h(k)))
      val a = new CmsBuffer(depth, width)
      xs.foreach(k => a.add(h(k)))
      val b = new CmsBuffer(depth, width)
      ys.foreach(k => b.add(h(k)))
      a.merge(b)
      val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      java.util.Arrays.equals(a.counts, direct.counts) &&
        java.util.Arrays.equals(
          CmsBuffer.deserialize(direct.serialize).counts, direct.counts) &&
        truth.forall { case (k, f) =>
          val est = cmsQuery(direct, h(k))
          // >= truth always; <= truth + everything else (trivial worst
          // case; the probabilistic eN/width bound isn't certain)
          est >= f && est <= all.size.toLong
        }
    })
  }

  test("hll_union / hll_singleton match aggregate-built sketches " +
    "bit-for-bit; union passes nulls through") {
    def sk(xs: List[Long], p: Int): Array[Byte] = {
      val b = new HllBuffer(p)
      xs.foreach(x => b.addHash(HllSketch.hashValue(x, LongType)))
      b.regs
    }
    val vals = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    holds(Prop.forAll(vals, vals, Gen.choose(4, 12)) { (as, bs, p) =>
      val u = HllUnion(Literal(sk(as, p), BinaryType),
        Literal(sk(bs, p), BinaryType)).eval(null).asInstanceOf[Array[Byte]]
      // max-merge of register arrays IS the sketch of the union
      java.util.Arrays.equals(u, sk(as ++ bs, p))
    })
    holds(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(4, 12)) { (v, p) =>
      val s = HllSingleton(Literal(v), p).eval(null).asInstanceOf[Array[Byte]]
      java.util.Arrays.equals(s, sk(List(v), p))
    })
    val s = sk(List(7L), 8)
    val viaNullLeft = HllUnion(Literal(null, BinaryType),
      Literal(s, BinaryType)).eval(null).asInstanceOf[Array[Byte]]
    val viaNullRight = HllUnion(Literal(s, BinaryType),
      Literal(null, BinaryType)).eval(null).asInstanceOf[Array[Byte]]
    assert(java.util.Arrays.equals(viaNullLeft, s))
    assert(java.util.Arrays.equals(viaNullRight, s))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Imperative single-pass text-sketch expressions. The HOF
  * (`transform`/`aggregate`) formulations walk an interpreted
  * expression tree and allocate an array per lambda element; for
  * sketches that touch every (token × hash) pair that dominates
  * runtime. These expressions do the same arithmetic in one tight
  * eval per row: hash each shingle/token once with xxHash64, then
  * mix per-permutation with cheap long-hashing.
  */

/** MinHash band hashes computed directly from text:
  * word `n`-gram shingles → `numHashes` permutation minima
  * (xxHash64 of the shingle mixed per-permutation) → one xxHash64
  * per band over its signature slice. Output: Array[Long] of length
  * `bands`. O(shingles + shingles·numHashes/word) with zero
  * allocation per permutation.
  */
case class MinHashBands(child: Expression, n: Int, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  private val rowsPerBand = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val numShingles = math.max(words.length - (n - 1), 1)
    // distinct shingle base hashes (shingle text hashed once)
    val seen = new java.util.HashSet[Long](numShingles * 2)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < numShingles) {
      var h = 0L
      var j = 0
      while (j < n && i + j < words.length) {
        val w = words(i + j)
        val wh = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
        h = h * 1000003L + wh
        j += 1
      }
      if (seen.add(h)) {
        var k = 0
        while (k < numHashes) {
          val salted = XXH64.hashLong(h, k.toLong)
          if (salted < mins(k)) mins(k) = salted
          k += 1
        }
      }
      i += 1
    }
    val bandHashes = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bh = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        bh = XXH64.hashLong(mins(b * rowsPerBand + r), bh)
        r += 1
      }
      bandHashes(b) = bh
      b += 1
    }
    new GenericArrayData(bandHashes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word `n`-gram shingle hashes in one pass: each word
  * hashed once with xxHash64, shingles combined by polynomial rolling
  * (identical combine to [[MinHashBands]]), deduped in-row. The
  * downstream inverted index needs only set semantics, so an 8-byte
  * hash replaces the shingle STRING end-to-end — the HOF chain
  * (split → transform/slice/concat_ws → array_distinct → xxhash64)
  * re-walks an interpreted tree per element and materializes every
  * shingle string; this is one tight loop and no string allocation.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val numShingles = math.max(words.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[Long](numShingles * 2)
    var i = 0
    while (i < numShingles) {
      var h = 0L
      var j = 0
      while (j < n && i + j < words.length) {
        val w = words(i + j)
        h = h * 1000003L + XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All (i < j) id pairs of a posting list as an array of structs —
  * the in-map candidate expansion of the inverted-index/LSH dedup
  * family, in one imperative pass. The HOF form (nested
  * transform+slice+flatten) walks an interpreted tree per element;
  * on a capped bucket of 1000 ids that is ~500k interpreted lambda
  * frames vs one tight loop here.
  */
case class PairCombos(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "pair_combos"

  override protected def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = ids.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(a, ids.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over whitespace tokens: each token hashed once,
  * its hash's bits vote ±1 into 64 counters, majority signs pack
  * into a long.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val counters = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counters(k) += 1 else counters(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counters(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed folded character bag: 8 buckets of SATURATING 8-bit
  * code-point counts in one long — the per-DOCUMENT half of the
  * in-join edit-distance prefilter (see [[FoldedBagDistance]]).
  * Bucket = top 3 bits of the Knuth multiplicative mix of the code
  * point, so near-alphabet characters spread instead of clustering.
  * Folding (many code points per bucket) and saturation (counts
  * clamp at 255) both only CONTRACT per-bucket differences, so the
  * folded bag distance computed from two of these packs is a valid
  * lower bound on the full bag distance — and therefore on the
  * Levenshtein distance ([[EditBagLowerBound]]'s argument). Computed
  * once per document (n rows), consumed per candidate pair (up to
  * budget·n rows): the asymmetry is the point — 8 bytes ride the
  * blocking join the way the packed length does, and pairs die
  * inside the join stage instead of shuffling to a text fetch.
  */
case class PackedCharBag(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "packed_char_bag"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cnt = new Array[Int](8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cnt((cp * -1640531527) >>> 29) += 1
      i += Character.charCount(cp)
    }
    var h = 0L
    var b = 0
    while (b < 8) {
      h |= (math.min(cnt(b), 255).toLong & 255L) << (8 * b)
      b += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Folded bag distance from two [[PackedCharBag]] longs:
  * max(Σ_b max(0, a_b − b_b), Σ_b max(0, b_b − a_b)) over the 8
  * packed buckets. A valid Levenshtein lower bound (folding and
  * saturation only shrink the unfolded bag distance, which is itself
  * a lower bound), so filtering candidates on `folded > maxDist` is
  * EXACT-safe for the `dist ≤ maxDist` predicate. This is the
  * expression that runs once per CANDIDATE pair (billions at soak
  * scale) — hence full codegen, 8 shift/mask iterations on two
  * longs, no memory access.
  */
case class FoldedBagDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "folded_bag_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FoldedBagDistance.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val neg = ctx.freshName("neg")
      s"""
         |int $pos = 0; int $neg = 0;
         |for (int $i = 0; $i < 64; $i += 8) {
         |  int $d = (int) (($a >>> $i) & 255L) - (int) (($b >>> $i) & 255L);
         |  if ($d > 0) $pos += $d; else $neg -= $d;
         |}
         |${ev.value} = java.lang.Math.max($pos, $neg);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FoldedBagDistance {
  def compute(ha: Long, hb: Long): Int = {
    var pos = 0
    var neg = 0
    var i = 0
    while (i < 64) {
      val d = ((ha >>> i) & 255L).toInt - ((hb >>> i) & 255L).toInt
      if (d > 0) pos += d else neg -= d
      i += 8
    }
    math.max(pos, neg)
  }
}

/** Lower bound on the Levenshtein distance of two strings in ONE
  * linear pass: the bag (multiset) distance max(Σ excess_a, Σ
  * excess_b) over code-point histograms. Each character edit removes
  * at most one code point from one side's multiset and adds at most
  * one to the other's, so the bag distance never exceeds the true DP
  * distance — rejecting a pair on `bag > maxDist` is EXACT-safe for
  * the `dist ≤ maxDist` predicate (it also subsumes the length
  * difference bound: max(excess_a, excess_b) ≥ |len_a − len_b|).
  * Purpose: cut the edit-distance verify set before the banded
  * O(len·maxDist) DP — the bound is O(len_a + len_b) with an ASCII
  * int[128] fast path, ~4× cheaper per pair at maxDist=4, and most
  * blocked candidates that share a prefix differ in many characters.
  * Code points (not UTF-16 units) so the bound stays valid against
  * `UTF8String.levenshteinDistance`, which steps by code point.
  */
case class EditBagLowerBound(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_bag_lower_bound"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[UTF8String].toString
    val sb = b.asInstanceOf[UTF8String].toString
    val ascii = new Array[Int](128)
    var wide: java.util.HashMap[Integer, Integer] = null
    def bump(cp: Int, d: Int): Unit =
      if (cp < 128) ascii(cp) += d
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Integer]()
        wide.merge(cp, d, (x, y) => Int.box(x + y))
      }
    var i = 0
    while (i < sa.length) {
      val cp = sa.codePointAt(i); bump(cp, 1); i += Character.charCount(cp)
    }
    var j = 0
    while (j < sb.length) {
      val cp = sb.codePointAt(j); bump(cp, -1); j += Character.charCount(cp)
    }
    var excessA = 0
    var excessB = 0
    var c = 0
    while (c < 128) {
      val v = ascii(c)
      if (v > 0) excessA += v else excessB -= v
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        val v = it.next().intValue()
        if (v > 0) excessA += v else excessB -= v
      }
    }
    math.max(excessA, excessB)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextHashFunctions {
  def minhashBands(text: Column, n: Int, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      MinHashBands(org.apache.spark.sql.graftglue.ColumnGlue.expr(text), n, numHashes, bands))

  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      ShingleHashes(org.apache.spark.sql.graftglue.ColumnGlue.expr(text), n))

  def pairCombos(ids: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      PairCombos(org.apache.spark.sql.graftglue.ColumnGlue.expr(ids)))

  def simhash64(text: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      SimHash64(org.apache.spark.sql.graftglue.ColumnGlue.expr(text)))

  def editBagLowerBound(a: Column, b: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      EditBagLowerBound(org.apache.spark.sql.graftglue.ColumnGlue.expr(a),
        org.apache.spark.sql.graftglue.ColumnGlue.expr(b)))

  def packedCharBag(text: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      PackedCharBag(org.apache.spark.sql.graftglue.ColumnGlue.expr(text)))

  def foldedBagDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(
      FoldedBagDistance(org.apache.spark.sql.graftglue.ColumnGlue.expr(a),
        org.apache.spark.sql.graftglue.ColumnGlue.expr(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sequential dot product of two float arrays, accumulated in double
  * left-to-right — the same evaluation order as the HOF form
  * `aggregate(zip_with(a,b,*), 0d, +)` and the DuckDB oracle's loop,
  * so results stay bit-identical — but whole-stage-codegen'd into a
  * tight primitive loop instead of an interpreted expression tree
  * walk (≈100× on the O(n²) pair-scoring paths).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential dot product of two int arrays accumulated in long —
  * the scoring kernel for int8-quantized embeddings
  * ([[graft.ann.Ann.quantizeInt8]]): exact integer arithmetic (no
  * rounding anywhere), whole-stage-codegen'd like [[FloatVecDot]] so
  * the O(n²) quantized pair scoring stays a tight primitive loop.
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "int_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id: `bits` pseudo-hyperplanes whose
  * ±1 coefficients are deterministic xxHash64 signs of (dim, plane);
  * the sign of each sketch dot product packs into a long bucket id.
  * The sign matrix is materialized once per expression instance —
  * the HOF form re-derived every coefficient per row interpreted.
  */
case class LshBucket(child: Expression, dims: Int, bits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_bucket"

  // signs(p)(i) = ±1 coefficient of hyperplane p at dimension i,
  // derived exactly like the HOF form: bit 1 of xxhash64(i, p). The
  // seed picks the hyperplane family, so multi-band LSH gets genuinely
  // independent sketches per band (seed is a case-class field →
  // expression equality / codegen cache keys differ per band).
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(bits) { p =>
      Array.tabulate(dims) { i =>
        val h = XXH64.hashLong(p.toLong, XXH64.hashLong(i.toLong, seed))
        if (((h >> 1) & 1L) == 1L) 1.0 else -1.0
      }
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val s = signs(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * s(i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`nprobe` IVF cell ids of an embedding against a FIXED centroid
  * table, in ONE imperative eval call. Replaces the HOF form
  * `slice(array_sort(transform(centLit, c => struct(-dot(emb, c),
  * cell_id))), 1, nprobe)` BIT-IDENTICALLY: cells rank by ascending
  * d = −dot (the dot accumulated left-to-right in double, exactly
  * [[FloatVecDot]]'s order), ties by ascending cell_id — the same
  * field-by-field struct comparison the sort performed.
  *
  * Why it exists: higher-order functions never enter whole-stage
  * codegen, so the HOF form pays nCells interpreted expression-tree
  * walks (struct allocation each) PLUS an O(nCells log nCells) sort
  * per row. At the 100× soak (200k vectors × 782 adaptive cells ×
  * 64 dims) that assignment projection alone was the wall. Here the
  * whole ranking is one eval over primitive arrays; the centroid
  * matrix materializes once per expression instance (the LshBucket
  * pattern). Centroids are held as a Seq (structural equality keeps
  * expression semantics well-defined); [[fitIvf]]'s ≤4096-cell
  * contract bounds the literal.
  */
case class IvfBestCells(child: Expression,
                        centroids: Seq[(Long, Seq[Float])], nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "ivf_best_cells"

  @transient private lazy val cellIds: Array[Long] =
    centroids.map(_._1).toArray
  @transient private lazy val cent: Array[Array[Float]] =
    centroids.map(_._2.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = cent.length
    val d = new Array[Double](m)
    var j = 0
    while (j < m) {
      val c = cent(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      d(j) = -acc
      j += 1
    }
    // partial selection of the first `take` cells by (d asc, id asc):
    // nprobe is small (≤ tens), so selection beats a full sort
    val take = math.min(nprobe, m)
    val idx = Array.tabulate(m)(identity)
    val out = new Array[Long](take)
    var r = 0
    while (r < take) {
      var best = r
      var t = r + 1
      while (t < m) {
        val a = idx(t); val b = idx(best)
        // Double.compare, not <: replicates array_sort's TOTAL order
        // (-0.0 < 0.0, NaN last) so the ±0.0/NaN edge cases cannot
        // diverge from the HOF parity reference
        val cmp = java.lang.Double.compare(d(a), d(b))
        if (cmp < 0 || (cmp == 0 && cellIds(a) < cellIds(b))) best = t
        t += 1
      }
      val tmp = idx(r); idx(r) = idx(best); idx(best) = tmp
      out(r) = cellIds(idx(r))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `m` product-quantization subspace code assignments in ONE
  * imperative eval per row: for each subspace s, the codeword index
  * minimizing ‖x_s − w‖² with ties to the lower index — bit-identical
  * to the HOF parity reference (per-word `dot(a,a) − 2·dot(a,b) +
  * dot(b,b)` with left-to-right double accumulation, `array_sort` of
  * (d, j) structs), which never enters whole-stage codegen and pays
  * m·k interpreted tree walks plus m sorts per row — the 100× soak
  * measured the PQ fit+encode path at 114 s on 200k×64f where this
  * kernel's m·k·subDim ≈ 1k multiplies per row are interpreter-free.
  * Codebooks are Seq-typed literals ([[IvfBestCells]]'s pattern);
  * `aa` hoists out of the word loop (same value, same summation
  * order — bit-identical).
  */
case class PqBestCodes(child: Expression,
                       codebooks: Seq[Seq[Seq[Float]]], subDim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_best_codes"

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val words = cb(s)
      val off = s * subDim
      val avail = math.max(0, math.min(subDim, v.numElements() - off))
      var aa = 0.0
      var i = 0
      while (i < avail) {
        val x = v.getFloat(off + i).toDouble
        aa += x * x
        i += 1
      }
      var bestJ = 0
      var bestD = 0.0
      var j = 0
      while (j < words.length) {
        val w = words(j)
        val n = math.min(avail, w.length)
        var ab = 0.0
        var bb = 0.0
        var t = 0
        while (t < n) {
          val x = v.getFloat(off + t).toDouble
          val y = w(t).toDouble
          ab += x * y
          t += 1
        }
        // bb over the FULL word, matching dot(b,b) in the HOF form
        var u = 0
        while (u < w.length) {
          val y = w(u).toDouble
          bb += y * y
          u += 1
        }
        val d = aa - 2.0 * ab + bb
        if (j == 0 || d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[FloatVecDot]]. */
  def floatVecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(FloatVecDot(
      org.apache.spark.sql.graftglue.ColumnGlue.expr(a),
      org.apache.spark.sql.graftglue.ColumnGlue.expr(b)))

  /** Column API for [[IntVecDot]]. */
  def intVecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(IntVecDot(
      org.apache.spark.sql.graftglue.ColumnGlue.expr(a),
      org.apache.spark.sql.graftglue.ColumnGlue.expr(b)))

  def lshBucket(emb: Column, dims: Int, bits: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(LshBucket(
      org.apache.spark.sql.graftglue.ColumnGlue.expr(emb), dims, bits, seed))

  /** Column API for [[IvfBestCells]]. */
  def ivfBestCells(emb: Column, centroids: Seq[(Long, Seq[Float])],
                   nprobe: Int): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(IvfBestCells(
      org.apache.spark.sql.graftglue.ColumnGlue.expr(emb), centroids, nprobe))

  /** Column API for [[PqBestCodes]]. */
  def pqBestCodes(emb: Column, codebooks: Seq[Seq[Seq[Float]]],
                  subDim: Int): Column =
    org.apache.spark.sql.graftglue.ColumnGlue.column(PqBestCodes(
      org.apache.spark.sql.graftglue.ColumnGlue.expr(emb), codebooks, subDim))
}

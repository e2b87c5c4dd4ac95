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
}

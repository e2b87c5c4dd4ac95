package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Feature vector from a binary payload: [n_bytes, mean, max, min] of
  * the unsigned byte values — the STUB "codec" of the multimodal
  * pipeline (see graft.multimodal.BinaryPipeline), expressed as a
  * native Catalyst expression so feature extraction stays inside
  * whole-stage codegen with column pruning intact (the previous
  * `.rdd.mapPartitions` hop abandoned both). A real image/audio
  * decoder would instead run as an arrow-batched python UDF; this
  * expression marks exactly where that batch body plugs in.
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "byte_stats"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteStats.decode(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ByteStats.decode($b));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteStats {
  /** Deterministic fake decode: byte-statistics feature vector. */
  def decode(payload: Array[Byte]): Array[Double] = {
    if (payload.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
    var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
    var i = 0
    while (i < payload.length) {
      val v = payload(i) & 0xff
      sum += v; if (v > mx) mx = v; if (v < mn) mn = v
      i += 1
    }
    Array(payload.length.toDouble, sum.toDouble / payload.length, mx.toDouble, mn.toDouble)
  }
}

object BinaryFunctions {
  import org.apache.spark.sql.graftglue.ColumnGlue

  /** Column API for [[ByteStats]]. */
  def byteStats(payload: Column): Column =
    ColumnGlue.column(ByteStats(ColumnGlue.expr(payload)))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark has no native node for:
  * each left row picks the payload of the most recent right row with
  * `right.ts <= left.ts` for the same key.
  *
  * Composed from built-ins (preference order (a) in SURVEY §4): tag
  * and union the two sides, sort per key by (ts, tag) — right rows
  * sort before left rows at equal timestamps so "<=" holds — and
  * propagate the latest right payload with `last(ignoreNulls)` over
  * an unbounded-preceding window. One shuffle on the key, linear
  * scan per partition; a naive inequality join instead explodes into
  * a broadcast nested-loop at scale.
  *
  * Each side's columns travel as ONE struct through the window, so
  * every picked field is guaranteed to come from the same right row.
  */
object AsOf {

  /** @param pickCols right-side columns to expose (as asof_<name>)
    * @param tieCol   right rows tied on (key, ts) keep only the
    *                 highest tieCol value, making ties deterministic
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               pickCols: Seq[String], tieCol: String): DataFrame = {
    val rightDedup = right
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key), col(tsCol)).orderBy(col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")

    val r = rightDedup.select(
      col(key), col(tsCol), lit(0).as("_tag"),
      struct(pickCols.map(col): _*).as("_r"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields).sql).as("_l"))
    val l = left.select(
      col(key), col(tsCol), lit(1).as("_tag"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        rightDedup.select(pickCols.map(col): _*).schema.fields).sql).as("_r"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_l"))

    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = r.unionByName(l)
      .withColumn("_picked", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val base = left.columns.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("_l").getField(c))
    }
    pickCols.foldLeft(base) { (df, c) =>
      df.withColumn(s"asof_$c", col("_picked").getField(c))
    }.select((left.columns.toIndexedSeq ++ pickCols.map(c => s"asof_$c")).map(col): _*)
  }

  /** Forward as-of join: each left row picks the EARLIEST right row
    * with `right.ts >= left.ts` for the same key — "what happened
    * next" attribution, the mirror of [[asofJoin]]'s "most recent
    * prior". Same one-shuffle union+window plan, with
    * `first(ignoreNulls)` over the unbounded-FOLLOWING frame (left
    * rows sort before right rows at equal timestamps so ">=" stays
    * inclusive).
    *
    * `toleranceSeconds` bounds the look-ahead: a match further than
    * the horizon nulls out instead of attributing across an
    * arbitrary gap (the matched right timestamp rides inside the
    * picked struct, so the horizon check needs no extra join).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      tsCol: String, pickCols: Seq[String], tieCol: String,
                      toleranceSeconds: Option[Long] = None): DataFrame = {
    val rightDedup = right
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key), col(tsCol)).orderBy(col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")

    val rCols = tsCol +: pickCols
    val r = rightDedup.select(
      col(key), col(tsCol), lit(1).as("_tag"),
      struct(rCols.map(col): _*).as("_r"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields).sql).as("_l"))
    val l = left.select(
      col(key), col(tsCol), lit(0).as("_tag"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        rightDedup.select(rCols.map(col): _*).schema.fields).sql).as("_r"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_l"))

    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = r.unionByName(l)
      .withColumn("_picked", first(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0)
    val bounded = toleranceSeconds match {
      case Some(tol) => filled.withColumn("_picked",
        when(col("_picked").getField(tsCol) <=
          col(tsCol) + expr(s"INTERVAL $tol seconds"), col("_picked")))
      case None => filled
    }

    val base = left.columns.foldLeft(bounded) { (df, c) =>
      df.withColumn(c, col("_l").getField(c))
    }
    pickCols.foldLeft(base) { (df, c) =>
      df.withColumn(s"asof_$c", col("_picked").getField(c))
    }.select((left.columns.toIndexedSeq ++ pickCols.map(c => s"asof_$c")).map(col): _*)
  }

  /** Nearest as-of join: each left row picks the right row with the
    * SMALLEST |Δt| for its key, either direction — sensor alignment
    * semantics, where the closest reading wins regardless of side
    * (backward ties beat forward at equal distance, keeping the
    * operator deterministic and consistent with [[asofJoin]]'s
    * inclusive "<="). Still ONE shuffle: both directional candidates
    * come from two window passes over the SAME tagged union and key
    * partitioning (Catalyst plans them on one exchange) — never the
    * two-sided inequality join, which nested-loops. Right rows at
    * the left row's exact timestamp land in the backward frame
    * (distance 0), so inclusivity is preserved.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      tsCol: String, pickCols: Seq[String],
                      tieCol: String): DataFrame = {
    val rightDedup = right
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key), col(tsCol)).orderBy(col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")

    val rCols = tsCol +: pickCols
    val r = rightDedup.select(
      col(key), col(tsCol), lit(0).as("_tag"),
      struct(rCols.map(col): _*).as("_r"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields).sql).as("_l"))
    val l = left.select(
      col(key), col(tsCol), lit(1).as("_tag"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        rightDedup.select(rCols.map(col): _*).schema.fields).sql).as("_r"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_l"))

    val ord = Window.partitionBy(col(key)).orderBy(col(tsCol), col("_tag"))
    val back = ord.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = ord.rowsBetween(0, Window.unboundedFollowing)
    val filled = r.unionByName(l)
      .withColumn("_b", last(col("_r"), ignoreNulls = true).over(back))
      .withColumn("_f", first(col("_r"), ignoreNulls = true).over(fwd))
      .filter(col("_tag") === 1)
      .withColumn("_db",
        when(col("_b").isNotNull,
          unix_micros(col(tsCol)) - unix_micros(col("_b").getField(tsCol))))
      .withColumn("_df",
        when(col("_f").isNotNull,
          unix_micros(col("_f").getField(tsCol)) - unix_micros(col(tsCol))))
      .withColumn("_picked",
        when(col("_db").isNotNull &&
          (col("_df").isNull || col("_db") <= col("_df")), col("_b"))
          .otherwise(col("_f")))

    val base = left.columns.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("_l").getField(c))
    }
    pickCols.foldLeft(base) { (df, c) =>
      df.withColumn(s"asof_$c", col("_picked").getField(c))
    }.select((left.columns.toIndexedSeq ++ pickCols.map(c => s"asof_$c")).map(col): _*)
  }
}

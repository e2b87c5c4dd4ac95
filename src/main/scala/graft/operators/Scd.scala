package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: turn a change-event
  * stream into versioned validity intervals per key.
  *
  * The reference maintains its dimension (cfg) tables by periodically
  * re-extracting the current attribute snapshot (HlxTools.py:534-573,
  * the CFG schedule); SCD2 is the warehouse-native generalization that
  * also keeps the history — every attribute change opens a new
  * version row and closes the previous one.
  */
object Scd {

  /** Collapse a change stream into SCD2 interval rows.
    *
    * For each `keyCol`, rows are ordered by (`tsCol`, `tieBreak`) and
    * consecutive runs of the same `attrCol` value become one version:
    * `valid_from` = first ts of the run, `valid_to` = the next run's
    * `valid_from` (NULL on the current version), `version` counts from
    * 1 per key, `n_rows` = events collapsed into the run, and
    * `is_current` flags the open interval.
    *
    * Scale: one hash exchange on `keyCol` — the ordering windows, the
    * run aggregation, and the `valid_to` lead all reuse that single
    * partitioning, so Catalyst plans one shuffle end-to-end. Runs are
    * detected with lag (never a self-join), and the output is one row
    * per version — a dimension-sized table regardless of how large
    * the event feed is.
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val runs = df
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_chg",
        when(col("_prev").isNull || col("_prev") =!= col(attrCol), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("version"))
      .agg(
        // attr is constant within a run by construction
        min(col(attrCol)).as(attrCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Point-in-time dimension lookup: each fact row picks the SCD2
    * version whose half-open interval `[valid_from, valid_to)`
    * contains the fact timestamp — the join every versioned-dimension
    * warehouse query needs and Spark has no node for.
    *
    * Composed as a backward as-of on `valid_from` (one union+window
    * shuffle, [[AsOf.asofJoin]]) plus an in-row `valid_to` guard for
    * dimensions with coverage gaps — never an interval-inequality
    * join, which Spark plans as a nested loop. Empty intervals
    * (same-timestamp version flips) resolve like the containment
    * join does: the as-of tie-dedup keeps the highest version at a
    * shared `valid_from`, which is the only interval that contains
    * anything.
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      tsCol: String, pickCols: Seq[String]): DataFrame = {
    val renamed = dim.withColumnRenamed("valid_from", tsCol)
    val joined = AsOf.asofJoin(facts, renamed, key, tsCol,
      pickCols :+ "valid_to", "version")
    val valid = col("asof_valid_to").isNull || col(tsCol) < col("asof_valid_to")
    pickCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(valid, col(s"asof_$c")))
    }.drop("asof_valid_to")
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/filter evaluation metrics over corpus tables — the QA
  * layer a training-data pipeline needs once heuristic quality
  * filters (TextOps) and weak labelers start gating what reaches the
  * training mix. Every statistic here follows the repo's
  * exact-arithmetic discipline: all accumulation happens in BIGINT
  * (order-independent, partition-order-proof), and each final score
  * is ONE fixed-shape double expression over those integers, so the
  * numbers grade bit-exact against any engine that implements
  * correctly-rounded IEEE division (reference behavior: offline
  * evaluation of filter rules before a Chill-style feed goes live).
  */
object Evaluate {

  /** Ranking quality (ROC AUC) of an integer score against a binary
    * label, per group — computed exactly as the Mann-Whitney U rank
    * statistic with midrank tie handling.
    *
    * Doubling every rank keeps tie midranks integral:
    * `rank2 = 2*rank_min + peers - 1` is twice the average rank of a
    * tie run, so `u2 = sum(rank2 | positive) - n_pos*(n_pos+1)` is
    * exactly twice U and `auc = u2 / (2*n_pos*n_neg)` is a single
    * IEEE division. Both window functions share ONE
    * partition-by-group, order-by-score sort (the peer count is a
    * RANGE CURRENT ROW frame over the same ordering), so the whole
    * metric costs one exchange + one sort + one partial-aggregated
    * groupBy. At 100 TB the per-group sort bounds group size to an
    * executor's spill budget — for open-ended groups, pre-bin the
    * score (the binned midrank AUC) to make the sort key
    * low-cardinality; the statistic shape is unchanged.
    * Groups with a single class get `auc = null`, not 0/0.
    */
  def aucByGroup(df: DataFrame, scoreCol: Column, labelCol: Column,
                 groupCol: Column): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").asc)
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow))
    df
      .select(groupCol.as("grp"), scoreCol.cast("long").as("score"),
        labelCol.cast("int").as("pos"))
      .withColumn("rank2", lit(2L) * rank().over(w) + peers - lit(1L))
      .groupBy(col("grp"))
      .agg(
        coalesce(sum(when(col("pos") === 1, col("rank2"))), lit(0L))
          .as("r2_pos"),
        sum(col("pos")).cast("long").as("n_pos"),
        sum(lit(1) - col("pos")).cast("long").as("n_neg"))
      .withColumn("u2",
        col("r2_pos") - col("n_pos") * (col("n_pos") + lit(1L)))
      .withColumn("auc",
        when(col("n_pos") === 0 || col("n_neg") === 0,
          lit(null).cast("double"))
          .otherwise(col("u2").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg"))))
  }

  /** Reliability diagram (calibration bins) for an integer
    * milli-probability score (0..1000) against a binary label: each
    * row lands in one of `bins` equal-width buckets (top edge clamped
    * into the last bucket), and per bucket we report the exact count,
    * the mean predicted probability, and the observed positive rate.
    * Scores stay integral until the two final divisions, so bucket
    * assignment and both rates replay identically on any engine. One
    * map-side-combined aggregation, `bins` rows out at any feed size —
    * the canonical monitoring shape.
    */
  def calibrationBins(df: DataFrame, scoreMilliCol: Column,
                      labelCol: Column, bins: Int = 10): DataFrame = {
    require(bins > 0 && 1000 % bins == 0,
      s"bins must divide 1000, got $bins")
    val width = 1000 / bins
    df
      .select(scoreMilliCol.cast("long").as("sm"),
        labelCol.cast("long").as("pos"))
      .withColumn("bin", least(floor(col("sm") / width), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("sm")).as("sum_milli"),
        sum(col("pos")).as("n_pos"))
      .withColumn("mean_pred",
        col("sum_milli").cast("double") / (lit(1000.0) * col("n")))
      .withColumn("frac_pos", col("n_pos").cast("double") / col("n"))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelers
    * (here: two heuristic rule sets voting on the same documents; the
    * standard check before trusting weak supervision). With
    * `agree = Σ diag` and `sum_rc = Σ_label rowTotal·colTotal`,
    * `kappa = (n·agree − sum_rc) / (n² − sum_rc)` — every term exact
    * BIGINT, one double division. The confusion matrix is
    * labels²-sized, so everything after the first partial-aggregated
    * pass is dimension-sized; the marginal product joins on the label
    * key (inner join suffices — a label missing on either side
    * contributes 0 to the sum). Output is one row.
    */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cm = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val rowTot = cm.groupBy(col("a").as("lab")).agg(sum("c").as("rt"))
    val colTot = cm.groupBy(col("b").as("lab")).agg(sum("c").as("ct"))
    val sumRc = rowTot.join(colTot, "lab")
      .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).as("sum_rc"))
    cm.agg(
      sum("c").as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("agree"))
      .crossJoin(broadcast(sumRc))
      .withColumn("kappa",
        when(col("n") * col("n") === col("sum_rc"),
          lit(null).cast("double"))
          .otherwise(
            (col("n") * col("agree") - col("sum_rc")).cast("double")
              / (col("n") * col("n") - col("sum_rc")).cast("double")))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Repartition}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Input-layout guard for per-row kernel stages (the
  * Ann.withKernelParallelism idiom, hoisted so the text/dedup miners
  * can share it): single-file local testdata scans as 1–2 splits
  * (one parquet row group), so a heavy per-row kernel fused into the
  * scan stage — shingle explosion, minhash signatures, BPE word
  * splits — runs at 1–2-task parallelism on a 32-core session (r12
  * profile: the q_dup_cluster_sizes posting map stage spent 563 ms/task
  * on 2 tasks). The guard round-robins the slim corpus up to session
  * parallelism ONLY when the scan is under-split by 2× or more; normal
  * many-split cluster inputs pass through untouched, keeping the
  * kernel scan exchange-free at scale (the plan-audit contract for the
  * IVF family).
  */
object Spread {
  /** True iff the plan is a bare scan under projections/filters — the
    * only shape whose `df.rdd.getNumPartitions` is a pure planning
    * question. On any other shape (joins, aggregates — anything with
    * an exchange), `Dataset.rdd` under AQE MATERIALIZES the upstream
    * shuffle stages in a separate execution and the real query then
    * re-runs them (r12 ADVICE): those inputs pass through untouched.
    */
  private def scanShaped(plan: LogicalPlan): Boolean = plan match {
    case p: Project => scanShaped(p.child)
    case f: Filter => scanShaped(f.child)
    // coalesce is a narrow repartition — no exchange, still a scan
    case r: Repartition if !r.shuffle => scanShaped(r.child)
    case _: LogicalRelation => true
    case _ => false
  }

  def apply(df: DataFrame): DataFrame =
    if (!scanShaped(df.queryExecution.optimizedPlan)) df
    else {
      val want = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
    }
}

package graft.operators

import org.apache.spark.sql.DataFrame

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
  def apply(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }
}

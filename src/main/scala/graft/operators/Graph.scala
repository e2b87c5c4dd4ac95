package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over relationship graphs mined from the
  * warehouse's fact tables (who-trades-with-whom, who-links-to-whom).
  *
  * Arithmetic design: PageRank is usually float math, and float
  * iteration is NOT reproducible across engines (summation order and
  * library rounding differ), so ranks here are fixed-point BIGINTs —
  * integer floor division for the out-degree split and the damping
  * factor (85/100), integer sums for the gather. Every iteration is
  * then bit-identical on any engine that can add and divide integers,
  * which is what lets the result carry a full SQL oracle instead of a
  * tolerance check.
  */
object Graph {

  /** Undirected customer—supplier trading edges from the order fact
    * tables: customer c and supplier s are adjacent iff some order of
    * c has a line item supplied by s. One fact-fact shuffle join +
    * a distinct; both directions are emitted so the random walk is
    * symmetric. Node ids are namespaced ("c<id>" / "s<id>") since the
    * two key spaces overlap.
    */
  def tradingEdges(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cust"),
        concat(lit("s"), col("l_suppkey")).as("supp"))
      .distinct()
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** Fixed-point PageRank over a directed edge list (src, dst):
    * `iters` damped propagation rounds from a uniform start of `init`
    * per node, all in BIGINT —
    * rank'(v) = 15*init/100 + 85 * (sum over in-neighbors u of
    * rank(u) div outdeg(u)) div 100.
    *
    * Each round is ONE narrow shuffle: the dimension-sized rank table
    * joins the edge list (persisted and partitioned once on src —
    * edge rows never move again) and the gather is a map-side-combined
    * sum per dst. Ranks are localCheckpoint'ed per round so the plan
    * stays a leaf instead of nesting (the components() lesson).
    * Headroom contract: n * init * 85 must fit in a long — pick
    * init ~ 10^18 / (100 n) for big graphs; overflow raises under
    * ANSI rather than wrapping.
    */
  def pageRank(edges: DataFrame, iters: Int, init: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "at least one propagation round")
    val width = edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges.select(col("src"), col("dst"))
      .repartition(width, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = 15L * init / 100L
    var ranks = nodes.withColumn("rank", lit(init)).localCheckpoint()
    (1 to iters).foreach { _ =>
      val gathered = e
        .join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div out_deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      ranks = nodes
        .join(gathered, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr("(85 * coalesce(in_sum, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    e.unpersist(); deg.unpersist(); nodes.unpersist()
    ranks
  }
}

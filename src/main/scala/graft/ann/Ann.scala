package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (exact; queries broadcast, one
  * pass over the corpus — the right plan even at 100 TB when the
  * query set is small). Scale path: random-hyperplane LSH buckets so
  * only same-bucket candidates are scored, with multiprobe via
  * Hamming-adjacent buckets left to bucket-count tuning.
  *
  * Dot products use sequential `aggregate`/`zip_with` HOFs (codegen,
  * deterministic left-to-right double accumulation).
  */
object Ann {

  /** Sequential dot product of two float arrays (left-to-right double
    * accumulation — bit-identical to the DuckDB oracle's loop).
    * Native codegen expression (graft.functions.FloatVecDot).
    */
  def dot(x: Column, y: Column): Column =
    graft.functions.VectorFunctions.floatVecDot(x, y)

  /** Cosine similarity; the two-division form (dot/na/nb) matches the
    * oracle expression exactly so doubles compare bit-equal.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))

  /** Exact top-k neighbors for each query vector. `queries` is small
    * → broadcast cross join, so the corpus is scanned once with no
    * shuffle before the per-query top-k aggregation. Norms are
    * precomputed per side (once per vector, not once per pair).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("c_norm"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / col("q_norm") / col("c_norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Random-hyperplane sign sketch: `bits` pseudo-hyperplanes with
    * deterministic ±1 coefficients; native expression
    * (graft.functions.LshBucket) with a precomputed sign matrix.
    */
  def lshBucket(emb: Column, dims: Int, bits: Int): Column =
    graft.functions.VectorFunctions.lshBucket(emb, dims, bits)

  /** LSH-bucketed near-dup / ANN candidates: vectors sharing a bucket
    * are scored exactly; only same-bucket pairs materialize.
    */
  def lshPairs(corpus: DataFrame, dims: Int, bits: Int, threshold: Double): DataFrame = {
    val bucketed = corpus.select(
      col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
      lshBucket(col("embedding"), dims, bits).as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) / col("a.norm") / col("b.norm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF-style ANN: corpus vectors are assigned to their nearest
    * centroid cell (coarse quantizer); each query searches only the
    * `nprobe` nearest cells. Centroids here are a deterministic
    * sample of the corpus (first `nCells` by vec_id) — a k-means fit
    * would slot in without changing the plan shape. At 100 TB the
    * cell assignment is one broadcast pass over the corpus and the
    * probe join touches nprobe/nCells of the data.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, nCells: Int,
              nprobe: Int, k: Int): DataFrame = {
    val centroids = broadcast(corpus
      .filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb")))
    def nearestCells(df: DataFrame, idCol: String, embCol: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("c_dist").asc, col("cell_id").asc)
      df.crossJoin(centroids)
        .withColumn("c_dist", -dot(col(embCol), col("c_emb")))
        .withColumn("c_rnk", row_number().over(w))
        .filter(col("c_rnk") <= n)
        .drop("c_emb", "c_dist", "c_rnk")
    }
    val cells = nearestCells(
      corpus.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("c_norm")),
      "vec_id", "embedding", 1)
    val probes = nearestCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        sqrt(dot(col("embedding"), col("embedding"))).as("q_norm")),
      "query_id", "q_emb", nprobe)
    val scored = probes.join(cells, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) / col("q_norm") / col("c_norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Exact embedding near-dup pairs above a cosine threshold
    * (brute-force; correct at test SF — the scale path is lshPairs).
    * Norms precomputed per vector before the pair join.
    */
  def exactPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val withNorm = corpus.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    withNorm.as("a")
      .join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) / col("a.norm") / col("b.norm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: BM25 scoring for a fixed query
  * term set, top-k by score.
  *
  * The query terms are a handful of literals, so nothing about this
  * is a join: per-document term frequencies are pure projections over
  * the tokenized text, the corpus-level statistics (N, avgdl, per-term
  * document frequencies) collapse to ONE row that broadcasts back over
  * a second scan, and the top-k finishes as TakeOrderedAndProject
  * (per-partition bounded heaps). Two corpus scans, zero shuffles of
  * document rows — the shape that survives 100 TB.
  */
object Search {

  /** BM25 defaults chosen binary-exact (1.25, 0.75 are powers-of-two
    * sums) so every engine computes bit-identical scores — a non-exact
    * constant like 1.2 rounds differently depending on whether the
    * parser produces DECIMAL or DOUBLE first.
    */
  val DefaultK1 = 1.25
  val DefaultB = 0.75

  /** Evaluate `value` once and expose it to `body` as a lambda
    * variable (see [[TextOps]] — projection collapsing would inline
    * the split into every per-term filter otherwise).
    */
  private def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Top-`k` documents for `terms` by BM25.
    *
    * Per term t: idf_t = ln((N - df_t + 0.5)/(df_t + 0.5) + 1) and
    * tf-norm = (tf * (k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)); the
    * document score is the fixed-order sum of idf_t * tf-norm_t over
    * the query terms. Only documents hitting at least one term score;
    * ties break on doc_id. The arithmetic is written in one canonical
    * association order so a SQL oracle replays it bit-for-bit.
    *
    * The stats pass collapses to ONE row, collected eagerly: N,
    * avgdl, and df_t become plan literals, and the idf logs are
    * computed on the driver by [[graft.functions.ExactMath.ln]] —
    * correctly rounded, so they equal a native engine's glibc `ln`
    * bit-for-bit, where Spark's builtin `log` (fdlibm StrictMath)
    * rounds hard cases one ulp away.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int,
           k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    def tfCol(i: Int) = col(s"tf$i")
    // scan 1 fields: doc length + per-term frequencies, split bound once
    val counted = docs.select(col("doc_id"),
      bind(split(col("text"), " ")) { w =>
        struct(size(w).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(w, x => x === lit(t))).cast("long").as(s"tf$i")
          }: _*)
      }.as("c"))
      .select(col("doc_id") +: col("c.dl").as("dl") +:
        terms.indices.map(i => col(s"c.tf$i").as(s"tf$i")): _*)
    // corpus stats: one bounded row (2 + |terms| numbers) to the driver
    val stats = counted.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.indices.map(i =>
          sum((tfCol(i) > 0).cast("long")).as(s"df$i")): _*)
      .collect()(0)
    val nDocs = stats.getLong(0)
    if (nDocs == 0)
      return counted.select(col("doc_id"), lit(0.0).as("score")).limit(0)
    // the same single division the oracle writes: CAST(sum AS DOUBLE)/n
    val avgdl = stats.getLong(1).toDouble / nDocs
    val contribs = terms.indices.map { i =>
      val dfT = stats.getLong(2 + i)
      val idf = graft.functions.ExactMath.ln(
        (nDocs - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val num = tfCol(i) * lit(k1 + 1.0)
      val den = tfCol(i) +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / lit(avgdl)))
      lit(idf) * (num / den)
    }
    counted
      .filter(terms.indices.map(tfCol).reduce(_ + _) > 0)
      .select(col("doc_id"), contribs.reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Inverted-index build — the search-index construction pass: one
    * row per (term, posting), carrying the term's document frequency
    * and its first `maxPostings` doc ids (lowest-id-first, the
    * deterministic truncation a tiered index uses for its head list).
    *
    * Shape: explode → distinct (term, doc) → ONE shuffle on term,
    * where a single window pass computes both df and the per-term
    * row_number cap. Per-term state is a counter, never a collected
    * list, so a hot term (df in the millions at 100 TB) streams
    * through instead of materializing its postings in one task; the
    * output is capped at |vocab| × maxPostings rows.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTerm = Window.partitionBy(col("term"))
    docs
      .select(explode(split(col("text"), " ")).as("term"), col("doc_id"))
      .filter(col("term") =!= "")
      .distinct()
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(byTerm.orderBy(col("doc_id"))))
      .filter(col("rn") <= maxPostings)
      .select(col("term"), col("df"), col("doc_id"))
  }
}

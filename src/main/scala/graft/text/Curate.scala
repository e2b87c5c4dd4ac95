package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs, as ONE declarative plan — language gate,
  * quality gate, exact dedup, and PII redaction, in that order, so a
  * user gets the whole flow from a single call instead of wiring the
  * stages (and their re-scans) by hand.
  */
object Curate {

  /** Curate `docs` down to the training-ready survivors.
    *
    * Stages (one plan, one pass + one dedup shuffle):
    *  1. language gate — pushdown-able scan filter on `lang`;
    *  2. quality gate — word count ≥ `minWords` and duplicate-word
    *     ratio ≤ `maxDupWordRatio`, both computed in the same scan
    *     projection (split bound once);
    *  3. exact dedup — keep the minimum doc_id per identical text via
    *     a window min, so the surviving ROW rides through without a
    *     self-join back to the corpus. The window partitions by the
    *     text itself (what the oracle can replay); at 100 TB partition
    *     by xxhash64(text) instead so the exchange carries an 8-byte
    *     key, and break the (astronomically rare) hash collision with
    *     a full-text tie check;
    *  4. PII redaction — a projection on the survivors only.
    *
    * Ordering matters for cost, not semantics: identical texts have
    * identical metrics, so filtering before the dedup shuffle only
    * shrinks what gets exchanged.
    */
  def curate(docs: DataFrame, langs: Seq[String], minWords: Int,
             maxDupWordRatio: Double): DataFrame = {
    val metrics = TextOps.bind(split(col("text"), " ")) { w =>
      struct(
        size(w).as("n_words"),
        (lit(1.0) - size(array_distinct(w)).cast("double") / size(w))
          .as("dup_word_ratio"))
    }
    docs
      .filter(col("lang").isin(langs: _*))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        metrics.as("m"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("m.n_words").as("n_words"),
        col("m.dup_word_ratio").as("dup_word_ratio"))
      .filter(col("n_words") >= minWords &&
        col("dup_word_ratio") <= maxDupWordRatio)
      .withColumn("_keep", min(col("doc_id")).over(Window.partitionBy(col("text"))))
      .filter(col("doc_id") === col("_keep"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_words"), col("dup_word_ratio"),
        TextOps.redactText(col("text")).as("text"))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of the documented 100 TB fetch-join story: the
  * candidate-verification joins in the MinHash sketch-then-verify and
  * banded-LSH embedding dedup paths run against BUCKETED corpus
  * tables with broadcast joins disabled, and (a) every shuffle join
  * keeps a shuffle-free bucketed side — the corpus is fetched
  * in-place, never reshuffled — and (b) the results are identical to
  * the plain (broadcastable) runs the oracle grades.
  *
  * This is the regime the in-code notes (Dedup.scala, Ann.scala)
  * prescribe for 100 TB, exercised rather than argued: at that scale
  * the corpus cannot broadcast, so the only viable plan is the
  * co-located bucket join this spec pins.
  */
class BucketedScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Every sort-merge join in `df`'s plan must have at least one side
    * whose subtree reaches a bucketed file scan with NO shuffle in
    * between — i.e. the bucketing, not an exchange, co-located it.
    */
  private def assertJoinsKeepBucketedSide(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan
    val joins = plan.collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, s"$what: expected sort-merge fetch joins, got:\n$plan")
    joins.foreach { j =>
      val ok = Seq(j.left, j.right).exists { side =>
        side.collectFirst { case e: ShuffleExchangeExec => e }.isEmpty &&
          side.collectFirst {
            case f: FileSourceScanExec if f.bucketedScan => f
          }.isDefined
      }
      assert(ok, s"$what: join reshuffles the corpus instead of using buckets:\n$j")
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Run `body` with broadcast joins off and AQE off (static plans so
    * the audit sees the join strategy the planner actually chose).
    */
  private def noBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("minhash sketch-then-verify fetches from a bucketed corpus without reshuffling it") {
    val dir = java.nio.file.Files.createTempDirectory("bk_minhash").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    try {
      docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", s"$dir/docs").saveAsTable("bk_docs")
      val expected = sortedRows(dedup.Dedup.minhashNearDupPairs(docs, 3, 0.8, 128, 32))
      noBroadcast {
        val pairs = dedup.Dedup.minhashNearDupPairs(spark.table("bk_docs"), 3, 0.8, 128, 32)
        assertJoinsKeepBucketedSide(pairs, "minhash verify")
        assert(sortedRows(pairs) == expected,
          "bucketed no-broadcast run diverges from the graded plain run")
        assert(expected.nonEmpty, "vacuous: corpus has no near-dup pairs at this SF")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_docs")
    }
  }

  test("banded-LSH embedding dedup fetches from a bucketed corpus without reshuffling it") {
    val dir = java.nio.file.Files.createTempDirectory("bk_embed").toString
    // the q_dedup_embed corpus: embeddings doubled with planted exact
    // duplicates, materialized here AS the bucketed table (at 100 TB
    // the corpus lives bucketed on disk; the union is how the graded
    // query plants its dups)
    val base = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val corpus = base.unionByName(
      base.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    try {
      corpus.write.bucketBy(8, "vec_id").sortBy("vec_id")
        .option("path", s"$dir/embs").saveAsTable("bk_embs")
      val expected = sortedRows(ann.Ann.bandedLshPairs(corpus, 64, 8, 8, 0.8))
      noBroadcast {
        val pairs = ann.Ann.bandedLshPairs(spark.table("bk_embs"), 64, 8, 8, 0.8)
        assertJoinsKeepBucketedSide(pairs, "embed verify")
        assert(sortedRows(pairs) == expected,
          "bucketed no-broadcast run diverges from the graded plain run")
        assert(expected.nonEmpty, "vacuous: no planted duplicate pairs found")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_embs")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native expressions registered as SQL functions + session-window
  * streaming sessionization.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("graft functions callable from SQL and equal to the Column API") {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(50).createOrReplaceTempView("docs_v")
    val viaSql = spark.sql("SELECT doc_id, simhash64(text) AS sig FROM docs_v")
    val viaCol = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), dedup.Dedup.simhash(col("text")).as("sig"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)

    Tables.embeddings(spark, sf).limit(20).createOrReplaceTempView("emb_v")
    val d = spark.sql("SELECT float_vec_dot(embedding, embedding) AS d FROM emb_v")
      .collect().map(_.getDouble(0))
    assert(d.forall(v => v > 0.0))
    val buckets = spark.sql("SELECT lsh_bucket(embedding, 64, 8) AS b FROM emb_v")
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 256))
    // 4-arg form: a plain INT seed literal must coerce, and a
    // different seed must pick a different hyperplane family
    val seeded = spark.sql("SELECT lsh_bucket(embedding, 64, 8, 7) AS b FROM emb_v")
      .collect().map(_.getLong(0))
    assert(seeded.toSeq != buckets.toSeq && seeded.forall(b => b >= 0 && b < 256))
    val idot = spark.sql("SELECT int_vec_dot(array(1, -2, 3), array(4, 5, 6)) AS d")
      .collect().head.getLong(0)
    assert(idot == 4L - 10L + 18L)
    val bands = spark.sql("SELECT minhash_bands(text, 3, 128, 32) AS b FROM docs_v")
      .collect().map(_.getSeq[Long](0))
    assert(bands.forall(_.length == 32))

    val nsh = spark.sql("SELECT size(shingle_hashes(text, 3)) AS n FROM docs_v")
      .collect().map(_.getInt(0))
    assert(nsh.forall(_ >= 1))
    val pairs = spark.sql("SELECT pair_combos(array(1L, 2L, 3L)) AS p")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val bs = spark.sql("SELECT byte_stats(encode('ab', 'UTF-8')) AS f")
      .collect().head.getSeq[Double](0)
    assert(bs == Seq(2.0, 97.5, 98.0, 97.0))
  }

  test("session_window batch agg groups like gap sessionization") {
    val ev = Tables.events(spark, sf)
    val viaWindow = streaming.EventStream.sessionWindowAgg(ev, "30 minutes")
    val viaLag = operators.Analytics.sessionize(ev, 1800L)
    assert(viaWindow.count() == viaLag.count(),
      "session_window and lag-based sessionization must find the same sessions")
  }

  test("session_window works as a stream") {
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("events_sw")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"), d.resolve("events.parquet"))
      d.toString
    }
    val stream = streaming.EventStream.readEventStream(spark, dir)
    val q = streaming.EventStream.sessionWindowAgg(stream, "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sw_agg").start()
    try {
      q.processAllAvailable()
      val batch = streaming.EventStream.sessionWindowAgg(Tables.events(spark, sf), "30 minutes")
      assert(spark.table("sw_agg").count() == batch.count())
    } finally q.stop()
  }

  test("PackedCharBag/FoldedBagDistance through a DataFrame projection " +
    "(whole-stage codegen) match the interpreted kernels") {
    import spark.implicits._
    import graft.functions.TextHashFunctions.{foldedBagDistance, packedCharBag}
    import graft.functions.{FoldedBagDistance, PackedCharBag}
    import org.apache.spark.sql.catalyst.expressions.Literal
    // real doc text (includes unicode/punctuation) so the generated
    // Java runs the same inputs the dedup prefilter sees
    val texts = Tables.documents(spark, sf).limit(40)
      .select(col("text")).as[String].collect().toSeq ++
      Seq("", "é𝕏é", "a" * 300)
    val pairs = texts.zipWithIndex.flatMap { case (a, i) =>
      texts.drop(i).take(3).map(b => (a, b)) }
    val viaCodegen = pairs.toDF("a", "b")
      .select(foldedBagDistance(packedCharBag(col("a")),
        packedCharBag(col("b"))).as("d"))
      .collect().map(_.getInt(0)).toSeq
    val viaEval = pairs.map { case (a, b) =>
      FoldedBagDistance.compute(
        PackedCharBag(Literal(a)).eval(null).asInstanceOf[Long],
        PackedCharBag(Literal(b)).eval(null).asInstanceOf[Long]) }
    assert(viaCodegen == viaEval)
  }
}

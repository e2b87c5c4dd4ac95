package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(text) ...")` works alongside the
  * Column API.
  *
  * Two paths: [[GraftExtensions]] is the SparkSessionExtensions hook
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`);
  * [[GraftFunctions.register]] injects into an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      info("float_vec_dot", "dot product of two float arrays, double accumulation"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))),
    ("int_vec_dot",
      info("int_vec_dot", "dot product of two int arrays, long accumulation"),
      (es: Seq[Expression]) => IntVecDot(es(0), es(1))),
    ("simhash64",
      info("simhash64", "64-bit simhash of whitespace-tokenized text"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("minhash_bands",
      info("minhash_bands", "minhash LSH band hashes: minhash_bands(text, n, numHashes, bands)"),
      (es: Seq[Expression]) => MinHashBands(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
        es(3).eval().asInstanceOf[Int])),
    ("lsh_bucket",
      info("lsh_bucket", "random-hyperplane LSH bucket: lsh_bucket(embedding, dims, bits[, seed])"),
      (es: Seq[Expression]) => LshBucket(es.head,
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
        // SQL integer literals arrive as INT; accept any integral seed
        if (es.length > 3) es(3).eval().asInstanceOf[Number].longValue() else 42L)),
    ("shingle_hashes",
      info("shingle_hashes", "distinct word n-gram shingle hashes: shingle_hashes(text, n)"),
      (es: Seq[Expression]) => ShingleHashes(es.head, es(1).eval().asInstanceOf[Int])),
    ("pair_combos",
      info("pair_combos", "all (i<j) id pairs of a long array as structs"),
      (es: Seq[Expression]) => PairCombos(es.head)),
    ("byte_stats",
      info("byte_stats", "[n_bytes, mean, max, min] feature vector of a binary payload"),
      (es: Seq[Expression]) => ByteStats(es.head)),
    ("image_meta",
      info("image_meta", "struct(format,width,height,bit_depth,channels) parsed from PNG/BMP/GIF/JPEG bytes, null if not an image"),
      (es: Seq[Expression]) => ImageMeta(es.head)),
    ("synthetic_image",
      info("synthetic_image", "deterministic header-valid image payload: synthetic_image(format, width, height)"),
      (es: Seq[Expression]) => SyntheticImage(es(0), es(1), es(2))),
    ("hll_sketch",
      info("hll_sketch", "mergeable HLL distinct-count registers: hll_sketch(value, p)"),
      (es: Seq[Expression]) => HllSketch(es.head,
        es(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression()),
    ("hll_merge",
      info("hll_merge", "register-max merge of hll_sketch binaries"),
      (es: Seq[Expression]) => HllMerge(es.head).toAggregateExpression()),
    ("hll_estimate",
      info("hll_estimate", "cardinality estimate of an hll_sketch binary"),
      (es: Seq[Expression]) => HllEstimate(es.head)),
    ("cms_sketch",
      info("cms_sketch", "mergeable Count-Min frequency counters: cms_sketch(value, depth, width)"),
      (es: Seq[Expression]) => CmsSketch(es.head,
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()),
    ("cms_merge",
      info("cms_merge", "element-wise sum merge of cms_sketch binaries"),
      (es: Seq[Expression]) => CmsMerge(es.head).toAggregateExpression()),
    ("cms_estimate",
      info("cms_estimate", "point frequency estimate: cms_estimate(sketch, key)"),
      (es: Seq[Expression]) => CmsEstimate(es(0), es(1))))

  /** Register all graft functions into an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

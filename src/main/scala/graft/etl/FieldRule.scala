package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's five field-source kinds (Partrans.py:142-208),
  * re-expressed as declarative Catalyst column rules instead of
  * Python `eval` over per-row strings.
  *
  *  - `constant` → [[Constant]]            (Partrans.py:159-160)
  *  - `filename` → [[FromFilename]]        (Partrans.py:145-149)
  *  - `tag`      → [[FromTag]]             (Partrans.py:151-157)
  *  - `column`   → [[Derived]]             (Partrans.py:162-172)
  *  - `lookup`   → [[Lookup]]              (Partrans.py:174-201)
  *
  * Every rule compiles to a `Column` (or a broadcast join for
  * lookups), so the whole field list stays inside whole-stage codegen
  * — the reference's row-at-a-time eval loop becomes a vectorized
  * projection.
  */
sealed trait FieldRule { def name: String }

/** Fixed value for every row. */
final case class Constant(name: String, value: Column) extends FieldRule

/** Value extracted from the input file name via a regex group
  * (the reference rewrites `arg1` to the basename and evals).
  */
final case class FromFilename(name: String, pattern: String, group: Int) extends FieldRule

/** Value extracted from the first raw line containing `tag`
  * (file-level header metadata propagated to every row). The raw
  * source materializes matching header lines per file; this rule
  * then parses the captured line.
  */
final case class FromTag(name: String, tag: String, parse: Column => Column) extends FieldRule

/** Row-wise expression over other columns (the reference's
  * `function(arg1..argN)` string-eval, now a Catalyst expression).
  */
final case class Derived(name: String, expr: Column) extends FieldRule

/** Join against a dimension view on `keys`, taking `valueCol` and
  * falling back to `default` on a miss (the reference evals a pandas
  * view lookup per row and catches exceptions to apply the default).
  */
final case class Lookup(name: String, view: DataFrame, keys: Seq[(String, String)],
                        valueCol: String, default: Column) extends FieldRule

object FieldRule {

  /** Apply a list of field rules to a DataFrame. Non-join rules fold
    * into a single projection; each lookup becomes one broadcast left
    * join + coalesce(default) — dimensions are small relative to the
    * feed, so the fact side never shuffles.
    */
  def applyAll(df: DataFrame, rules: Seq[FieldRule]): DataFrame =
    rules.foldLeft(df) { (acc, rule) =>
      rule match {
        case Constant(n, v)   => acc.withColumn(n, v)
        case Derived(n, e)    => acc.withColumn(n, e)
        case FromFilename(n, p, g) =>
          // the raw source captures `_file` per row; fall back to
          // input_file_name() only for single-source scans (it cannot
          // be evaluated after a join)
          val src = if (acc.columns.contains("_file")) col("_file") else input_file_name()
          acc.withColumn(n, regexp_extract(src, p, g))
        case FromTag(n, _, parse) =>
          // Raw source exposes the captured header line as `_tag_<name>`
          acc.withColumn(n, parse(col(s"_tag_$n")))
        case Lookup(n, view, keys, valueCol, default) =>
          val renamed = keys.foldLeft(view.select(
            (keys.map(_._2) :+ valueCol).distinct.map(col): _*)) {
            case (v, (factKey, dimKey)) => v.withColumnRenamed(dimKey, factKey)
          }
          val joined = acc.join(
            broadcast(renamed.withColumnRenamed(valueCol, s"_lk_$n")),
            keys.map(_._1), "left")
          joined.withColumn(n, coalesce(col(s"_lk_$n"), default)).drop(s"_lk_$n")
      }
    }
}

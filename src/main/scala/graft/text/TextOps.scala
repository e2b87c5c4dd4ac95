package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token
  * counting, quality scoring, language ID, and fingerprinting.
  * All pure builtin expressions (whole-stage codegen; no UDFs), so
  * they vectorize over a 100 TB documents table and push the `text`
  * column read down to parquet.
  */
object TextOps {

  /** BPE-ish tokenizer regex: letter runs, single digits, or single
    * non-alphanumeric marks (a cheap proxy for byte-pair behavior).
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  private val Stopwords = Seq("the", "a", "an", "of", "and", "in", "to", "is")
  private val StopwordPattern = "\\b(" + Stopwords.mkString("|") + ")\\b"

  /** Token counts: whitespace tokens + BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      regexp_count(col("text"), lit(BpeishPattern)).as("bpeish_tokens"),
      length(col("text")).as("n_chars"))

  /** Tokenizer fertility report: BPE-ish tokens per whitespace word,
    * rolled up per (lang, source) — the compression-quality metric a
    * tokenizer evaluation reads (fertility near 1 = the tokenizer
    * rarely splits words; high fertility = the language/source pays
    * more sequence length per word, which directly prices its
    * training compute). Pure per-row projections (both tokenizers
    * are codegen'd regex/split counts) into one map-side-combined
    * rollup; fertility is ONE division over exact BIGINT sums, so
    * the report grades bit-exact.
    */
  def fertilityReport(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        regexp_count(col("text"), lit(BpeishPattern)).cast("long").as("bpe"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpeish_tokens"))
      .withColumn("fertility",
        col("bpeish_tokens").cast("double") / col("ws_tokens"))

  /** Quality metrics: length, word count, stopword ratio, mean word
    * length — single-division doubles (IEEE-identical across engines).
    * `keep` carries extra input columns through (e.g. `source` for a
    * per-source rollup) so callers never re-scan and re-join the
    * corpus just to recover them.
    */
  def quality(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val nWords = size(split(col("text"), " "))
    val nStop = regexp_count(col("text"), lit(StopwordPattern))
    docs.select(
      col("doc_id") +:
        length(col("text")).as("n_chars") +:
        nWords.as("n_words") +:
        nStop.as("n_stopwords") +:
        (nStop.cast("double") / nWords).as("stopword_ratio") +:
        ((length(col("text")) - (nWords - lit(1))).cast("double") / nWords).as("mean_word_len") +:
        keep.map(col): _*)
  }

  /** Flesch-style readability per document: vowel-group runs proxy
    * syllables, `[.!?]+` runs close sentences (floored at 1 so
    * punctuation-free feeds stay defined), and the classic
    * 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word) score
    * is two single divisions and fixed-order double arithmetic —
    * IEEE-identical across engines. Pure scan projections; `keep`
    * carries grouping columns through for rollups.
    */
  def readability(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val nWords = size(split(col("text"), " "))
    val nSent = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+")))
    val nSyll = regexp_count(col("text"), lit("[aeiouyAEIOUY]+"))
    docs.select(
      col("doc_id") +:
        nWords.cast("long").as("n_words") +:
        nSent.cast("long").as("n_sentences") +:
        nSyll.cast("long").as("n_syllables") +:
        (lit(206.835)
          - lit(1.015) * (nWords.cast("double") / nSent)
          - lit(84.6) * (nSyll.cast("double") / nWords)).as("flesch") +:
        keep.map(col): _*)
  }

  /** Per-source readability-band profile: each doc lands in an
    * easy/standard/hard band by its Flesch score (band edges compare
    * the identical per-doc double, so banding is deterministic), and
    * the rollup is one map-side-combined count per (source, band) —
    * |sources|×3 rows out of any corpus size.
    */
  def readabilityBands(docs: DataFrame): DataFrame =
    readability(docs, keep = Seq("source"))
      .select(col("source"),
        when(col("flesch") >= 60.0, "easy")
          .when(col("flesch") >= 30.0, "standard")
          .otherwise("hard").as("band"))
      .groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"))

  /** Encoding-artifact QA per source: UTF-8-decoded-as-CP1252
    * mojibake markers (the 'Ã'/'Â' lead bytes every such double
    * decode produces), U+FFFD replacement chars (a decoder already
    * gave up), and C0 control characters that never belong in text.
    * All three are codegen'd regex counts in the scan projection;
    * the rollup is map-side combined to |sources| rows and the rate
    * is one double division. The screen a corpus ingest runs before
    * any tokenizer sees the bytes.
    */
  def encodingQa(docs: DataFrame): DataFrame = {
    val nMoji = regexp_count(col("text"), lit("[ÃÂ]"))
    val nRepl = regexp_count(col("text"), lit("�"))
    val nCtrl = regexp_count(col("text"),
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
    docs
      .select(col("source"), nMoji.cast("long").as("n_moji"),
        nRepl.cast("long").as("n_repl"), nCtrl.cast("long").as("n_ctrl"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_moji") + col("n_repl") + col("n_ctrl") > 0, 1L)
          .otherwise(0L)).as("n_flagged"),
        sum(col("n_moji")).as("mojibake_chars"),
        sum(col("n_repl")).as("replacement_chars"),
        sum(col("n_ctrl")).as("control_chars"))
      .withColumn("flagged_rate",
        col("n_flagged").cast("double") / col("n_docs"))
  }

  /** Language ID via stopword-profile scoring: count hits against a
    * tiny per-language function-word profile, predict the argmax with
    * a fixed tie-break order (en > es > de > fr > und).
    */
  def langId(docs: DataFrame): DataFrame = {
    def score(words: Seq[String]): Column =
      regexp_count(col("text"), lit("\\b(" + words.mkString("|") + ")\\b"))
    val sEn = score(Seq("the", "and", "of", "is", "a"))
    val sEs = score(Seq("el", "la", "de", "que", "y"))
    val sDe = score(Seq("der", "die", "und", "das", "ist"))
    val sFr = score(Seq("le", "la", "et", "les", "des"))
    docs.select(
      col("doc_id"), col("lang").as("true_lang"),
      sEn.as("s_en"), sEs.as("s_es"), sDe.as("s_de"), sFr.as("s_fr"))
      .withColumn("pred_lang",
        when(col("s_en") === 0 && col("s_es") === 0 && col("s_de") === 0 && col("s_fr") === 0, "und")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr"))
  }

  /** Language-ID confusion matrix: [[langId]]'s predictions against
    * the labeled `lang` column as (true, predicted) counts with
    * per-true-language recall — the QA gate for the heuristic
    * classifier (the D8 twin of `annRecall`/`blockingRecall`: every
    * heuristic component ships with the query that measures it).
    * One scan through the per-row scorer, a map-side-combined
    * rollup over the \|langs\|²-bounded key space, and the recall
    * denominator rides a window over that tiny aggregate.
    */
  def langConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(docs)
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_true",
        sum(col("n")).over(Window.partitionBy(col("true_lang"))))
      .withColumn("share_of_true",
        col("n").cast("double") / col("n_true"))
  }

  /** Evaluate `value` once and expose it to `body` as a lambda
    * variable — projection collapsing would otherwise inline an
    * expensive subexpression (like a split) into a HOF lambda, where
    * it re-evaluates per element.
    */
  private[text] def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Context-window chunking: split each document into word windows
    * of `chunkWords` with `overlap` words carried between adjacent
    * chunks (stride = chunkWords - overlap) — the sequence-prep step
    * ahead of tokenization. One row per (doc, chunk); empty docs
    * still produce their single (possibly short) chunk. Pure
    * projection + bounded explode: scales linearly, no shuffle.
    */
  def chunk(docs: DataFrame, chunkWords: Int, overlap: Int): DataFrame = {
    require(overlap < chunkWords, "overlap must be smaller than the window")
    val stride = chunkWords - overlap
    docs.select(col("doc_id"),
        posexplode(bind(split(col("text"), " ")) { words =>
          transform(
            sequence(lit(0),
              greatest(ceil((size(words) - overlap) / lit(stride.toDouble)).cast("int"), lit(1)) - 1),
            i => concat_ws(" ", slice(words, i * stride + 1, lit(chunkWords))))
        }))
      .select(col("doc_id"), col("pos").as("chunk_idx"), col("col").as("chunk"))
  }

  /** Deterministic corpus sampling: stable keep/drop per key
    * (`key mod 100 < pct`) — reproducible across runs and engines, no
    * rand(), and a pure scan-pushdown filter at any scale. For
    * clumpy keys, pre-hash the key (engine-specific → weaker oracle).
    */
  def sampleByKey(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(100)) < pct)

  /** Stream packing: concatenate each shard's token stream in stable
    * `orderCol` order and cut it at fixed `tokenBudget` boundaries;
    * each document is assigned to the pack its FIRST token lands in.
    * This is the deterministic window-expressible packing a training
    * pipeline uses to batch documents into context-sized sequences
    * (greedy next-fit needs a stateful scan and is not replayable in
    * SQL; offset-cut packing is, and wastes at most one document's
    * tokens per boundary).
    *
    * Scale: the only shuffle is the window partition on `shardCols` —
    * the caller's sharding contract. Pass columns that bound shard
    * size (e.g. (source, day) rather than source alone) so no single
    * window task sees an unbounded stream; packs are meaningful
    * per-shard, so sharding finer costs nothing semantically.
    */
  def pack(docs: DataFrame, shardCols: Seq[String], tokenBudget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardCols.nonEmpty, "packing needs a sharding contract")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id") +: shardCols.map(col) :+
        size(split(col("text"), " ")).cast("long").as("n_tokens"): _*)
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"start_offset div $tokenBudget"))
  }

  /** Stratified deterministic sampling: k rows per stratum, chosen by
    * the [[hashKey]] multiplicative-hash order over `keyCol`.
    *
    * The selection runs through the bounded-heap top-k aggregate:
    * partial heaps combine map-side and k rows per stratum cross the
    * shuffle — the row_number() window formulation would shuffle and
    * sort the entire corpus per stratum. Returns (strata..., key);
    * fetch payload columns by joining the (tiny) sample back against
    * the bucketed corpus.
    */
  /** The shared multiplicative-hash order key (Knuth 2654435761 mod
    * 2^32): exact long arithmetic both engines replay identically.
    * Requires key < ~2^31 to stay inside long range — larger keys
    * overflow the multiply (wrap in non-ANSI Spark, error in ANSI
    * and in DuckDB), so re-key or pre-mod first.
    */
  private def hashKey(keyCol: String) =
    pmod(col(keyCol) * lit(2654435761L), lit(4294967296L))

  def sampleStratified(df: DataFrame, strataCols: Seq[String], keyCol: String,
                       k: Int): DataFrame = {
    val hkey = hashKey(keyCol)
    df.select(strataCols.map(col) :+ hkey.as("hkey") :+
        col(keyCol).cast("long").as(keyCol): _*)
      .groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopKFunctions
        .topK(-col("hkey").cast("double"), col(keyCol), k).as("picks"))
      .select(strataCols.map(col) :+ explode(col("picks")).as("p"): _*)
      .select(strataCols.map(col) :+ col("p.tie").as(keyCol): _*)
  }

  /** Weighted mixture sampling: keep `weights(stratum)` percent of
    * each stratum (`defaultPct` for unlisted strata) — how a training
    * mix up- or down-weights its sources. Selection is the shared
    * [[hashKey]] mod 100, so it is deterministic, engine-replayable
    * (same key bound as [[hashKey]]), and uncorrelated with
    * `sampleByKey`'s plain key-mod. A pure scan filter: the weight
    * map compiles to a literal CASE, no join, fully pushdown-able.
    */
  def sampleWeighted(df: DataFrame, strataCol: String, keyCol: String,
                     weights: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = weights.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(strataCol) === s, p).otherwise(acc)
    }
    df.filter(pmod(hashKey(keyCol), lit(100)) < pct)
  }

  /** PII-ish redaction: emails, long digit runs (phone/account-ish),
    * and IPv4 literals replaced by typed placeholders — the scrub
    * pass a training corpus gets before packaging. Patterns stick to
    * syntax shared by Java regex and RE2 so the operation is
    * portable (and oracle-checkable).
    */
  def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), redactText(col("text")).as("text"))

  /** The redaction chain as a column expression, for composition. */
  /** One definition per PII class, shared by the redactor and the
    * surface report so the two can never disagree about what counts.
    */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRx = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val NumRx = "\\+?\\d[\\d() -]{6,}\\d"

  def redactText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRx, "<EMAIL>"),
        IpRx, "<IP>"),
      NumRx, "<NUM>")

  /** PII surface report per source: how much would the redactor
    * touch, per class — the measurement a governance review reads
    * BEFORE deciding redaction policy (D15 scrubs; this counts).
    * The same three class regexes as [[redactText]] (shared
    * constants — the report and the scrub cannot drift), counted as
    * codegen'd scan projections into one map-side-combined rollup;
    * rates are single divisions.
    */
  def piiReport(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        regexp_count(col("text"), lit(EmailRx)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(IpRx)).cast("long").as("n_ip"),
        regexp_count(col("text"), lit(NumRx)).cast("long").as("n_num"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_ip") + col("n_num") > 0, 1L)
          .otherwise(0L)).as("n_flagged"),
        sum(col("n_email")).as("emails"),
        sum(col("n_ip")).as("ips"),
        sum(col("n_num")).as("numbers"))
      .withColumn("flagged_rate",
        col("n_flagged").cast("double") / col("n_docs"))

  /** Deterministic document fingerprint: a rolling polynomial hash
    * mod p = 2^31-1 over per-word rolling character hashes. Two
    * documents with identical token streams get identical
    * fingerprints; order matters (unlike a bag-of-words hash).
    * Engine-portable by construction — every intermediate stays under
    * 2^39 so the same fold runs in any 64-bit-integer SQL engine
    * without wrap-around (the DuckDB oracle replays it exactly).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      aggregate(
        portableWordHashes(col("text")),
        lit(0L),
        (acc, h) => (acc * lit(131L) + h + lit(1L)) % FpP).as("fingerprint"))

  /** p = 2^31 − 1, the engine-portable hash modulus shared by the
    * fingerprint and winnowing families.
    */
  private[graft] val FpP = lit(2147483647L)

  /** Per-word portable rolling hashes of a document: each word folds
    * its characters through (h·127 + c) mod p — every intermediate
    * stays under 2^39, so the identical fold runs in any
    * 64-bit-integer SQL engine (the DuckDB oracles replay it).
    */
  private[graft] def portableWordHashes(text: Column): Column =
    transform(split(text, " "), w =>
      aggregate(
        filter(split(w, ""), ch => ch =!= ""),
        lit(0L),
        (h, ch) => (h * lit(127L) + ascii(ch).cast("long")) % FpP))

  /** Word n-gram strings of a document's word array: positions
    * 1..len-n+1, each joined with single spaces; empty when the
    * document is shorter than n. The `when` guard matters: Spark's
    * `sequence(1, 0)` counts DOWN (yielding [1,0]) instead of
    * returning empty, which would fabricate grams for short docs.
    */
  private def wordGrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Bottom-k minwise vocabulary sketches + the pairwise Jaccard
    * estimate between every two sources' bigram vocabularies — the
    * sketch-cost answer to "which sources share a vocabulary?"
    * (D25's exact overlap matrix scans every gram posting; this
    * moves k longs per source). Grams are portable rolling hashes
    * (the fingerprint family's fold, oracle-replayable); per source
    * the k SMALLEST distinct gram hashes form the sketch via the
    * bounded-heap aggregate (map-side combined — k rows per source
    * per partition cross the shuffle, never the vocabulary). The
    * estimator is the classic one-permutation bottom-k:
    * J ≈ |bottom_k(A ∪ B) ∩ A ∩ B| / |bottom_k(A ∪ B)| — one double
    * division; k_used < k flags sketches that captured a whole
    * (tiny) vocabulary, where the estimate is exact.
    */
  def vocabJaccardSketch(docs: DataFrame, k: Int = 32): DataFrame = {
    def bind(value: Column)(body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    val grams = bind(portableWordHashes(col("text"))) { h =>
      when(size(h) >= 2,
        transform(sequence(lit(1), size(h) - 1), i =>
          (element_at(h, i) * lit(131L) + element_at(h, i + 1)) % FpP))
        .otherwise(array().cast("array<bigint>"))
    }
    val sketches = docs
      .select(col("source"), explode(grams).as("gh"))
      .distinct()
      .groupBy(col("source"))
      .agg(sort_array(transform(
        graft.functions.TopKFunctions.topK(
          negate(col("gh").cast("double")), col("gh"), k),
        t => t.getField("tie"))).as("sk"))
    val a = sketches.select(col("source").as("source_a"), col("sk").as("ska"))
    val b = sketches.select(col("source").as("source_b"), col("sk").as("skb"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        bind(slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)) {
          uk =>
            bind(size(array_intersect(uk,
              array_intersect(col("ska"), col("skb"))))) { shared =>
              struct(size(uk).cast("long").as("k_used"),
                shared.cast("long").as("shared"),
                (shared.cast("double") / size(uk)).as("jaccard_est"))
            }
        }.as("r"))
      .select(col("source_a"), col("source_b"), col("r.k_used"),
        col("r.shared"), col("r.jaccard_est"))
  }

  /** Train a byte-pair-encoding merge table: `nMerges` rounds of
    * "count adjacent symbol pairs, merge the most frequent". The
    * scale design is the classic one — the corpus collapses ONCE to
    * the (word, count) vocabulary table and every round runs over
    * that dimension-sized state: one map-side-combined pair count,
    * a driver argmax of ONE row (freq desc, then pair asc — fully
    * deterministic), and a projection that rewrites the symbol
    * column. Merging uses the spaced-symbol string form with a
    * left-to-right non-overlapping regex replace, which IS the BPE
    * greedy convention ("a a a" merges to "aa a"). Returns
    * (rank, left, right, pair_count) — the artifact a tokenizer
    * ships. Rows-only by design (the oracle cannot replay an
    * iterative regex rewrite); the classic hand example is
    * spec-pinned.
    */
  def bpeTrain(docs: DataFrame, nMerges: Int): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1)
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      // spaced-symbol form: "hug" -> "h u g"
      .select(concat_ws(" ",
        filter(split(col("w"), ""), ch => ch =!= "")).as("s"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // bound split (no per-element re-split; see nextWordTable)
      val pairsArr = element_at(transform(array(split(col("s"), " ")), sy =>
        when(size(sy) >= 2,
          transform(sequence(lit(1), size(sy) - 1), i =>
            struct(element_at(sy, i).as("a"),
              element_at(sy, i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))), 1)
      val pairs = vocab
        .select(col("n"), explode(pairsArr).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(col("freq").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.head
        val (a, b, f) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((r + 1, a, b, f))
        val q = java.util.regex.Pattern.quote _
        vocab = graft.operators.IterState.roll(vocab
          .select(regexp_replace(col("s"),
            "(?<=^|\\s)" + q(a) + " " + q(b) + "(?=\\s|$)",
            // $ and \ in the replacement are regex metacharacters
            java.util.regex.Matcher.quoteReplacement(a + b)).as("s"), col("n")),
          prev = vocab)
        r += 1
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge table: each document's words rewrite
    * through the merges in rank order (a driver-held chain of
    * projections — the merge list is tokenizer-sized, never data),
    * then the report compares whitespace words to post-merge symbol
    * counts per source. `fertility` = symbols per word after
    * merging — the number a tokenizer evaluation actually tracks
    * as merges accumulate.
    */
  def bpeEncode(docs: DataFrame,
                merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val spacedWords = transform(
      filter(split(col("text"), " "), w => w =!= ""),
      w => concat_ws(" ", filter(split(w, ""), ch => ch =!= "")))
    val q = java.util.regex.Pattern.quote _
    val mergedWords = merges.sortBy(_._1).foldLeft(spacedWords) {
      case (acc, (_, a, b, _)) =>
        transform(acc, s => regexp_replace(s,
          "(?<=^|\\s)" + q(a) + " " + q(b) + "(?=\\s|$)",
          java.util.regex.Matcher.quoteReplacement(a + b)))
    }
    docs
      .select(col("source"),
        size(filter(split(col("text"), " "), w => w =!= ""))
          .cast("long").as("n_words"),
        aggregate(mergedWords, lit(0L),
          (acc, s) => acc + size(split(s, " "))).as("n_symbols"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_symbols")).as("n_symbols"))
      .withColumn("fertility",
        col("n_symbols").cast("double") / col("n_words"))
  }

  /** Word burstiness (Church–Gale): occurrences-per-containing-doc —
    * the lexical statistic that separates topical words (bursty:
    * when they appear, they appear repeatedly) from function words
    * (spread thin everywhere). One scan to per-(doc, word) counts,
    * one map-side rollup to the vocabulary table, burst = tf/df a
    * single division; `minDf` screens flukes and the top-k finishes
    * in TakeOrderedAndProject (burst desc, word asc).
    */
  def burstiness(docs: DataFrame, minDf: Long, topK: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf_doc")).as("tf"))
      .filter(col("df") >= minDf)
      .withColumn("burstiness", col("tf").cast("double") / col("df"))
      .orderBy(col("burstiness").desc, col("word"))
      .limit(topK)

  /** Borda rank-ensemble: combine several quality signals into one
    * robust ordering by SUMMING each document's rank under every
    * signal — rank aggregation is immune to the scale/outlier
    * problems of averaging raw scores (a single exploded score
    * cannot dominate; only orderings matter). Each signal costs one
    * window rank over the doc dimension with a deterministic id
    * tie-break; the final order is (borda asc, id asc). `signals`
    * maps name → (column, descending?).
    */
  def bordaEnsemble(df: DataFrame, idCol: String,
                    signals: Seq[(String, Column, Boolean)]): DataFrame = {
    // every rank is a RANGE-partitioned global row_number
    // (operators.GlobalRank), never an unpartitioned window — each
    // signal's rank used to move the whole doc dimension to ONE task
    val ranked = signals.foldLeft(df) { case (acc, (name, c, desc)) =>
      val ord = if (desc) Seq(c.desc, col(idCol)) else Seq(c.asc, col(idCol))
      graft.operators.GlobalRank.rowNumber(acc, ord, s"rank_$name")
    }
    val borda = signals.map(s => col(s"rank_${s._1}"))
      .reduce(_ + _)
    graft.operators.GlobalRank.rowNumber(
      ranked.withColumn("borda", borda),
      Seq(col("borda"), col(idCol)), "final_rank")
      .select(col(idCol) +: signals.map(s => col(s"rank_${s._1}")) :+
        col("borda") :+ col("final_rank"): _*)
  }

  /** Next-word suggestion table: top-k continuations per word with
    * conditional probability — the autocomplete / bigram-LM artifact.
    * The feed collapses to the (w1, w2) count table first (map-side
    * combined, vocab²-bounded), then the per-w1 total and the
    * deterministic (count desc, w2 asc) rank share one
    * vocabulary-sized window sort; prob is one division.
    */
  def nextWordTable(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bind the split ONCE — HOF lambdas have no runtime CSE, so an
    // unbound `words` would re-split the text per element access
    // (O(len²) per doc; 9× at the 10× soak before this bind)
    val pairsArr = element_at(transform(array(split(col("text"), " ")), w =>
      when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1), i =>
          struct(element_at(w, i).as("w1"),
            element_at(w, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))), 1)
    val pairs = docs
      .select(explode(pairsArr).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_pairs"))
    val w = Window.partitionBy(col("w1"))
    val ord = w.orderBy(col("n_pairs").desc, col("w2"))
    pairs
      .withColumn("rnk", row_number().over(ord))
      .withColumn("w1_total", sum(col("n_pairs")).over(w))
      .filter(col("rnk") <= k)
      .select(col("w1"), col("rnk").cast("long").as("rnk"), col("w2"),
        col("n_pairs"),
        (col("n_pairs").cast("double") / col("w1_total")).as("prob"))
  }

  /** Repetition / boilerplate quality metrics (the Gopher-rule
    * family): duplicate-word fraction, duplicate-bigram fraction, and
    * symbol-to-word ratio, plus the keep verdict a filtering pass
    * would apply. Pure per-row projection — no shuffle, scales
    * linearly, and the `text` read pushes down to parquet. Ratios are
    * single divisions (IEEE-identical across engines).
    */
  def repetition(docs: DataFrame,
                 maxDupWordRatio: Double = 0.6,
                 maxDupBigramRatio: Double = 0.4,
                 maxSymbolRatio: Double = 0.1): DataFrame = {
    val metrics = bind(split(col("text"), " ")) { w =>
      val nWords = size(w)
      val dupWord = lit(1.0) - size(array_distinct(w)).cast("double") / nWords
      val dupBigram = bind(wordGrams(w, 2)) { g =>
        when(size(g) > 0,
          lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
          .otherwise(lit(0.0))
      }
      struct(nWords.as("n_words"), dupWord.as("dup_word_ratio"),
        dupBigram.as("dup_bigram_ratio"))
    }
    docs.select(col("doc_id"), metrics.as("m"),
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).as("n_symbols"))
      .select(
        col("doc_id"),
        col("m.n_words").as("n_words"),
        col("m.dup_word_ratio").as("dup_word_ratio"),
        col("m.dup_bigram_ratio").as("dup_bigram_ratio"),
        (col("n_symbols").cast("double") / col("m.n_words")).as("symbol_ratio"))
      .withColumn("keep",
        (col("dup_word_ratio") <= maxDupWordRatio &&
          col("dup_bigram_ratio") <= maxDupBigramRatio &&
          col("symbol_ratio") <= maxSymbolRatio).cast("int"))
  }

  /** Corpus vocabulary: the k most frequent whitespace tokens with a
    * deterministic (count desc, word asc) tie-break. The plan is
    * explode → partial-agg count (map-side combine shrinks the
    * shuffle to the per-partition vocabulary) → TakeOrderedAndProject
    * (per-partition bounded heaps, k rows to the driver) — never a
    * full sort of the vocabulary.
    */
  def vocab(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word").asc)
      .limit(k)

  /** Per-document salient terms (keyword extraction): the top `k`
    * words by rarity-weighted term frequency tf · N / df — "this word
    * is frequent HERE and rare elsewhere", the tf-idf family with a
    * rational weight instead of `ln(N/df)` (transcendentals round
    * differently across math libraries; the rational weight ranks
    * identically for fixed tf and grades bit-exact: exact BIGINT
    * tf·N over df in ONE double division). Tie-break (score desc,
    * word asc) is total, so ranks are engine-deterministic.
    *
    * Plan: one explode pass feeds both aggregates — per-(doc, word)
    * counts and, reusing the same shuffle's output, the
    * vocabulary-sized df table, which broadcasts back alongside the
    * one-row corpus count. The rank window partitions by doc_id, so
    * its sort is per-document (bounded by document length), never a
    * corpus-wide order.
    */
  def keywords(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(broadcast(docFreq), "word")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("word"), col("tf"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    scored.withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("word"), col("tf"), col("score"))
  }

  /** Test-set decontamination: count, per corpus document, how many
    * distinct word n-grams it shares with a benchmark corpus — the
    * screen a training pipeline runs so eval data never leaks into
    * training data. Only contaminated documents return (n_hits >= 1);
    * anti-join the result against the corpus to drop them.
    *
    * Scale: each side's grams are deduped per document BEFORE the
    * join (array_distinct in-map, no extra shuffle), and the
    * benchmark side — eval sets are small by nature — broadcasts, so
    * the corpus never shuffles. For a benchmark too big to broadcast,
    * hash grams to longs ([[graft.functions.TextHashFunctions]]) and
    * shuffle-join on the 8-byte key instead of the string.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(bind(split(col("text"), " "))(w => array_distinct(wordGrams(w, n))))
        .as("gram"))
    grams(corpus)
      .join(broadcast(grams(benchmark).select("gram").distinct()), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Boilerplate n-gram mining: every word n-gram appearing in at
    * least `minDf` distinct documents — headers, footers, and license
    * blocks that repeat across a crawl and should be stripped before
    * training. Grams are deduped per document in-map
    * (array_distinct), so the shuffle carries each document's
    * distinct grams once and partial aggregation collapses repeats
    * map-side; at 100 TB hash grams to longs
    * ([[graft.functions.TextHashFunctions]]) so the 8-byte key
    * shuffles instead of the string.
    */
  def repeatedGrams(docs: DataFrame, n: Int, minDf: Int): DataFrame =
    docs.select(
        explode(bind(split(col("text"), " "))(w => array_distinct(wordGrams(w, n))))
          .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDf)

  /** Cross-source n-gram overlap matrix: for every pair of corpus
    * sources, how many distinct word n-grams they share — the
    * contamination / provenance-overlap report run before mixing
    * crawl snapshots into one training corpus (a high overlap means
    * one source republishes another).
    *
    * One corpus scan, no join: grams dedupe per document in-map, each
    * gram's source set builds through `collect_set` (partials bounded
    * by the source count, combined map-side), and the sorted set
    * expands to its (a < b) pairs IN-MAP after the one gram shuffle —
    * a gram shared by k sources costs k²/2 rows bounded by sources²,
    * never a join fan-out. The self-join alternative scans the corpus
    * twice and exchanges the full gram table per side. Output is
    * sources², a dimension-sized matrix; hash grams to 8-byte longs
    * at 100 TB like [[repeatedGrams]].
    */
  def sourceGramOverlap(docs0: DataFrame, n: Int): DataFrame = {
    val docs = graft.operators.Spread(docs0)
    docs.select(col("source"),
        explode(bind(split(col("text"), " "))(w => array_distinct(wordGrams(w, n))))
          .as("gram"))
      .groupBy(col("gram"))
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(bind(col("srcs")) { s =>
        flatten(transform(s, (a, i) =>
          transform(slice(s, i + lit(2), size(s)),
            b => struct(a.as("sa"), b.as("sb")))))
      }).as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Corpus-statistics fluency score — the LM-lite quality signal:
    * how much of a document is made of bigrams the corpus itself uses
    * often. Machine-generated noise, mangled encodings, and word-
    * salad spam score low; text drawn from the corpus's own
    * distribution scores high. This is the degenerate-but-cheap end
    * of the perplexity-filter family (a real LM filter ranks by
    * per-token log-loss; the hit-rate against the frequent-bigram set
    * needs no model and no floating-point transcendentals, so it
    * grades bit-identically across engines).
    *
    * Two corpus scans, BM25-shaped: scan 1 aggregates bigram document
    * frequencies map-side and keeps only the frequent head
    * (`commonDf`+), which is Zipf-bounded and broadcasts; scan 2
    * re-derives each document's bigrams and probes the broadcast set
    * — no row shuffle ever carries document text. At 100 TB hash
    * bigrams to 8-byte longs ([[graft.functions.TextHashFunctions]])
    * and, for an open vocabulary whose head outgrows a broadcast,
    * swap the probe to a shuffle join on the hash — the two-scan
    * shape is unchanged. Documents under two words have no bigrams
    * and drop out (both engines explode empty gram arrays to zero
    * rows).
    */
  def bigramFluency(docs: DataFrame, commonDf: Int): DataFrame = {
    def bigrams(d: DataFrame) = d.select(col("doc_id"),
      explode(bind(split(col("text"), " "))(w => wordGrams(w, 2))).as("bigram"))
    val hot = bigrams(docs)
      .groupBy(col("bigram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= commonDf)
      .select(col("bigram"), lit(1L).as("is_common"))
    bigrams(docs)
      .join(broadcast(hot), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("is_common"), lit(0L))).as("n_common"))
      .withColumn("common_ratio",
        col("n_common").cast("double") / col("n_bigrams"))
  }

  /** Percentile corpus filter: keep documents whose word count clears
    * the corpus-wide `quantile` (exact linear-interpolation
    * percentile, the same form DuckDB's quantile_cont computes). The
    * one-row threshold broadcasts back over a second scan — two scans
    * total; at 100 TB swap the exact percentile for approx_percentile
    * and the second scan stays identical.
    */
  def qualityFilter(docs: DataFrame, quantile: Double): DataFrame = {
    val counted = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_words"))
    val threshold = counted.agg(
      percentile(col("n_words"), lit(quantile)).as("thr"))
    counted.crossJoin(broadcast(threshold))
      .filter(col("n_words") >= col("thr"))
      .select(col("doc_id"), col("n_words"))
  }

  /** Per-source rank-percentile calibration: each document's length
    * score mapped to its percentile WITHIN its source — the
    * cross-source normalization a mixture sampler needs, because "top
    * 30% of crawl A" and "top 30% of curated B" are comparable where
    * raw scores are not. percent_rank over a TOTAL order (doc_id
    * breaks score ties) is the rational (rank-1)/(n-1), identical in
    * every engine — no float score distribution assumptions. One
    * shuffle on source; at 100 TB pre-bucket by source and the sort
    * is partition-local.
    */
  def percentRankBySource(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))))
  }

  /** Text canonicalization: lowercase, non-alphanumerics to spaces,
    * whitespace collapsed, ends trimmed — the normalization pass that
    * runs BEFORE hashing so that trivially-reformatted copies (case,
    * punctuation, spacing) collapse to one canonical form. Pure
    * codegen projection (engine-portable regex classes only).
    */
  def canonicalize(docs: DataFrame): DataFrame =
    docs.withColumn("canon_text",
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))

  /** Canonical exact dedup: one survivor (min doc_id) per canonical
    * form, with the variant count — catches the case/punctuation
    * variants plain exact dedup misses while staying a single
    * map-side-combined groupBy. At 100 TB group on
    * xxhash64(canon_text) so the shuffle key is 8 bytes, exactly as
    * [[graft.dedup.Dedup.exact]] does.
    */
  def canonicalDedup(docs: DataFrame): DataFrame =
    canonicalize(docs)
      .groupBy(col("canon_text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("n_variants"), col("canon_text"))

  /** Lexical diversity per document: type-token ratio and the
    * Gini-Simpson index — the quality family's "is this text varied
    * or degenerate repetition" signal, complementing the Gopher
    * duplicate-fraction rules with a proper diversity statistic.
    * Both are RATIONAL (integer counts, one final division), so they
    * grade bit-identically across engines — deliberately chosen over
    * Shannon entropy, whose per-term transcendental log rounds
    * differently between math libraries.
    *
    * One scan → per-(doc, word) partial-agg count → per-doc
    * collapse; everything map-side combines and output is one row
    * per document. Singleton docs have no pair to sample, so
    * `simpson` is null there by definition.
    */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("n") * (col("n") - 1)).as("rep"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        when(col("n_tokens") > 1,
          lit(1.0) - col("rep").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1))).as("simpson"))

  /** Passage-level dedup (CCNet-style repeated-passage removal):
    * documents split into disjoint `chunkWords`-word passages; any
    * passage occurring more than `maxDf` times corpus-wide (nav
    * chrome, license blocks, templated headers) is cut from EVERY
    * document, and the survivors re-join into the cleaned text — a
    * rewrite, unlike [[repeatedGrams]] which only reports offenders.
    *
    * One chunk explode feeds both sides: the duplicated-passage set
    * is a partial-agg count + filter whose output is bounded by how
    * much text actually repeats (the Zipf head again), so it
    * broadcasts, and the per-passage verdict is a broadcast left
    * join — document text crosses exactly one shuffle (the per-doc
    * regroup), already chunk-sized. Reassembly is in-map: sort the
    * collected (idx, chunk) structs, filter the hot ones, join with
    * spaces. At 100 TB count df on xxhash64(chunk) so the count
    * shuffle carries 8-byte keys, and spill-bound the regroup by
    * sharding doc_id — passage order is restored by idx, not input
    * order.
    */
  /** Length-bucketed batching stats — the padding-efficiency report a
    * training loader runs before choosing batch shapes: documents
    * bucket by whitespace-token count into `bucketWidth`-token bins,
    * and each bin reports how many tokens a pad-to-bin-edge batcher
    * would actually train on. Pure projection + one map-side-combined
    * aggregation (|buckets| rows out), so it runs at corpus scale for
    * the cost of a scan; pad_efficiency is ONE double division
    * (IEEE-identical across engines).
    */
  def lengthBuckets(docs: DataFrame, bucketWidth: Int): DataFrame =
    docs
      .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .select(col("n_tokens"),
        (expr(s"(n_tokens + ${bucketWidth - 1}) div $bucketWidth")
          * bucketWidth).as("padded_len"))
      .groupBy(col("padded_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .select(col("padded_len"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("padded_len")).as("padded_tokens"),
        (col("sum_tokens").cast("double") /
          (col("n_docs") * col("padded_len"))).as("pad_efficiency"))

  /** Token-budget mixture plan — the sampling table a multi-source
    * training mix is built from: each source's available tokens, its
    * mixture weight, the tokens the budget allots it, and the
    * resulting sampling rate / epoch factor (>1 means the source
    * repeats). The per-source aggregate is one map-side-combined pass;
    * the weight normalizer is a ONE-ROW broadcast cross (the bounded
    * build-side pattern PLANS.md documents), so nothing here grows
    * with the corpus except the first scan. Weights here derive
    * deterministically from the source name (1 + len(source) mod 3) so
    * the whole plan — floor, least, two divisions — replays bit-exact
    * in any engine without shipping a weight table.
    */
  def mixturePlan(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val perSource = docs
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("avail_tokens"))
      .withColumn("weight_raw",
        (length(col("source")) % 3 + 1).cast("long"))
    val totals = perSource.agg(sum(col("weight_raw")).as("total_w"))
    perSource
      .join(broadcast(totals))
      .withColumn("target_tokens",
        floor(col("weight_raw").cast("double") / col("total_w")
          * budgetTokens).cast("long"))
      .select(col("source"), col("avail_tokens"), col("weight_raw"),
        col("target_tokens"),
        least(col("target_tokens"), col("avail_tokens")).as("planned_tokens"),
        (least(col("target_tokens"), col("avail_tokens")).cast("double") /
          col("avail_tokens")).as("sampling_rate"),
        (col("target_tokens").cast("double") /
          col("avail_tokens")).as("epochs"))
  }

  /** Temperature-scaled mixture weights (the multilingual α-sampling
    * standard, α = 0.5): sampling probability ∝ tokens^α flattens the
    * head so low-resource sources aren't drowned — the mT5/XLM-R
    * recipe. Weights are FIXED-POINT: floor(sqrt(tokens)·1000) as
    * BIGINT (sqrt is correctly-rounded IEEE, floor is exact), so the
    * normalizer is an integer sum — order-independent where a double
    * Σ sqrt would drift with partition/merge order and break
    * engine-exactness. One per-source agg, a one-row broadcast
    * normalizer, dimension-sized output — [[mixturePlan]]'s shape with
    * a principled weight.
    */
  def mixtureTemperature(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val perSource = docs
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("avail_tokens"))
      .withColumn("w",
        floor(sqrt(col("avail_tokens").cast("double")) * 1000).cast("long"))
    val totals = perSource.agg(sum(col("w")).as("total_w"))
    perSource
      .join(broadcast(totals))
      .withColumn("p", col("w").cast("double") / col("total_w"))
      .withColumn("target_tokens",
        floor(col("p") * budgetTokens).cast("long"))
      .withColumn("upsample",
        col("target_tokens").cast("double") / col("avail_tokens"))
      .drop("total_w")
  }

  def passageDedup(docs: DataFrame, chunkWords: Int, maxDf: Int): DataFrame = {
    val chunks = docs.select(col("doc_id"),
      posexplode(bind(split(col("text"), " ")) { w =>
        transform(sequence(lit(0),
            floor((size(w) - lit(1)) / lit(chunkWords)).cast("int")),
          i => concat_ws(" ", slice(w, i * chunkWords + 1, lit(chunkWords))))
      }))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val hot = chunks
      .groupBy(col("chunk")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > maxDf)
      .select(col("chunk"), lit(1L).as("is_hot"))
    chunks
      .join(broadcast(hot), Seq("chunk"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(coalesce(col("is_hot"), lit(0L))).as("n_dropped"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(
                col("chunk_idx"), col("chunk"),
                coalesce(col("is_hot"), lit(0L)).as("hot")))),
              s => s.getField("hot") === 0),
            s => s.getField("chunk")),
          " ").as("clean_text"))
  }

  /** Deterministic train/val/test split assignment: bucket =
    * multiplicative hash mod 100, split by cumulative percentage
    * thresholds. Hash-based (not key-mod) so the split is
    * uncorrelated with id assignment order, and deterministic so
    * every pipeline run — and every engine — lands each document in
    * the SAME split (rand() splits silently leak val docs into train
    * on re-runs). Pure pushdown-able projection: no shuffle, no join,
    * scales as the scan.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  trainPct: Int, valPct: Int): DataFrame = {
    val bucket = pmod(hashKey(keyCol), lit(100))
    df.select(col(keyCol), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Epoch-seeded deterministic shuffle into training shards: each
    * epoch gets an independent pseudo-random permutation (the epoch
    * offsets the key through a second odd multiplier before the
    * shared multiplicative hash), rows land in `nShards` shards by
    * hash range, and the within-shard order is the hash order. A
    * training job reads shards in id order and rows in
    * (shard, pos_in_shard) order and sees a reshuffled corpus every
    * epoch — with zero RNG state, so any shard is reproducible in
    * isolation. Scale: the only window partitions by (epoch, shard)
    * — shard count grows with the corpus, so partitions stay bounded;
    * a single global row_number would funnel each epoch through ONE
    * partition, which this formulation exists to avoid.
    */
  def shuffleShards(df: DataFrame, keyCol: String,
                    epochs: Int, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hkey = pmod(
      (col(keyCol) + col("epoch") * lit(1000003L)) * lit(2654435761L),
      lit(4294967296L))
    val byShard = Window.partitionBy(col("epoch"), col("shard_id"))
      .orderBy(col("hkey"), col(keyCol))
    df.select(col(keyCol).cast("long").as(keyCol))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("hkey", hkey)
      .withColumn("shard_id", pmod(col("hkey"), lit(nShards.toLong)))
      .withColumn("pos_in_shard", row_number().over(byShard))
      .select(col("epoch"), col("shard_id"), col("pos_in_shard"),
        col(keyCol), col("hkey"))
  }

  /** Per-document n-gram novelty: the fraction of a document's
    * distinct word n-grams that appear in NO other document (df = 1)
    * — high novelty marks fresh content worth keeping or
    * memorization-risk outliers worth auditing; low novelty marks
    * template text the dedup family should have caught. One explode
    * pass (grams deduped per doc in-map) feeds the df aggregation;
    * the vocabulary-sized df table joins back on the gram key — at
    * 100 TB hash grams to longs ([[graft.functions.TextHashFunctions]])
    * so the 8-byte key shuffles instead of the string, same note as
    * [[repeatedGrams]].
    */
  def novelty(docs0: DataFrame, n: Int): DataFrame = {
    val docs = graft.operators.Spread(docs0)
    val grams = docs.select(col("doc_id"),
      explode(bind(split(col("text"), " "))(w => array_distinct(wordGrams(w, n))))
        .as("gram"))
    val df = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("gram_df"))
    grams.join(df, "gram")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("gram_df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams"))
  }

  /** Template-family mining by shared head: documents opening with
    * the SAME first `prefixWords` words are almost always instances
    * of one template (auto-generated reports, scraped boilerplate
    * pages, form letters) even when their tails diverge enough to
    * defeat whole-doc near-dup thresholds. One map-side-combined
    * group on the prefix; only families with ≥ 2 members survive.
    * Reports the family size, how many sources it spans (a
    * cross-source template is syndication/spam, not coincidence) and
    * the smallest member id as the canonical example.
    *
    * Scale: the group key is the prefix string here for oracle
    * transparency — at 100 TB hash it to a long
    * ([[graft.functions.TextHashFunctions]]) so 8 bytes shuffle per
    * doc, same note as [[repeatedGrams]]; output is
    * families-with-duplicates-sized.
    */
  def templateFamilies(docs: DataFrame, prefixWords: Int): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, prefixWords))
          .as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_docs") >= 2)

  /** Dataset card: the one-row corpus summary a dataset release
    * ships with — document/source/language counts, token totals,
    * exact median length, and the exact-duplicate rate. Two passes,
    * both fully map-side-combinable: one scan-level aggregate over
    * per-row projections, and one text-keyed group for the dup rate
    * (the [[graft.dedup.Dedup.exact]] key), their one-row results
    * cross-joined. Every number is exact; the only doubles are two
    * final divisions and the interpolated median (B9 parity).
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).as("n_words"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"),
        count_distinct(col("lang")).as("n_langs"),
        sum(col("n_words")).cast("long").as("total_words"),
        percentile(col("n_words"), lit(0.5)).as("p50_words"))
      .withColumn("mean_words",
        col("total_words").cast("double") / col("n_docs"))
    val dups = docs.groupBy(col("text"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L))
        .cast("long").as("n_dup_docs"))
    base.crossJoin(broadcast(dups))
      .withColumn("dup_rate",
        col("n_dup_docs").cast("double") / col("n_docs"))
  }

  /** Cross-source quantile normalization: each document's score is
    * replaced by the POOLED score at the same within-source quantile
    * — the strong form of [[percentRankBySource]]'s calibration
    * (identical-distribution output, not just comparable ranks; the
    * microarray-style quantile normalization applied to corpus
    * scores). Exact and engine-deterministic: within-source rank and
    * pooled rank both order by (score, doc_id), and the mapping is
    * pure integer arithmetic — ceil(rank·N_pool/N_src) — joined
    * against the pooled rank table, no interpolation, no floats
    * until never. The pooled rank is ONE global sort of the
    * corpus-sized (score, doc_id) projection — the same discipline as
    * decile/zorder: exact form is the oracle shape; at open scale
    * swap the pooled table for `approx_percentile` cut points at,
    * say, 10⁴ grid quantiles and keep everything else unchanged.
    */
  def quantileNormalize(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = docs.select(col("doc_id"), col("source"),
      col("n_chars").cast("long").as("score"))
    val ranked = s
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("score"), col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
    // pooled rank: range-partitioned global row_number — the pooled
    // sort is corpus-sized, the one place this operator must not
    // funnel to a single task (operators.GlobalRank, r12 verdict)
    val pooled = graft.operators.GlobalRank.rowNumber(
      s.select(col("score").as("pool_score"), col("doc_id")),
      Seq(col("pool_score"), col("doc_id")), "prk")
      .drop("doc_id")
    val nPool = s.agg(count(lit(1)).as("n_pool"))
    ranked
      .crossJoin(broadcast(nPool))
      .withColumn("target",
        expr("(rk * n_pool + n_src - 1) div n_src"))
      .join(pooled, col("prk") === col("target"))
      .select(col("doc_id"), col("source"), col("score"),
        col("pool_score").as("norm_score"))
  }

  /** Vocabulary growth curve (the Heaps-law profile): cumulative
    * distinct word n-grams after each `bucket`-document prefix of the
    * corpus, in doc_id (ingestion) order — the dataset-size planning
    * curve ("how much new text does the next crawl actually add?").
    * Each gram collapses to its FIRST document in one
    * map-side-combined min-agg (never a cumulative-distinct window,
    * which cannot partial-aggregate); the bucket histogram and one
    * running sum over the |buckets|-sized table finish the job. At
    * 100 TB hash grams to 8-byte longs before the min-agg, same note
    * as [[novelty]].
    */
  def vocabGrowth(docs: DataFrame, n: Int, bucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstDoc = docs.select(col("doc_id"),
        explode(bind(split(col("text"), " "))(w =>
          array_distinct(wordGrams(w, n)))).as("gram"))
      .groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    firstDoc
      .groupBy(expr(s"first_doc div $bucket").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("vocab_cum", sum(col("n_new")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** BPE merge-step candidate table: adjacent character-pair
    * frequencies within words — the count a byte-pair-encoding
    * tokenizer trainer computes each merge round (the most frequent
    * pair becomes the next merge). One explode pass, map-side-combined
    * counts over a symbol²-bounded key space, and the top-N finishes
    * through TakeOrderedAndProject (a bounded heap per partition,
    * never a full sort — pair cardinality is alphabet², tiny, but the
    * pre-agg row count is corpus-sized). Ordering (n desc, pair asc)
    * is total, so the cut is engine-deterministic.
    */
  def bpePairs(docs: DataFrame, topN: Int): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(bind(col("w"))(w =>
        transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2)))))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topN)

  /** Per-source Pearson correlation between two integer document
    * features (here words vs chars) — the corpus diagnostic behind
    * "is length a proxy for this score?". All five moments accumulate
    * as exact BIGINTs (order-independent), and the final r is one
    * fixed-shape double expression over them — sqrt and divide are
    * correctly-rounded IEEE, so the statistic grades bit-exact where
    * a running-covariance formulation would drift with partition
    * order. One map-side-combined aggregation, |sources| rows out.
    */
  def featureCorr(docs: DataFrame): DataFrame = {
    val x = size(split(col("text"), " ")).cast("long")
    val y = length(col("text")).cast("long")
    docs
      .select(col("source"), x.as("x"), y.as("y"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("r",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
  }

  /** Weak-supervision labeling (the Snorkel pattern): each rule is a
    * boolean vote condition for a label (a rule that doesn't fire
    * abstains), votes aggregate per label, and the final label is the
    * majority with a deterministic tie-break (lexicographically
    * smallest among the tied) — `unlabeled` when every rule abstains.
    * Pure per-row projection over a literal rule set: no shuffle, no
    * join, scales as the scan; the argmax rides an `array_sort` of
    * (−count, label) structs, so ranking is engine-replayable.
    * Output: one `c_<label>` vote count per label, total votes, the
    * label, and confidence = winning votes / total votes.
    */
  def weakLabels(docs: DataFrame, rules: Seq[(Column, String)]): DataFrame = {
    require(rules.nonEmpty, "weakLabels needs at least one rule")
    val labels = rules.map(_._2).distinct.sorted
    val cntCols = labels.map { l =>
      rules.collect { case (c, `l`) => when(c, 1).otherwise(0) }
        .reduce(_ + _).as(s"c_$l")
    }
    val base = docs.select(col("doc_id") +: cntCols: _*)
    val best = element_at(array_sort(array(labels.map(l =>
      struct((-col(s"c_$l")).as("neg"), lit(l).as("lab"))): _*)), 1)
    base
      .withColumn("n_votes", labels.map(l => col(s"c_$l")).reduce(_ + _))
      .withColumn("label",
        when(col("n_votes") === 0, lit("unlabeled"))
          .otherwise(best.getField("lab")))
      .withColumn("confidence",
        when(col("n_votes") === 0, lit(null).cast("double"))
          .otherwise((-best.getField("neg")).cast("double") / col("n_votes")))
  }
}

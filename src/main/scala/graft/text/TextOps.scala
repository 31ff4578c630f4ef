package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language id, fingerprinting. All built on
  * codegen'd built-ins (split/transform/aggregate/filter) — no UDFs — so the
  * whole stage stays inside whole-stage codegen and scales linearly with a
  * plain scan at 100 TB (no shuffle at all: every metric is per-row).
  */
object TextOps {

  /** Whitespace tokenization. The split class is the explicit
    * [ \t\n\f\r] rather than \s: Java's \s includes vertical tab while
    * RE2's (DuckDB's regexp_split_to_array) does not, so an explicit class
    * is the only split contract that is bit-exact on every engine. Must
    * stay in lockstep with BpeMatcher.isWs / GopherNgramStats.isWs.
    */
  def tokens(text: Column): Column = split(trim(text), "[ \\t\\n\\f\\r]+")

  /** FALLBACK subword estimate (~4 chars per token plus word boundaries) for
    * when no merges vocab is available. Superseded by [[bpeCount]] — the real
    * vocab-driven tokenizer — for every budget decision (tx8 packing, sp4
    * mixing); kept because a chars/4 estimate needs zero configuration.
    */
  def approxBpeCount(text: Column): Column =
    (size(tokens(text)) + ceil(length(text).cast("double") / 4.0).cast("int")).cast("long")

  /** Real subword token count (tx3b): greedy longest-match merging against
    * the [[Bpe.mergesDefault]] vocab, fused into one codegen'd per-row loop
    * ([[graft.functions.BpeTokenCount]]) — no explode, no shuffle, ≤ maxLen
    * hash probes per consumed token at scan speed.
    */
  def bpeCount(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BpeTokenCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), Bpe.mergesDefault))

  /** Per-language stopword heads (tiny, embedded; a real pipeline would
    * broadcast a lexicon table instead — same plan shape).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "que", "los", "las", "un"),
    "de" -> Seq("der", "die", "das", "und", "in", "ist", "zu", "den", "von", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "en", "est", "que", "les", "un", "une"))

  /** Fraction of tokens found in `words` (language-id scoring primitive). */
  def tokenRatio(toks: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(wordArr, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** N-gram heuristic language id: argmax of stopword ratios, UNKNOWN when
    * no evidence. Deterministic tie-break by language code.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(tokenRatio(toks, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown"))
  }

  /** Quality score in [0,1]: length band + lexical diversity + stopword
    * presence (ref-style heuristics: length/punct/stopword ratios).
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(lower(t))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_chars_measured", length(t).cast("long"))
      .withColumn("avg_token_len",
        (length(t).cast("double") / greatest(size(toks), lit(1)).cast("double")))
      .withColumn("distinct_token_ratio",
        size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1)).cast("double"))
      .withColumn("stopword_ratio", tokenRatio(toks, stopwords("en")))
      .withColumn("quality_score",
        round(
          when(col("n_tokens") >= 10 && col("n_tokens") <= 1000, lit(0.4)).otherwise(lit(0.0)) +
            col("distinct_token_ratio") * 0.4 +
            when(col("stopword_ratio") > 0.0, lit(0.2)).otherwise(lit(0.0)),
          4))
  }

  /** tx12: Unicode NFC canonicalization via the native codegen'd
    * [[graft.functions.NfcNormalize]] — one byte form per grapheme before
    * hashing/dedup/tokenization. Per-row, no shuffle, no UDF.
    */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NfcNormalize(ColumnBridge.expression(c)))
  }

  /** tx11: overlapping token-window chunking — the retrieval/embedding prep
    * step that splits a document into windows of `winLen` tokens advancing
    * by `stride` (< winLen ⇒ consecutive chunks overlap by winLen − stride
    * tokens, so no boundary context is lost). Chunk count is
    * 1 + ⌈max(n − winLen, 0) / stride⌉ — every token is covered and only
    * the last chunk may run short. Pure per-row transform + posexplode: no
    * shuffle, output row count ≈ n/stride per doc. All-integer offset
    * arithmetic (`div`, not double division) so the layout reproduces
    * bit-for-bit in any engine at any document length.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      winLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && winLen >= stride, "need 0 < stride <= winLen")
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__ov", greatest(size(col("__toks")) - winLen, lit(0)) + lit(stride - 1))
      .withColumn("__mx", expr(s"__ov div $stride"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__mx")),
          g => concat_ws(" ", slice(col("__toks"), g * stride + 1, lit(winLen)))))
          .as(Seq("__pos", "chunk_text")))
      .select(col(idCol), col("__pos").cast("long").as("chunk_id"),
        col("chunk_text"),
        size(tokens(col("chunk_text"))).cast("long").as("chunk_tokens"))
  }

  /** Gopher-rule document filters (Rae et al. 2021 §A1.1 — the standard
    * pre-dedup format/repetition heuristics of a pretraining corpus
    * pipeline): word-count window, mean word length window, symbol-to-word
    * ratio, bullet-/ellipsis-line fractions, alphabetic-word fraction.
    * Every metric is built from integer counts and ratios divide those
    * integers, so the arithmetic reproduces bit-for-bit in any engine —
    * the property the oracle harness hashes. Per-row, no shuffle.
    */
  def gopherFlags(df: DataFrame, textCol: String): DataFrame = {
    // The per-row metrics below are compute-dense (tokenize + several
    // regex passes per document); over a single-row-group parquet scan
    // (1 task, unsplittable) the whole corpus is scored serially (r19
    // profile of tx20b: a 2.0 s single-task stage). The stats-gated
    // spread parallelizes the projection and is a no-op at real scale or
    // on streaming inputs (whose stats read as unbounded).
    val src = if (df.isStreaming) df else graft.ops.Scan.spreadIfStarved(df)
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = greatest(size(toks), lit(1)).cast("double")
    val charSum = aggregate(toks, lit(0), (acc, x) => acc + length(x)).cast("double")
    val hashCount = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipsisCount =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val alphaWords = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    // explicit whitespace class (not \s) for RE2/Java parity — see tokens()
    val bulletLines = size(filter(lines, l => l.rlike("^[ \\t\\n\\f\\r]*[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.rlike("\\.\\.\\.[ \\t\\n\\f\\r]*$"))).cast("long")
    src.withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_word_len", charSum / nWords)
      .withColumn("symbol_ratio", (hashCount + ellipsisCount).cast("double") / nWords)
      .withColumn("alpha_word_ratio", alphaWords.cast("double") / nWords)
      .withColumn("bullet_line_ratio", bulletLines.cast("double") / nLines)
      .withColumn("ellipsis_line_ratio", ellipsisLines.cast("double") / nLines)
      .withColumn("word_count_ok", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("mean_word_len_ok", col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("symbol_ratio_ok", col("symbol_ratio") <= 0.1)
      .withColumn("alpha_ok", col("alpha_word_ratio") >= 0.8)
      .withColumn("bullet_ok", col("bullet_line_ratio") <= 0.9)
      .withColumn("ellipsis_ok", col("ellipsis_line_ratio") <= 0.3)
      .withColumn("gopher_pass",
        col("word_count_ok") && col("mean_word_len_ok") && col("symbol_ratio_ok") &&
          col("alpha_ok") && col("bullet_ok") && col("ellipsis_ok"))
  }

  /** Repetition filters (the other half of the Gopher rules): fraction of
    * duplicate lines and duplicate paragraphs within a document. Repetitive
    * boilerplate (headers, nav bars, spam) shows up as the same line
    * repeated; ≤0.3 is the published keep-threshold for both. Integer
    * counts + integer-ratio divisions, per-row, no shuffle.
    */
  def repetitionFlags(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val paras = split(t, "\n\n")
    val nParas = greatest(size(paras), lit(1)).cast("double")
    df.withColumn("dup_line_ratio",
        (size(lines) - size(array_distinct(lines))).cast("double") / nLines)
      .withColumn("dup_para_ratio",
        (size(paras) - size(array_distinct(paras))).cast("double") / nParas)
      .withColumn("dup_line_ok", col("dup_line_ratio") <= 0.3)
      .withColumn("dup_para_ok", col("dup_para_ratio") <= 0.3)
      .withColumn("repetition_pass", col("dup_line_ok") && col("dup_para_ok"))
  }

  /** tx7b thresholds (Rae et al. 2021 §A1.1, Table A1): top-n-gram char
    * fraction caps for n = 2..4 and duplicate-n-gram char fraction caps for
    * n = 5..10 — the published Gopher keep-gates.
    */
  val ngramThresholds: Seq[(String, Double)] = Seq(
    "top2" -> 0.20, "top3" -> 0.18, "top4" -> 0.16,
    "dup5" -> 0.15, "dup6" -> 0.14, "dup7" -> 0.13,
    "dup8" -> 0.12, "dup9" -> 0.11, "dup10" -> 0.10)

  /** Gopher n-gram repetition rules (tx7b): per-document top-n-gram and
    * duplicate-n-gram character fractions vs the published thresholds. All
    * nine statistics come from ONE fused pass per row
    * ([[graft.functions.GopherNgramStats]] — integer numerators, exact
    * cross-engine ratios), map-side, no shuffle.
    */
  def ngramRepetitionFlags(df: DataFrame, textCol: String): DataFrame = {
    val stats = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.GopherNgramStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol))))
    val withG = df.withColumn("__g", stats)
    val tc = greatest(col("__g.total_chars"), lit(1L)).cast("double")
    val withRatios = ngramThresholds.foldLeft(withG) { case (d, (f, th)) =>
      d.withColumn(s"${f}_ratio", col(s"__g.$f").cast("double") / tc)
        .withColumn(s"${f}_ok", col(s"${f}_ratio") <= th)
    }
    withRatios
      .withColumn("ngram_pass",
        ngramThresholds.map { case (f, _) => col(s"${f}_ok") }.reduce(_ && _))
      .drop("__g")
  }

  /** Document fingerprint: md5 of the normalized token stream — the exact
    * dedup key (hash-groupBy dedup shuffles only (fingerprint, doc_id)).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(tokens(lower(text)), " "))

  /** PII patterns kept RE2-compatible (no backrefs/lookaround) so the same
    * regexes run in Java, RE2, and hyperscan-style engines — redaction rules
    * must behave identically across every system that touches the corpus.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction: mask emails then phone-like digit runs. Pure per-row
    * regexp_replace — scan-speed, codegen'd, no shuffle at 100 TB.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Count of PII hits before redaction (audit metric). */
  def piiCount(text: Column): Column =
    (size(split(text, EmailRe, -1)) - 1 + (size(split(text, PhoneRe, -1)) - 1)).cast("long")

  /** Strip C0 control characters (except \t \n \r) and DEL — the first pass
    * of every corpus cleaner. Explicit hex class (not \p{Cntrl}, whose
    * membership varies by engine) so Java regex and RE2 strip identical
    * bytes.
    */
  def stripControls(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
}

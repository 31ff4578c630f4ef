package graft.text

/** Subword tokenizer vocabulary (tx3b): greedy longest-match merging against
  * a trained merges vocab — the counting core of BPE/WordPiece-family
  * tokenizers (Sennrich et al. 2016 "Neural Machine Translation of Rare
  * Words with Subword Units"; the greedy longest-match inference pass is the
  * WordPiece variant, Wu et al. 2016 §4.1). Token budgets drive sequence
  * packing (tx8) and mixture weighting (sp4); a chars/4 heuristic
  * ([[TextOps.approxBpeCount]], now the documented fallback) distorts both,
  * so the pipeline counts with a real vocab.
  *
  * The vocab here is a fixture: ~170 high-frequency English merges of the
  * shape a trained merges table produces. The machinery is vocab-driven end
  * to end — [[graft.functions.BpeTokenCount]] accepts any merges list, and a
  * production run would load the model's published merges file instead. The
  * expression ships the vocab with the serialized plan (a 50k-entry real
  * vocab is ~500 KB — well under task-closure budgets), and the lookup
  * structure is rebuilt lazily per executor, never shuffled.
  *
  * [[sqlVocabValues]] renders the SAME list as a SQL VALUES body so the
  * DuckDB oracle and the Spark plan can never drift apart.
  */
object Bpe {

  /** Tokens must stay single-quote-free: they are embedded verbatim in the
    * oracle's `VALUES ('tok'),...` list.
    */
  val mergesDefault: Seq[String] = Seq(
    // corpus-frequent whole words (what a merges table converges to for
    // high-frequency words)
    "table", "window", "customer", "stream", "spark", "query", "value",
    "column", "order", "group", "batch", "merge", "scan", "hash", "sort",
    "join", "line", "part", "data", "key", "row", "agg", "fast", "slow",
    "small", "big", "the", "and", "for", "with", "that", "this",
    // 3-grams
    "ion", "tio", "ent", "ati", "her", "ter", "hat", "tha", "ere", "ate",
    "his", "con", "res", "ver", "all", "ons", "nce", "men", "ith", "ted",
    "ers", "pro", "thi", "wit", "are", "ess", "not", "ive", "was", "ect",
    "rea", "com", "eve", "per", "int", "est", "sta", "cti", "ica", "ist",
    "ear", "ain", "one", "our", "iti", "rat", "ing", "str", "ple", "lue",
    // 2-grams
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur", "ca", "el", "ta", "la", "ns", "di", "fo", "ho", "pe", "ec",
    "pr", "no", "ct", "us", "ac", "ot", "il", "tr", "ly", "nc", "et", "ut",
    "ss", "so", "rs", "un", "lo", "wa", "ge", "ie", "wh", "ee", "wi", "em",
    "ad", "ol", "rt", "po", "we", "na", "ul", "ni", "ts", "mo", "ow", "pa",
    "im", "mi", "ai", "sh", "ir", "su", "id", "os", "iv", "ia", "am", "fi",
    "ci", "vi", "pl", "ig", "tu", "ev", "ld", "ry")

  /** The vocab as a SQL `VALUES` body — the oracle side of the contract. */
  def sqlVocabValues: String = mergesDefault.map(t => s"('$t')").mkString(",")

  /** Maximum merge length (the longest-match scan horizon). */
  def maxTokenLen: Int = mergesDefault.iterator.map(_.length).max
}

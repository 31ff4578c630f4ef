package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (tx22) — the other half of tx3b's
  * inference pass: learn the merges table itself from the corpus (Sennrich
  * et al. 2016 §3.2). Classic word-level BPE: tokenize, keep the distinct
  * WORD table with counts (the working set is vocabulary-sized, never
  * corpus-sized — the reason BPE training distributes), start from
  * character symbols, then repeatedly (1) count adjacent symbol pairs
  * weighted by word count, (2) merge the most frequent pair everywhere.
  *
  * Distribution shape (100 TB): the corpus is touched ONCE (the word
  * count); each of the k iterations is one vocabulary-sized aggregation
  * (pair counts) plus a one-row driver collect (the argmax — control-plane,
  * like Pq's Lloyd step) and a map-side literal `replace` over the
  * vocabulary. k merges = k small shuffles over a frame that never grows.
  *
  * Engine-exactness — the part that makes this oracle-able: symbol
  * sequences are BRACKET-ENCODED strings (`cat` → `<c><a><t>`), so merging
  * pair (a,b) is the LITERAL string replace `<a><b>` → `<ab>`. Literal
  * replace is leftmost non-overlapping in both Spark and DuckDB, which is
  * exactly BPE's merge-application rule (`<a><a><a>` + (a,a) → `<aa><a>`),
  * and per-symbol brackets mean adjacent matches share no delimiter (the
  * classic space-separated encoding drops every second merge in a run).
  * Training words are restricted to `^[a-z0-9]+$` (pure ASCII) so
  * code-point semantics (UTF-16 vs UTF-8) can never diverge, and the argmax tie-break is total:
  * (count desc, left asc, right asc). The DuckDB oracle replays ALL of it —
  * k unrolled CTE stages, each verifying the next merge is the argmax of
  * the state reached by applying the previous ones.
  */
object BpeTrain {

  /** Learn `merges` BPE merges over `textCol`. Returns one row per learned
    * merge: (iter, merge_left, merge_right, pair_count) — the merges table
    * tx3b-style inference consumes, in training order. Stops early (fewer
    * rows) only if the vocabulary runs out of repeated pairs.
    */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 64, s"merges must be in [1, 64], got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(filter(TextOps.tokens(lower(col(textCol))),
        w => length(w) > 0)).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var state = words
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("s"), col("cnt"))
      .persist()
    // No eager materialization: each iteration's argmax job below is the
    // first consumer of the freshly-persisted state and fills its cache as
    // a side effect — an explicit count() per iteration doubled the job
    // count of the whole training loop (r19; the loop is fixed-latency
    // bound, the vocabulary frame itself is small). The PREVIOUS state is
    // unpersisted only after the argmax has materialized its successor, so
    // no lineage ever recomputes past one hop.
    var prev: DataFrame = null
    val learned = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < merges && !exhausted) {
      val syms = split(col("s").substr(lit(2), length(col("s")) - 2), "><")
      val top = state
        .select(explode(zip_with(
          slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
          slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
          (a, b) => struct(a.as("p1"), b.as("p2")))).as("g"), col("cnt"))
        .groupBy(col("g.p1").as("p1"), col("g.p2").as("p2"))
        .agg(sum(col("cnt")).as("total"))
        .filter(col("total") >= 2) // a pair seen once compresses nothing
        .orderBy(col("total").desc, col("p1"), col("p2"))
        .limit(1).collect()
      // the argmax job just materialized `state`'s cache — the state BEHIND
      // it can no longer be recomputed-from and is safe to release
      if (prev != null) { prev.unpersist(); prev = null }
      top.headOption match {
        case None => exhausted = true
        case Some(Row(p1: String, p2: String, total: Long)) =>
          learned += ((i, p1, p2, total))
          val next = state
            .select(replace(col("s"), lit(s"<$p1><$p2>"), lit(s"<${p1 + p2}>")).as("s"),
              col("cnt"))
            .persist()
          prev = state
          state = next
          i += 1
        case Some(other) => throw new IllegalStateException(s"unexpected row $other")
      }
    }
    if (prev != null) prev.unpersist()
    state.unpersist()
    learned.toSeq.toDF("iter", "merge_left", "merge_right", "pair_count")
  }

  /** tx22b: the train→apply ROUNDTRIP — learn `merges` merges with [[train]],
    * then tokenize the corpus with them (true BPE inference: merges applied
    * in TRAINING ORDER, each over the symbol state the previous ones
    * produced — not tx3b's greedy longest-match, which is the WordPiece
    * variant). Returns one row per document: (doc_id, n_tokens_learned).
    * Trainable words (`^[a-z0-9]+$` after lowering — the training population)
    * count their post-merge symbol count; any other token counts 1 (atomic).
    *
    * Scale shape: training is k vocabulary-sized shuffles (see [[train]]);
    * application is PURE MAP-SIDE — the k learned merges fold into a literal
    * replace chain inside one per-row expression, so the corpus-sized pass
    * has no shuffle at all and the output is one row per document.
    */
  def trainAndCount(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val learned = train(docs, textCol, merges)
      .orderBy(col("iter"))
      .select(col("merge_left"), col("merge_right"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    docs.select(col("doc_id"),
      coalesce(
        aggregate(
          transform(
            filter(TextOps.tokens(lower(col(textCol))), w => length(w) > 0),
            w => when(w.rlike("^[a-z0-9]+$"), {
              val ch = learned.foldLeft(regexp_replace(w, "(.)", "<$1>")) {
                case (c, (l, r)) => replace(c, lit(s"<$l><$r>"), lit(s"<$l$r>"))
              }
              (length(ch) - length(replace(ch, lit("<"), lit("")))).cast("long")
            }).otherwise(lit(1L))),
          lit(0L), (acc, x) => acc + x),
        lit(0L)).as("n_tokens_learned"))
  }

  /** The DuckDB replay of [[trainAndCount]]: re-derives every merge through
    * the [[oracleSql]] stage chain, collapses them into a one-row `mvals`
    * cross-join (lambdas cannot hold subqueries in DuckDB, so the merge
    * strings must arrive as plain columns), and applies the same literal
    * replace chain per word. REQUIRES the corpus to support all `merges`
    * merges (an exhausted stage would empty the cross join); tx22's own
    * oracle run proves it does at the verify SF.
    */
  def roundtripOracleSql(merges: Int): String = {
    val toks = "regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+')"
    val full = oracleSql(merges)
    val stagesOnly = full.substring(full.indexOf("WITH ") + 5, full.lastIndexOf("SELECT 0 AS iter"))
      .trim.stripSuffix(",")
    val mvals = (0 until merges)
      .map(i => s"m$i.p1 AS p1_$i, m$i.p2 AS p2_$i")
      .mkString("SELECT ", ", ", " FROM " + (0 until merges).map(i => s"m$i").mkString(", "))
    val chain = (0 until merges).foldLeft("regexp_replace(w, '(.)', '<\\1>', 'g')") {
      (c, i) => s"replace($c, '<' || p1_$i || '><' || p2_$i || '>', '<' || p1_$i || p2_$i || '>')"
    }
    s"""WITH $stagesOnly,
       |mvals AS MATERIALIZED ($mvals)
       |SELECT doc_id,
       |  CAST(COALESCE(list_sum(list_transform(
       |    list_filter($toks, t -> length(t) > 0),
       |    w -> CASE WHEN regexp_matches(w, '^[a-z0-9]+$$')
       |      THEN length($chain) - length(replace($chain, '<', ''))
       |      ELSE 1 END)), 0) AS BIGINT) AS n_tokens_learned
       |FROM documents, mvals""".stripMargin
  }

  /** The DuckDB replay of [[train]] over the `documents` table: k unrolled
    * stages — stage i recomputes pair counts of state s_i and takes the
    * argmax with the same total tie-break, then applies the merge with the
    * same literal bracket replace to form s_{i+1}. Rendered from the same
    * `merges` count the Spark side uses. Re-deriving each merge (instead of
    * trusting a dumped list) makes this a FULL training oracle.
    */
  def oracleSql(merges: Int): String = {
    val toks = "regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\f\\r]+')"
    def pairsOf(stateCte: String): String =
      s"""SELECT g.p1 AS p1, g.p2 AS p2, CAST(SUM(cnt) AS BIGINT) AS total FROM (
         |  SELECT unnest(list_transform(range(0, greatest(len(syms) - 1, 0)),
         |    i -> struct_pack(p1 := syms[i+1], p2 := syms[i+2]))) AS g, cnt
         |  FROM (SELECT string_split(s[2:length(s)-1], '><') AS syms, cnt FROM $stateCte) st) pr
         |GROUP BY 1, 2 HAVING SUM(cnt) >= 2
         |ORDER BY total DESC, p1, p2 LIMIT 1""".stripMargin
    val stages = (0 until merges).map { i =>
      val applyPrev = if (i == 0) "" else {
        val p = i - 1
        s"""s$i AS MATERIALIZED (SELECT replace(s,
           |  '<' || (SELECT p1 FROM m$p) || '><' || (SELECT p2 FROM m$p) || '>',
           |  '<' || (SELECT p1 FROM m$p) || (SELECT p2 FROM m$p) || '>') AS s, cnt
           |  FROM s$p),
           |""".stripMargin
      }
      // MATERIALIZED is load-bearing: each stage references the previous
      // merge CTE three times and the previous state once; un-materialized
      // CTE inlining re-expands the whole chain (~3^k scans of documents).
      s"""${applyPrev}m$i AS MATERIALIZED (${pairsOf(s"s$i")})"""
    }.mkString(",\n")
    val union = (0 until merges)
      .map(i => s"SELECT $i AS iter, p1 AS merge_left, p2 AS merge_right, total AS pair_count FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT unnest(list_filter($toks, t -> length(t) > 0)) AS w FROM documents) tw
       |  WHERE regexp_matches(w, '^[a-z0-9]+$$') GROUP BY w),
       |s0 AS MATERIALIZED (SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS s, cnt FROM words),
       |$stages
       |$union""".stripMargin
  }
}

package graft.queries

import graft.ops.Sampling
import graft.sources.Tables
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Deterministic sampling + PII redaction over the documents corpus —
  * the dataset-curation half of a training-data pipeline (hash splits,
  * stratified draws, per-source reservoirs, scrubbing). All hash-driven and
  * engine-portable, so every query here has a full DuckDB oracle.
  */
object SamplingQueries extends QueryModule {

  // DuckDB twin of Sampling.unitHash (no salt) — shared via QueryModule.
  private val duckUnitHash = QueryModule.duckUnitHash

  val defs: Map[String, Q] = Map(
    // SP1: reproducible train/val/test split — literal cuts 0.8/0.9, so
    // membership is stable as the corpus grows and identical on any engine.
    "sp1_hash_split" -> ((s, dir) =>
      Sampling.hashSplit(Tables.documents(s, dir), "doc_id",
        Seq("train", "val", "test"), Seq(0.8, 0.9))
        .select(col("doc_id"), col("lang"), col("split"))),

    // SP7: LEAKAGE-SAFE train/val/test split — sp1's hash split keyed by
    // the near-dup GROUP, not the document. Splitting by doc id lets two
    // near-duplicates straddle train and test (the classic contamination
    // that inflates eval: the model "generalizes" to a paraphrase of its
    // own training doc); here dd2's MinHash pairs chain through dd6's
    // connected components and the split hashes the component's canonical
    // id, so a whole near-dup family lands in ONE split by construction.
    // Scale shape: the dedup leg is the banded dd2 pipeline; the group map
    // holds only docs appearing in some near-dup pair (≪ corpus) so the
    // join broadcasts; the split itself is map-side.
    "sp7_leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val pairs = graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
      val keyed = docs
        .join(graft.dedup.Dedup.dupGroups(pairs), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("group_id"), col("doc_id")).as("group_key"))
      Sampling.hashSplit(keyed, "group_key",
        Seq("train", "val", "test"), Seq(0.8, 0.9))
        .select(col("doc_id"), col("group_key"), col("split"))
    }),

    // SP2: per-language stratified Bernoulli sample (en kept at 50%, the
    // rest at 20%) — deterministic membership via the id hash.
    "sp2_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 0.5), defaultFraction = 0.2)
        .select(col("doc_id"), col("lang"), col("source"))),

    // SP3: fixed-size reservoir of 25 docs per source, smallest-hash-wins.
    "sp3_reservoir_per_key" -> ((s, dir) =>
      Sampling.reservoirPerKey(Tables.documents(s, dir), "source", "doc_id", n = 25)
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // SP4: temperature-reweighted mixture (τ=0.5): small sources up-weighted
    // toward a 2000-doc target budget; deterministic membership, exact
    // decimal weight sum (see Sampling.temperatureMix).
    "sp4_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(Tables.documents(s, dir), "doc_id", "source",
        targetRows = 2000)
        .select(col("doc_id"), col("source"), col("lang"))),

    // SP5: weighted sampling without replacement via priority sampling
    // (Duffield-Lund-Thorup; priority = weight/u, top-30 per source) —
    // longer docs proportionally likelier, selection set deterministic and
    // engine-portable because the priority needs only one IEEE division
    // (see Sampling.prioritySamplePerKey).
    "sp5_priority_sample" -> ((s, dir) =>
      Sampling.prioritySamplePerKey(Tables.documents(s, dir), "source", "doc_id",
        "n_chars", n = 30)
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // SP6: exact-quota mixture fill (beyond-reference) — the "data mixing"
    // step that hits target per-source proportions EXACTLY: seats allocated
    // by the largest-remainder method in pure integer basis points (no
    // float weights — 0.4·200 is not representable, 4000·200 DIV 10000 is),
    // then each source fills its quota in hash order. A source smaller than
    // its quota contributes everything it has — visible as its max
    // mix_rank, never a silent cap.
    //
    // 100 TB story: the seat table is 5 rows of window arithmetic
    // (control-plane) broadcast to the corpus; the per-source rank is one
    // exchange on source. For quotas so large the rank matters, the
    // hash-threshold form (quota/n as a rate, sp2's shape) replaces the
    // window — same selection law, no rank.
    "sp6_quota_mix" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val n = 200L
      val weights = Seq(("src0", 4000L), ("src1", 2500L), ("src2", 2000L),
        ("src3", 1000L), ("src4", 500L)).toDF("source", "bp")
      val quotas = weights
        .withColumn("base", expr(s"($n * bp) DIV 10000"))
        .withColumn("rem", expr(s"($n * bp) % 10000"))
        .withColumn("rk", row_number().over(Window.orderBy(col("rem").desc, col("source"))))
        .withColumn("leftover", lit(n) - sum(col("base")).over(Window.partitionBy(lit(1))))
        .select(col("source"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("quota"))
      Tables.documents(s, dir).select(col("doc_id"), col("source"))
        .withColumn("mix_rank", row_number().over(Window.partitionBy(col("source"))
          .orderBy(Sampling.unitHash(col("doc_id"), "#mix"), col("doc_id"))))
        .join(broadcast(quotas), Seq("source"))
        .filter(col("mix_rank") <= col("quota"))
        .select(col("source"), col("doc_id"), col("mix_rank"))
    }),

    // SP8: walk-forward temporal folds with an embargo gap (beyond-
    // reference) — time-series CV the way backtesting requires it: fold k
    // trains on a sliding 10-day window, tests on the 4-day window that
    // starts 2 days AFTER the train edge; the embargo absorbs trailing-
    // window feature leakage across the boundary (the temporal analog of
    // sp7's near-dup leakage guard). One output row per (event, fold,
    // role); integer day arithmetic from a literal origin so membership is
    // engine-exact. Scale: the fold table broadcasts (nFolds rows), the
    // membership test is map-side with fan-out ≤ nFolds — no shuffle.
    "sp8_walkforward_folds" -> ((s, dir) =>
      Sampling.walkForwardFolds(
        Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts")),
        col("ts"), origin = "2024-01-01", nFolds = 4,
        trainDays = 10, testDays = 4, embargoDays = 2)
        .select(col("event_id"), col("user_id"), col("day_offset"),
          col("fold"), col("role"))),

    // TX5: PII redaction + audit count (per-row regexp_replace, scan-speed).
    "tx5_pii_redact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextOps.redactPii(col("text")).as("clean_text"),
          TextOps.piiCount(col("text")).as("pii_hits"))))

  /** sp7 oracle: the dd2b portable MinHash pipeline chained through dd6's
    * recursive reachability (the tx20b construction), then sp1's split
    * CASE applied to the component's canonical id.
    */
  private val SP7_ORACLE: String = {
    val mins = (1 to 16).map { sd =>
      val (pair, off) = ((sd + 1) / 2, if (sd % 2 == 1) 1 else 17)
      s"MIN(CAST(('0x' || substr(md5(shingle || '#$pair'), $off, 15)) AS BIGINT)) AS h$sd"
    }.mkString(", ")
    val sigList = (1 to 16).map(i => s"h$i").mkString("[", ", ", "]")
    val bandHash = (0 until 4).map { b =>
      val parts = (1 to 4).map(r => s"CAST(sig[${b * 4 + r}] AS VARCHAR)").mkString(", ")
      s"WHEN $b THEN md5(concat_ws(',', $parts))"
    }.mkString(" ")
    val shingle = "unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
      "i -> array_to_string(toks[i+1:i+3], ' ')))"
    val sim = "CAST(list_sum(list_transform(range(1, 17), " +
      "i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16"
    val toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    val uh = "(CAST('0x' || substr(md5(CAST(group_key AS VARCHAR)), 1, 15) AS BIGINT)" +
      " / 1152921504606846976.0)"
    s"""WITH RECURSIVE
       |ex AS (SELECT doc_id AS doc, $shingle AS shingle
       |  FROM (SELECT doc_id, $toks AS toks FROM documents)),
       |sigs AS (SELECT doc, $sigList AS sig FROM (SELECT doc, $mins FROM ex GROUP BY doc)),
       |banded AS (SELECT doc, sig, b AS band, CASE b $bandHash END AS band_hash
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
       |prs AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
       |  FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc < b.doc
       |  WHERE $sim >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs),
       |reach(id, label) AS (SELECT src, src FROM edges
       |  UNION SELECT e.src, r2.label FROM edges e JOIN reach r2 ON e.dst = r2.id),
       |grp AS (SELECT id AS doc_id, MIN(label) AS group_id FROM reach GROUP BY id),
       |keyed AS (SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_key
       |  FROM documents d LEFT JOIN grp g ON d.doc_id = g.doc_id)
       |SELECT doc_id, group_key,
       |  CASE WHEN $uh < 0.8 THEN 'train'
       |       WHEN $uh < 0.9 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM keyed""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sp7_leakage_safe_split" -> SP7_ORACLE,
    // sp8: the fold table replayed as literals (k·4, +10 train, +2 embargo,
    // +4 test), integer day arithmetic from the same origin literal.
    "sp8_walkforward_folds" ->
      """WITH f AS (SELECT k AS fold, k*4 AS tr0, k*4 + 10 AS tr1,
        |    k*4 + 12 AS te0, k*4 + 16 AS te1
        |  FROM (SELECT CAST(unnest(range(0, 4)) AS INT) AS k)),
        |e AS (SELECT event_id, user_id,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INT) AS day_offset
        |  FROM events)
        |SELECT e.event_id, e.user_id, e.day_offset, f.fold,
        |  CASE WHEN e.day_offset < f.tr1 THEN 'train' ELSE 'test' END AS role
        |FROM e JOIN f ON (e.day_offset >= f.tr0 AND e.day_offset < f.tr1)
        |  OR (e.day_offset >= f.te0 AND e.day_offset < f.te1)""".stripMargin,
    "sp1_hash_split" ->
      s"""SELECT doc_id, lang,
         |CASE WHEN $duckUnitHash < 0.8 THEN 'train'
         |     WHEN $duckUnitHash < 0.9 THEN 'val'
         |     ELSE 'test' END AS split
         |FROM documents""".stripMargin,
    "sp2_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $duckUnitHash < (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END)""".stripMargin,
    // mirrors temperatureMix exactly: decimal(18,6)-quantized sqrt weights,
    // exact decimal sum, then the identical double ops in the same order
    "sp4_temperature_mix" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n,
         |CAST(sqrt(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(18,6)) AS w
         |FROM documents GROUP BY source),
         |t AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw FROM c),
         |r AS (SELECT source,
         |least(1.0, 2000.0 * (CAST(w AS DOUBLE) / tw) / CAST(n AS DOUBLE)) AS rate
         |FROM c, t)
         |SELECT d.doc_id, d.source, d.lang FROM documents d
         |JOIN r ON d.source = r.source
         |WHERE $duckUnitHash < r.rate""".stripMargin,
    "sp3_reservoir_per_key" ->
      s"""SELECT doc_id, source, n_chars FROM documents
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY $duckUnitHash, doc_id) <= 25""".stripMargin,
    "sp5_priority_sample" ->
      s"""SELECT doc_id, source, n_chars FROM documents
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY source
         |  ORDER BY CAST(n_chars AS DOUBLE) / ($duckUnitHash) DESC, doc_id) <= 30""".stripMargin,
    // sp6: same basis-point seat arithmetic, same salted-hash fill order.
    "sp6_quota_mix" ->
      """WITH wts(source, bp) AS (VALUES ('src0', 4000), ('src1', 2500),
        |  ('src2', 2000), ('src3', 1000), ('src4', 500)),
        |q0 AS (SELECT source, (200 * bp) // 10000 AS base, (200 * bp) % 10000 AS rem FROM wts),
        |q1 AS (SELECT source, base, rem,
        |  ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
        |  200 - SUM(base) OVER () AS leftover FROM q0),
        |qt AS (SELECT source,
        |  base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS quota FROM q1),
        |ranked AS (SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |  (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15)) AS BIGINT)
        |    / 1152921504606846976.0), doc_id) AS rn FROM documents)
        |SELECT r.source, r.doc_id, CAST(r.rn AS INTEGER) AS mix_rank
        |FROM ranked r JOIN qt ON r.source = qt.source WHERE r.rn <= qt.quota""".stripMargin,
    "tx5_pii_redact" ->
      """SELECT doc_id,
        |regexp_replace(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS clean_text,
        |(len(regexp_split_to_array(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1
        | + len(regexp_split_to_array(text, '\+?[0-9][0-9()\- ]{6,}[0-9]')) - 1) AS pii_hits
        |FROM documents""".stripMargin)
}

package graft

import graft.queries.{JoinQueries, ScanProjQueries, SetOrderQueries, ViewQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that decide whether these operators
  * survive a 100 TB scale-up — dimension joins must broadcast (no fact-side
  * shuffle), filters and projections must reach the parquet scan, top-k must
  * not globally sort. Regressions here are performance bugs even when
  * results stay correct.
  */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("V5 star: all dimension joins broadcast; no cartesian product") {
    val p = plan(ViewQueries.defs("v5_individual_budget")(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // customer/nation/region/supplier enrichments must not shuffle the fact:
    // count the sort-merge joins — only fact-to-fact joins may remain.
    val smj = "SortMergeJoin".r.findAllIn(p).length
    assert(smj <= 4, s"too many sort-merge joins ($smj) — a dim join lost its broadcast:\n$p")
  }

  test("j1 star: broadcasts all five dims") {
    val p = plan(JoinQueries.defs("j1_star_left_join")(spark, dir))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 5, s"expected >=5 broadcast joins, got $bhj")
    assert(!p.contains("SortMergeJoin"))
  }

  test("s2 date window: filter is pushed into the parquet scan") {
    val p = plan(ScanProjQueries.defs("s2_date_window")(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate.*"))
  }

  test("column pruning: projection reads only referenced columns") {
    val df = ScanProjQueries.defs("p3_type_normalize")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema.fieldNames.toSeq
    }
    assert(scans.nonEmpty)
    // p3 touches 4 of lineitem's 11 columns — the scan must read exactly those
    assert(scans.head.toSet ===
      Set("l_orderkey", "l_quantity", "l_shipdate", "l_extendedprice"), scans.head)
  }

  test("o2 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(SetOrderQueries.defs("o2_topk")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    val df = graft.queries.AggQueries.defs("a1_groupby_rollup")(spark, dir)
    // partial + final aggregation (map-side combine before the shuffle)
    val p0 = plan(df)
    assert(p0.contains("partial_sum"), p0)
    assert("HashAggregate".r.findAllIn(p0).length >= 2)
    df.collect() // AQE finalizes the plan; codegen stages appear post-execution
    val p1 = plan(df)
    assert(p1.contains("*(1)") && p1.contains("*(2)"), p1) // codegen stage markers
  }

  test("a11 partial/merge aggregation: map-side combine before the shuffle") {
    val p = plan(graft.queries.AggQueries.defs("a11_partial_merge_agg")(spark, dir))
    assert(p.contains("partial_sum") && p.contains("partial_count"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected a partial + final HashAggregate pair")
  }

  test("merge anti-join shuffles only the key projection") {
    val p = plan(graft.queries.DmlQueries.defs("m1_merge_upsert")(spark, dir))
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s10 bucketed co-located join: no shuffle and no sort on the probe side") {
    val out = graft.queries.SinkQueries.defs("s10_bucketed_join")(spark, dir)
    // Execute THIS QueryExecution (a noop write would spawn a separate one and
    // leave `out`'s own AdaptiveSparkPlan un-finalized), then assert on the
    // plan that actually ran.
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(500))
    assert(p.contains("SortMergeJoin"), p.take(500))
    // bucketing replaces the shuffle: the join reads bucketed scans directly
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle either side")
    assert(p.contains("SelectedBucketsCount"), "scans must be bucket-aware")
  }

  test("minhash signatures: both hash families are fused map-side, shuffle-free at scale") {
    val docs = graft.sources.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // At-scale shape (input bytes ≥ target × maxPartitionBytes — simulated by
    // shrinking the split size so the tiny test file counts as "many
    // splits"): the native MinHashSignature expression is map-side only — no
    // explode, no aggregation, no Exchange in the signature stage.
    val defaultSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
      val fast = plan(graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 16))
      assert(!fast.contains("Exchange"), "native signature path must not shuffle at scale")
      assert(fast.contains("minhash_signature"), fast)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", defaultSplit)
    // Starved-scan shape (default 128 MB splits make this corpus ~1 split):
    // the spread repartition kicks in so the signature loop uses all cores.
    val spread = plan(graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 16))
    assert(spread.contains("Exchange"), "starved scan must spread before the signature loop")
    // portable-md5 oracle path (round 12): the fused PortableMinHashSignature
    // expression — same map-side-only shape as the native path (no explode,
    // no aggregate), at-scale split size again
    val defaultSplit2 = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
      val portable = plan(graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text",
        numHashes = 16, portableHash = true))
      assert(!portable.contains("Exchange"),
        "portable signature path must not shuffle at scale")
      assert(portable.contains("portable_minhash_signature"), portable)
      assert(!portable.contains("HashAggregate"),
        "the fused portable path must not aggregate")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", defaultSplit2)
  }

  test("a19 grouping sets: one Expand over one scan, not three group-bys") {
    val p = plan(graft.queries.AggQueries.defs("a19_grouping_sets")(spark, dir))
    assert("Expand".r.findAllIn(p).length == 1, s"expected exactly one Expand:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"grouping sets must not rescan the fact:\n$p")
  }

  test("x5 HLL sketches: partial sketch agg map-side; quarter re-agg never rescans the fact") {
    val p = plan(graft.queries.AggQueries.defs("x5_sketch_distinct")(spark, dir))
    // sketch leg + exact COUNT(DISTINCT) gate leg each scan once; the
    // month→quarter UNION re-aggregation must come from the sketch column,
    // not a third scan
    assert("Scan parquet".r.findAllIn(p).length <= 2, s"quarter rollup rescanned the fact:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"HLL sketch agg must run partial then merge:\n$p")
  }

  test("ann6 recall: every join is equi (no cartesian / nested-loop)") {
    val p = plan(graft.queries.LlmQueries.defs("ann6_recall")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"recall measurement must stay equi-join only:\n$p")
  }

  test("j17 bloom prune: might_contain filters the fact scan below the join exchange") {
    val df = JoinQueries.defs("j17_bloom_prune")(spark, dir)
    val p = plan(df)
    assert(p.contains("might_contain"), s"bloom filter missing from the plan:\n$p")
    assert(p.contains("SortMergeJoin"), "the merge hint must keep the shuffle join")
    // the bloom filter must evaluate directly over the fact scan — an
    // exchange between them would mean we shuffled rows just to drop them
    val filters = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.nonEmpty, "no FilterExec carries the bloom predicate")
    assert(filters.exists(_.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isDefined), "bloom filter is not over a file scan")
    assert(filters.forall(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty), "an exchange sits below the bloom filter")
  }

  test("x10 heavy hitters: the candidate semi-join prunes below the count's exchange") {
    val df = graft.queries.LlmQueries.defs("x10_heavy_hitters")(spark, dir)
    val p = plan(df)
    // the whole point: only candidate-keyed rows enter the exact count's
    // shuffle — the broadcast semi-join must sit BELOW every shuffle
    // exchange, directly over the exploded scan side
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(joins.nonEmpty, s"no broadcast left-semi candidate join in the plan:\n$p")
    assert(joins.forall(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty), "a shuffle exchange sits below the candidate semi-join — " +
      "the corpus would shuffle before pruning")
  }

  test("dd11b index-served: the plan reads the signature index, never base text") {
    val df = graft.queries.LlmQueries.defs("dd11b_index_served")(spark, dir)
    // the signature frames are persisted (computed-once guarantee), so the
    // index scan lives inside an InMemoryRelation — traverse into cached
    // plans when collecting file scans
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(f.relation.location.rootPaths.map(_.toString).mkString(","))
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        fileScans(im.relation.cachedPlan)
      // AdaptiveSparkPlanExec exposes no children to collect — unwrap it
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
    }.flatten
    val scans = fileScans(df.queryExecution.sparkPlan)
    assert(scans.exists(_.contains("graft_dd11b_idx")),
      s"no scan of the persisted signature index:\n${scans.mkString("\n")}")
    // the serve-time promise: base documents are NEVER re-scanned — every
    // parquet scan in the served plan is the index (the increments arrive
    // pre-materialized via eager checkpoint, as a real batch would)
    assert(scans.forall(!_.contains("documents")),
      s"base text re-scanned at serve time:\n${scans.mkString("\n")}")
  }

  test("dd11b serve: index bands are batch-pruned BELOW the bucket window; no sort-merge join") {
    // The O(batch)-serve pin (r20): the bucket-size count window must sit
    // ABOVE a broadcast left-semi prune of the index's banded rows against
    // the batch's (band, band_hash) set — i.e. the only index-sized work
    // per serve is the map-side scan+prune, never the window's shuffle.
    // And the signature re-attach rides the candidate rows, so no
    // sort-merge join (the old corpus-sized re-attach) may remain anywhere.
    val df = graft.queries.LlmQueries.defs("dd11b_index_served")(spark, dir)
    import org.apache.spark.sql.execution.SparkPlan
    // the pruned band frame is pinned (PinnedCaches), so the window lives
    // inside an InMemoryRelation — traverse cached plans like the
    // artifact-only audits do
    def subTrees(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        subTrees(im.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        subTrees(a.executedPlan)
      case other => Seq(other)
    }.flatten
    val nodes = subTrees(df.queryExecution.sparkPlan)
    def pruneBelow(p: SparkPlan): Boolean = p.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }.nonEmpty
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.windowExpression.mkString.contains("count") => w
    }
    assert(windows.nonEmpty,
      s"no bucket-size count window found in the serve plan (incl. cached subplans)")
    assert(windows.forall(w => pruneBelow(w.child)),
      "a bucket-size window runs over UNPRUNED index bands (O(index) shuffle per serve)")
    // the corpus-sized verify re-attach must stay gone: no sort-merge join
    // anywhere in the serve may consume a parquet file scan (the only file
    // scans in this plan are the index's; the one remaining SMJ is the
    // batch-sized best-match left join over checkpointed/cached frames)
    val smjOverFiles = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.nonEmpty => j
    }
    assert(smjOverFiles.isEmpty,
      "a sort-merge join consumes the index parquet — a corpus-sized re-attach is back")
  }

  test("dd15b groups-served: the plan reads both artifacts, never base text or base pairs") {
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(f.relation.location.rootPaths.map(_.toString).mkString(","))
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        fileScans(im.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
    }.flatten
    // The serve is audited in its two halves, split where
    // incrementalDupGroups' eager edge checkpoint truncates lineage (r19:
    // the fold's edge list is materialized once so the semi/anti joins'
    // broadcast builds stop re-executing the LSH pipeline — the final plan
    // therefore no longer CONTAINS the edge legs).
    // Half 1: the edge legs read ONLY the signature index — base text is
    // never re-scanned (the batch arrives via eager checkpoint).
    val (legs, grp) = graft.queries.LlmQueries.dd15bServeLegs(spark, dir)
    val legScans = fileScans(legs.queryExecution.sparkPlan)
    assert(legScans.exists(s => s.contains("graft_dd15b") && s.contains("idx")),
      s"no scan of the persisted signature index:\n${legScans.mkString("\n")}")
    assert(legScans.forall(s => s.contains("graft_dd15b")),
      s"non-artifact parquet scan in the serve legs (base text re-scanned?):\n${legScans.mkString("\n")}")
    // Half 2: the registered row's returned plan reads ONLY the groups
    // artifact — base groups are never recomputed (and the truncation
    // really did keep corpus scans out of the fold).
    val df = graft.queries.LlmQueries.defs("dd15b_groups_served")(spark, dir)
    val scans = fileScans(df.queryExecution.sparkPlan)
    assert(scans.exists(s => s.contains("graft_dd15b") && s.contains("groups")),
      s"no scan of the persisted groups artifact:\n${scans.mkString("\n")}")
    assert(scans.forall(s => s.contains("graft_dd15b")),
      s"non-artifact parquet scan in the served plan:\n${scans.mkString("\n")}")
    assert(grp.contains("graft_dd15b"))
  }

  test("ann9 index-served: the plan reads the codes index, never corpus embeddings") {
    val df = graft.queries.LlmQueries.defs("ann9_index_served")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString).mkString(",")
    }
    assert(scans.exists(_.contains("graft_ann9_idx")),
      s"no scan of the persisted codes index:\n${scans.mkString("\n")}")
    // serve-time promise: corpus embeddings are neither re-scanned nor
    // retrained on (the model row was read before planning; queries arrive
    // pre-materialized) — every scan in the served plan is the index
    assert(scans.forall(!_.contains("embeddings")),
      s"corpus embeddings re-scanned at serve time:\n${scans.mkString("\n")}")
  }

  test("m9 SCD2: the whole history builds on exactly one exchange") {
    // string-matched because AQE wraps exchange-bearing plans
    // (AdaptiveSparkPlanExec hides children from sparkPlan.collect)
    val p = plan(graft.queries.DmlQueries.defs("m9_scd2_history")(spark, dir))
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected 1 exchange (hash on user), got $n:\n$p")
  }

  test("w10 gap fill: LOCF and the forward window share one (user, day) sort") {
    val p = plan(graft.queries.WindowQueries.defs("w10_gap_fill")(spark, dir))
    // the fill sort is exactly [user_id, day] — the daily-observation window
    // sorts by (user_id, day, ts DESC, ...) and must not be counted
    val fillSorts =
      """Sort \[user_id#\d+L? ASC NULLS FIRST, day#\d+ ASC NULLS FIRST\]""".r
        .findAllIn(p).length
    assert(fillSorts === 1,
      s"the two fill windows must share one (user, day) sort, found $fillSorts:\n$p")
  }

  test("sp6 quota mix: seat table broadcasts; no sort-merge join") {
    val p = plan(graft.queries.SamplingQueries.defs("sp6_quota_mix")(spark, dir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("tx17 BM25: query terms, df and stats all broadcast — the corpus never shuffles for a join") {
    val p = plan(graft.queries.LlmQueries.defs("tx17_bm25_topk")(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("ann8 SQ8: block search is equi-join; range table broadcasts") {
    val p = plan(graft.queries.LlmQueries.defs("ann8_sq_topk")(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tx14 LM score: one corpus-sized shuffle, map-side combined; window re-shuffle is model-sized") {
    val df = graft.queries.LlmQueries.defs("tx14_lm_score")(spark, dir)
    val p = plan(df)
    // Plan shape: the corpus is scanned for pairs and for the model (2) plus
    // the doc-id spine for the left join (1) — never more.
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 3, s"tx14 rescans the corpus ($scans):\n$p")
    // The bigram groupBy must partial-aggregate BEFORE its exchange (the
    // only corpus-sized shuffle is map-side combined); the window's prefix
    // exchange then sits on the aggregated model — Spark inserts it because
    // HashPartitioning(prefix, word) doesn't satisfy the window's
    // ClusteredDistribution(prefix), and that's the model-sized side.
    // Assert the structural pair: a partial-mode aggregate exists (the
    // map-side combine feeding the (prefix, word) exchange) AND the
    // (prefix, word) exchange itself exists.
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"bigram groupBy lost its map-side combine:\n$p")
    assert(p.matches("(?s).*Exchange hashpartitioning\\(prefix[^,)]*, word.*"),
      s"missing the (prefix, word) model exchange:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dd10 SemDeDup: centroid table broadcasts; no cartesian pairing") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = graft.ann.Pq.coarseTrain(emb, graft.ann.Pq.adaptiveNlist(emb.count()))
    val p = plan(graft.dedup.Dedup.semDedup(emb, cents, threshold = 0.96))
    // the nlist-row centroid table must broadcast (the d2c join), and the
    // within-cluster pairing must be an equi-join on block — all-pairs
    // cosine at corpus scale would be the SemDeDup anti-pattern
    assert(p.contains("BroadcastHashJoin"), s"centroid join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semantic pairing must stay block-scoped equi-join:\n$p")
  }
}

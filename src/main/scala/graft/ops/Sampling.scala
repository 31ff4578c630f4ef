package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines: dataset
  * splits, stratified sampling, per-key reservoirs. All are driven by a
  * portable uniform hash of the row id — not `rand()` — so
  *
  *  - the same row lands in the same split/sample on every run, every
  *    engine, and every cluster size (resumable pipelines, reproducible
  *    ablations);
  *  - adding rows never reassigns existing ones (stable membership as the
  *    corpus grows);
  *  - results are oracle-checkable in any engine with md5.
  *
  * 100 TB story: `hashSplit`/`stratifiedSample` are pure per-row projections
  * (scan-speed, no shuffle); `reservoirPerKey` shuffles once on the key like
  * any windowed top-n.
  */
object Sampling {

  /** Uniform hash of `c` in [0,1): first 60 bits of md5 over the string form
    * (optionally salted), divided by 2^60. Reproducible anywhere:
    * DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT) / 1152921504606846976.0`.
    */
  def unitHash(c: Column, salt: String = ""): Column = {
    val keyed = if (salt.isEmpty) c.cast("string") else concat(c.cast("string"), lit(salt))
    conv(substring(md5(keyed), 1, 15), 16, 10).cast("long").cast("double") /
      lit(1152921504606846976.0) // 2^60
  }

  /** Split assignment by id hash. `cuts` are LITERAL cumulative upper bounds
    * for all but the last split (e.g. names=(train,val,test), cuts=(0.8,0.9)
    * → 80/10/10) — literals, not summed weights, so the thresholds are the
    * exact same doubles in any re-implementation or oracle.
    */
  def hashSplit(df: DataFrame, idCol: String, names: Seq[String], cuts: Seq[Double],
      salt: String = "", splitCol: String = "split"): DataFrame = {
    require(names.length == cuts.length + 1, "need one more split name than cuts")
    require(cuts == cuts.sorted && cuts.forall(c => c > 0 && c < 1), "cuts must ascend in (0,1)")
    val u = unitHash(col(idCol), salt)
    val assign = names.init.zip(cuts).foldRight(lit(names.last): Column) {
      case ((name, cut), rest) => when(u < cut, lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, assign)
  }

  /** Stratified sample: keep a row iff its id hash falls under its stratum's
    * fraction — per-stratum Bernoulli with deterministic membership. Strata
    * missing from `fractions` use `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double, salt: String = ""): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1).foldRight(lit(defaultFraction): Column) {
      case ((stratum, f), rest) => when(col(strataCol) === stratum, lit(f)).otherwise(rest)
    }
    df.filter(unitHash(col(idCol), salt) < threshold)
  }

  /** Temperature-reweighted mixture sampling — the pretraining "data
    * mixing" step: source `s` keeps rate `min(1, target·w_s/(Σw·n_s))`
    * with `w_s = √n_s` (temperature τ = 0.5), up-weighting small sources
    * against dominant ones. Membership by the same unit hash as the other
    * samplers: deterministic and stable as the corpus grows.
    *
    * Cross-engine determinism: √ is IEEE-exact (unlike pow, whose last ulp
    * is libm-dependent), and the weights are quantized to DECIMAL(18,6)
    * before summing so Σw is exact and order-independent — a raw double
    * sum would depend on aggregation order and could flip a borderline row
    * between engines. The rate arithmetic then runs the identical double
    * ops on identical inputs everywhere.
    *
    * 100 TB story: one count aggregate over the corpus, a broadcast of
    * #sources rate rows, then a scan-speed per-row filter — no data
    * shuffle.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String, targetRows: Long,
      salt: String = "", weightCol: Option[String] = None): DataFrame = {
    // weightCol rebases the mixture from row budgets to weighted budgets —
    // e.g. real token counts (tx3b), the unit every pretraining-mix decision
    // is actually made in: n_s = Σ tokens of source s, target = token budget,
    // and each doc keeps rate = min(1, target·w_s/(Σw·n_s)) so the source's
    // EXPECTED sampled tokens hit its temperature share. Weighted sums of
    // longs stay exact, so cross-engine bit-identity is unchanged.
    val counts = df.groupBy(col(sourceCol))
      .agg(weightCol.map(c => sum(col(c))).getOrElse(count(lit(1))).as("__n"))
      .withColumn("__w", sqrt(col("__n").cast("double")).cast(graft.ops.Exact.D6))
    val total = counts.agg(sum(col("__w")).cast("double").as("__tw"))
    val rates = counts.crossJoin(broadcast(total))
      .select(col(sourceCol),
        least(lit(1.0),
          lit(targetRows.toDouble) * (col("__w").cast("double") / col("__tw")) /
            col("__n").cast("double")).as("__rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(unitHash(col(idCol), salt) < col("__rate"))
      .drop("__rate")
  }

  /** Fixed-size deterministic reservoir per key: the `n` rows with the
    * smallest id hash win (hash order ≈ uniform random order, but stable).
    * One shuffle on the key; state per key is the reservoir, not the group.
    */
  def reservoirPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unitHash(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** SP5: weighted sampling without replacement via priority sampling
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007): each row gets priority
    * `q = w / u` with `u = unitHash(id)` uniform in (0,1), and the `n`
    * highest-priority rows per stratum are kept — inclusion probability
    * rises with weight, and the scheme supports unbiased subset-sum
    * estimators via the (n+1)-th priority threshold.
    *
    * Chosen over Efraimidis–Spirakis (`u^(1/w)` keys) deliberately: E-S
    * needs `pow`/`ln`, whose last-ulp behavior is libm-dependent, while a
    * single double division is IEEE-exact — the same bits on every engine,
    * so the selected SET is oracle-checkable, not just its size. Same
    * determinism contract as the other samplers: stable membership across
    * runs, engines and cluster sizes.
    *
    * 100 TB story: identical shape to [[reservoirPerKey]] — a scan-speed
    * per-row priority projection, then one shuffle on the stratum for the
    * windowed top-n; per-key state is the reservoir, never the group.
    */
  def prioritySamplePerKey(df: DataFrame, keyCol: String, idCol: String,
      weightCol: String, n: Int, salt: String = ""): DataFrame = {
    val priority = col(weightCol).cast("double") / unitHash(col(idCol), salt)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(priority.desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** SP8: walk-forward temporal folds with an EMBARGO gap — time-series
    * cross-validation the way backtesting requires it (López de Prado's
    * purged walk-forward): fold k trains on the `trainDays`-day window
    * starting at day `k·testDays` (days counted from `origin`) and tests
    * on the `testDays`-day window that begins `embargoDays` AFTER the
    * train window ends. The embargo is the leakage guard a random or even
    * a plain chronological split lacks: features computed over trailing
    * windows (rolling stats, lagged labels) spill up to the window length
    * across a naked boundary, so rows within `embargoDays` of the train
    * edge belong to NEITHER side. A row serves as train in some folds and
    * test in others — that is the point of walk-forward — so the output
    * is one row per (input row, fold, role) membership.
    *
    * Determinism: day arithmetic is integer datediff from a LITERAL
    * origin date, fold boundaries are integer literals — the same
    * membership on any engine, any run, any cluster size (no rand, no
    * data-dependent quantiles). 100 TB story: the fold table is `nFolds`
    * rows and broadcasts; membership is a map-side range test per row ×
    * fold (a broadcast nested-loop against nFolds rows — bounded fan-out
    * ≤ nFolds, no shuffle).
    */
  def walkForwardFolds(df: DataFrame, tsCol: Column, origin: String,
      nFolds: Int, trainDays: Int, testDays: Int, embargoDays: Int,
      dayCol: String = "day_offset"): DataFrame = {
    require(nFolds > 0 && trainDays > 0 && testDays > 0 && embargoDays >= 0,
      s"need nFolds/trainDays/testDays > 0 and embargoDays >= 0, got " +
        s"$nFolds/$trainDays/$testDays/$embargoDays")
    // A typo'd origin would make to_date(lit(origin)) null, datediff null,
    // and the join predicate false for EVERY row — zero folds instead of
    // an error. Parse eagerly so it fails loudly on the driver.
    try java.time.LocalDate.parse(origin)
    catch {
      case e: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"origin must be an ISO date (yyyy-MM-dd), got '$origin'", e)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val folds = (0 until nFolds).map { k =>
      val trainStart = k * testDays
      val trainEnd = trainStart + trainDays
      val testStart = trainEnd + embargoDays
      (k, trainStart, trainEnd, testStart, testStart + testDays)
    }.toDF("fold", "__tr0", "__tr1", "__te0", "__te1")
    val day = datediff(to_date(tsCol), to_date(lit(origin)))
    df.withColumn(dayCol, day)
      .join(broadcast(folds),
        (col(dayCol) >= col("__tr0") && col(dayCol) < col("__tr1")) ||
          (col(dayCol) >= col("__te0") && col(dayCol) < col("__te1")))
      // a joined row is in exactly one of the two (disjoint) ranges:
      // train days are < __tr1 and test days are >= __te0 >= __tr1
      .withColumn("role",
        when(col(dayCol) < col("__tr1"), lit("train")).otherwise(lit("test")))
      .drop("__tr0", "__tr1", "__te0", "__te1")
  }
}

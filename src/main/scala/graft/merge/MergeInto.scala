package graft.merge

import graft.ops.Core
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE / upsert semantics without a table format (SURVEY.md §2.9 M1/M2).
  *
  * The reference's signature operation is a staged BigQuery MERGE:
  * `MERGE target USING staging ON <composite key> WHEN MATCHED UPDATE all
  * WHEN NOT MATCHED INSERT all` (ref: `snowflake_bq_sync_daily Time
  * Details/main.py:197-206`; audit-column variant
  * `snowflake_bq_sync Time details/daily_sync.py:252-269`).
  *
  * Spark has no MERGE on plain parquet, so the operator is the relational
  * rewrite: dedup the source latest-wins per key, then
  * `target ANTI-JOIN source  UNION ALL  source`. One shuffle on the merge
  * keys; no driver-side key lists (the reference's 1000-key `NOT IN`
  * truncation at `work_item_budget_vs_actual_…_daily/main.py:374-378` is a
  * scalability bug we deliberately do not reproduce).
  *
  * Scale note: at 100 TB the target should be partitioned by the snapshot
  * date column (see [[AtomicWriter]] and Dml.overwritePartitions) so a daily
  * merge rewrites only touched partitions, and the anti-join shuffles only
  * the merge keys after Catalyst column pruning.
  */
object MergeInto {

  /** Audit-column policy (M2). `fixedTimestamp`/deterministic uuid make the
    * operator reproducible under test; production uses `uuid()` +
    * `current_timestamp()` like the reference.
    */
  final case class Audit(
      uuidCol: String = "row_uuid",
      tsCol: String = "bq_ingestion_timestamp",
      deterministic: Boolean = false,
      fixedTimestamp: Option[String] = None)

  /** M1: pure upsert. `source` rows win over `target` rows with the same key;
    * within `source`, the greatest `orderCol` wins (latest-wins, matching the
    * staging table's most-recent-extract semantics).
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      orderCol: Option[String] = None,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val deduped = orderCol match {
      case Some(c) => Core.dedupByKey(source, keys, col(c).desc +: tieBreak)
      case None => source.dropDuplicates(keys)
    }
    val kept = target.join(deduped.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(deduped.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /** One WHEN MATCHED action of the full MERGE grammar ([[mergeClauses]]).
    * `condition`/`set` expressions reference the two sides through the
    * aliases `t` (target) and `s` (source): `col("s.price") < 0`,
    * `Map("price" -> col("s.price") * 2)`. An [[MergeAction.Update]] with
    * an empty `set` updates ALL columns from the source (the reference's
    * update-all shape).
    */
  sealed trait MergeAction
  object MergeAction {
    final case class Update(condition: Option[Column] = None,
        set: Map[String, Column] = Map.empty) extends MergeAction
    final case class Delete(condition: Option[Column] = None) extends MergeAction
  }

  /** M10: the FULL conditional-clause MERGE grammar (Delta's published
    * clause model — `WHEN MATCHED [AND cond] THEN UPDATE SET …/DELETE`,
    * repeated, plus `WHEN NOT MATCHED [AND cond] THEN INSERT`), as the
    * relational rewrite on plain frames:
    *
    *  - `matched` clauses evaluate IN ORDER per matched (target, source)
    *    pair; the FIRST clause whose condition holds applies (update or
    *    delete); no applicable clause leaves the target row unchanged.
    *  - unmatched target rows always carry through.
    *  - `insert`: None = no insert clause (matched-only merge); Some(cond)
    *    inserts source rows matching nothing, where `cond` holds
    *    (`lit(true)` = insert all — the classic upsert).
    *
    * One left-outer join on the keys decides matched actions (a nested
    * CASE over the clause list — pure codegen, no UDFs), one anti join
    * feeds inserts; both shuffle on the merge keys only. Source is
    * deduped latest-wins per key first (`orderCol`), same as [[merge]] —
    * SQL MERGE's "multiple source rows match" error case cannot arise.
    */
  def mergeClauses(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      matched: Seq[MergeAction],
      insert: Option[Column] = None,
      orderCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "mergeClauses needs at least one merge key")
    require(matched.nonEmpty || insert.nonEmpty, "at least one clause required")
    // the rewrite claims two working columns; a side already carrying either
    // name would fail later as an opaque ambiguous-reference
    // AnalysisException — refuse up front with the actual contract instead
    Seq("__matched", "__action").foreach { r =>
      require(!target.columns.contains(r) && !source.columns.contains(r),
        s"mergeClauses reserves the working column name `$r` — rename it on the " +
          "input frames before merging")
    }
    val deduped = orderCol match {
      case Some(c) => Core.dedupByKey(source, keys, Seq(col(c).desc))
      case None => source.dropDuplicates(keys)
    }
    val t = target.alias("t")
    val s = deduped.withColumn("__matched", lit(true)).alias("s")
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, keyCond, "left_outer")
    // first applicable clause index; -1 = keep the target row as-is
    val actionOfMatched: Column = matched.zipWithIndex.foldRight(lit(-1): Column) {
      case ((cl, i), els) =>
        val cond = cl match {
          case MergeAction.Update(c, _) => c.getOrElse(lit(true))
          case MergeAction.Delete(c) => c.getOrElse(lit(true))
        }
        when(coalesce(cond, lit(false)), lit(i)).otherwise(els)
    }
    val withAction = joined.withColumn("__action",
      when(col("s.__matched").isNull, lit(-1)).otherwise(actionOfMatched))
    val deleteIdx = matched.zipWithIndex.collect {
      case (MergeAction.Delete(_), i) => i }
    val kept =
      if (deleteIdx.isEmpty) withAction
      else withAction.filter(!col("__action").isin(deleteIdx.map(Int.box): _*))
    val outCols = target.columns.toIndexedSeq.map { c =>
      matched.zipWithIndex.foldRight(col(s"t.$c"): Column) {
        case ((MergeAction.Update(_, set), i), els) =>
          // SQL SET semantics: columns not in the SET keep the TARGET value;
          // an EMPTY set is the update-ALL-from-source shape
          val v = if (set.isEmpty) col(s"s.$c") else set.getOrElse(c, col(s"t.$c"))
          when(col("__action") === i, v).otherwise(els)
        case (_, els) => els
      }.as(c)
    }
    val updated = kept.select(outCols: _*)
    insert match {
      case None => updated
      case Some(cond) =>
        val ins = deduped.alias("s")
          .join(target.alias("t"), keyCond, "left_anti")
          .filter(coalesce(cond, lit(false)))
          .select(target.columns.toIndexedSeq.map(c => col(s"s.$c").as(c)): _*)
        updated.unionByName(ins)
    }
  }

  /** M2: upsert with audit columns. Matched rows keep their existing
    * `row_uuid` but refresh the ingestion timestamp; new rows get a fresh
    * uuid + timestamp (ref: `daily_sync.py:252-269`).
    */
  def mergeWithAudit(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      audit: Audit,
      orderCol: Option[String] = None): DataFrame = {
    val ts: Column = audit.fixedTimestamp
      .map(s => lit(s).cast("timestamp_ntz"))
      .getOrElse(current_timestamp())
    val freshUuid: Column =
      if (audit.deterministic) md5(concat_ws("|", keys.map(c => col(c).cast("string")): _*))
      else expr("uuid()")

    val deduped = orderCol match {
      case Some(c) => Core.dedupByKey(source, keys, Seq(col(c).desc))
      case None => source.dropDuplicates(keys)
    }
    // Carry existing uuids across the merge: left join source→target on keys.
    val existing = target.select((keys.map(col) :+ col(audit.uuidCol).as("__existing_uuid")): _*)
    val srcWithAudit = deduped
      .join(existing, keys, "left")
      .withColumn(audit.uuidCol, coalesce(col("__existing_uuid"), freshUuid))
      .drop("__existing_uuid")
      .withColumn(audit.tsCol, ts)
    val kept = target.join(deduped.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(srcWithAudit.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /** Partition-scoped MERGE against a date-partitioned parquet target: read
    * ONLY the partitions the source touches (static partition pruning on the
    * collected partition values — control-plane-small, one per touched day),
    * merge, and rewrite just those directories via
    * [[Dml.overwritePartitions]]. The partition column must be part of the
    * merge key — the reference's fact grain is exactly that,
    * (TIME_ENTRY_ID, REPORTING_DATE) / (WORK_ITEM_ID, REPORTING_DATE)
    * (`snowflake_bq_sync_daily Time Details/main.py:197-206`) — so a matched
    * row can never move between partitions and the untouched ones stay
    * byte-identical.
    */
  def mergePartitioned(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keys: Seq[String],
      partitionCol: String,
      orderCol: Option[String] = None,
      audit: Option[Audit] = None): Unit = {
    require(keys.contains(partitionCol),
      s"partition-scoped merge needs '$partitionCol' in the merge keys; " +
        "otherwise a matched row could move partitions and strand its old copy")
    val fs = new org.apache.hadoop.fs.Path(targetPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(targetPath))) {
      val deduped = orderCol match {
        case Some(c) => Core.dedupByKey(source, keys, Seq(col(c).desc))
        case None => source.dropDuplicates(keys)
      }
      Dml.overwritePartitions(deduped, targetPath, Seq(partitionCol))
    } else if (!isPartitionedLayout(fs, targetPath, partitionCol)) {
      // Layout guard: dynamic partition overwrite on a target previously
      // written UNPARTITIONED (e.g. by AtomicWriter.overwrite / fullSync)
      // would add partitionCol=… subdirectories while leaving the old
      // root-level parquet files in place — read-back would then double-count
      // every pre-existing row. Fall back to a full merge through the atomic
      // write-and-swap, which also converts the target to the partitioned
      // layout so subsequent merges take the scoped path.
      val target = spark.read.parquet(targetPath)
      val merged = audit match {
        case Some(a) => mergeWithAudit(target, source, keys, a, orderCol)
        case None =>
          merge(target, source.select(target.columns.map(col).toIndexedSeq: _*), keys, orderCol)
      }
      AtomicWriter.overwrite(merged, targetPath, Seq(partitionCol))
    } else {
      val touched = source.select(col(partitionCol)).distinct().collect()
        .map(_.get(0)).toIndexedSeq
      val nonNull = touched.filter(_ != null)
      val target = spark.read.parquet(targetPath)
      val pruned = target.filter(
        if (nonNull.length == touched.length) col(partitionCol).isin(nonNull: _*)
        else col(partitionCol).isin(nonNull: _*) || col(partitionCol).isNull)
      val merged = audit match {
        case Some(a) => mergeWithAudit(pruned, source, keys, a, orderCol)
        case None =>
          merge(pruned, source.select(pruned.columns.map(col).toIndexedSeq: _*), keys, orderCol)
      }
      // localCheckpoint decouples the self-read from the overwrite of the
      // same path (the touched window only — bounded, not the whole target),
      // rather than relying on dynamic mode deferring deletes to commit time.
      Dml.overwritePartitions(merged.localCheckpoint(true), targetPath, Seq(partitionCol))
    }
  }

  /** A target directory is in partitioned layout iff it has `col=…`
    * subdirectories and no stray root-level data files (a mixed layout means
    * a previous unpartitioned writer touched it — treat as not partitioned).
    */
  private def isPartitionedLayout(
      fs: org.apache.hadoop.fs.FileSystem, path: String, partitionCol: String): Boolean = {
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
    val hasPartDirs =
      entries.exists(e => e.isDirectory && e.getPath.getName.startsWith(partitionCol + "="))
    val hasRootData =
      entries.exists(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
    hasPartDirs && !hasRootData
  }
}

/** Atomic write-and-swap for plain-parquet targets (the staging-table +
  * MERGE lifecycle of ref `snowflake_bq_sync_daily Time Details/main.py:120-123,217-219`
  * collapsed into write-temp-then-rename). Readers see either the old or the
  * new table, never a partial write.
  */
object AtomicWriter {
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hadoopConf)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp__")
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".__old__")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(tmp, dst)
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}

package graft.sources

import graft.schema.ReferenceCatalog
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.sql.Date
import java.time.LocalDate
import scala.util.Random

/** Deterministic domain-shaped fixture generator (FIXTURES.md): the
  * reference's data pathologies on its own schemas — duplicate
  * (TIME_ENTRY_ID, REPORTING_DATE) pairs with differing ingestion
  * timestamps, budget allocations replicated across sync dates, NULL
  * USER_NAME / REPORTING_DATE rows, snapshot ties — so the view DAG and the
  * cleanup operators are exercised exactly where the reference needed fixes.
  * Seed fixed at 42; every run generates identical data.
  */
object FixtureGen {

  private val seed = 42
  private def date(base: LocalDate, plusDays: Int): Date = Date.valueOf(base.plusDays(plusDays))
  private val jul1 = LocalDate.of(2025, 7, 1)

  def users(n: Int = 40): Seq[String] = (1 to n).map(i => f"U$i%02d")

  /** USER_TIME_ENTRY_BQ: ~2k rows, ~5% duplicated keys with newer ingestion
    * timestamps (the `daily_sync.py:92-107` cleanup target), some NULL
    * WORK_ITEM_ID and zero/negative minutes (dirty-data rows the diagnostics
    * count).
    */
  def timeEntries(spark: SparkSession, nEntries: Int = 2000, nItems: Int = 300): DataFrame = {
    val rnd = new Random(seed)
    val us = users()
    val base = (0 until nEntries).map { i =>
      // ~3% anonymous entries (NULL user): the rows the V5 predicate drops
      // and the fallback view's disjunctive join has to survive
      val user = if (rnd.nextInt(30) == 0) null else us(rnd.nextInt(us.length))
      val item = if (rnd.nextInt(100) < 2) null else f"W${rnd.nextInt(nItems)}%03d"
      val d = date(jul1, rnd.nextInt(62))
      val minutes = rnd.nextInt(100) match {
        case 0 => 0L
        case 1 => -30L
        case _ => (15 + rnd.nextInt(466)).toLong
      }
      val billable: java.lang.Boolean =
        if (rnd.nextInt(20) == 0) null else java.lang.Boolean.valueOf(rnd.nextBoolean())
      Row(f"TE$i%05d", d, item, user, if (user == null) null else user + " Name",
        minutes, billable,
        f"uuid-$i%05d", java.time.LocalDateTime.of(2025, 9, 1, 0, 0).plusMinutes(i.toLong))
    }
    val dups = (0 until nEntries by 40).map { i =>
      val r = base(i)
      Row(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5), r.get(6),
        f"uuid-dup-$i%05d",
        java.time.LocalDateTime.of(2025, 9, 2, 0, 0).plusMinutes(i.toLong)) // newer ingestion
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ dups, 4), ReferenceCatalog.userTimeEntry)
  }

  /** WORK_ITEM_DETAILS_BQ: ~300 items × 3–10 snapshots on the full 45-column
    * reference schema; a few items carry a duplicated max-date snapshot row
    * (the latest-view tie case), some have NULL due dates/budgets. Due dates
    * all precede 2025-08-29 so schedule/past-due flags are stable for any
    * `asOf` from 2025-09-01 on. */
  def workItemDetails(spark: SparkSession, nItems: Int = 300): DataFrame = {
    val rnd = new Random(seed + 1)
    val us = users()
    val statuses = Seq("Planned", "In Progress", "Completed", "Closed")
    def ldt(d: Int, h: Int) =
      java.time.LocalDateTime.of(2025, 7, 1, 0, 0).plusDays(d.toLong).plusHours(h.toLong)
    val rows = (0 until nItems).flatMap { w =>
      val snaps = 3 + rnd.nextInt(8)
      val budget: java.lang.Long =
        if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf((600 + rnd.nextInt(6000)).toLong)
      val assigned = us(rnd.nextInt(us.length))
      val created = us(rnd.nextInt(us.length))
      val due: java.time.LocalDateTime =
        if (rnd.nextInt(8) == 0) null else ldt(rnd.nextInt(55), rnd.nextInt(24))
      val snapsRows = (0 until snaps).map { s =>
        val status = statuses(math.min(s, 3).min(statuses.length - 1))
        val completed = status == "Completed" || status == "Closed"
        val teMinutes = (s * 120).toLong
        Row(
          f"W$w%03d", date(jul1, s * 7 + rnd.nextInt(3)), s"Work item $w",
          f"C${w % 50}%02d", f"Client ${w % 50}",
          if (w % 3 == 0) "Company" else "Individual",
          f"IC${w % 20}%02d", s"Internal ${w % 20}",
          "ACC1", "Account One",
          f"WT${w % 3}", Seq("Tax", "Audit", "Advisory")(w % 3),
          f"PS${math.min(s, 3)}", f"SS$s", status, "On Track",
          java.lang.Long.valueOf(s.toLong), ldt(s * 7, 9), if (w % 4 == 0) "MONTHLY" else null,
          ldt(0, 8), created, created + " Name",
          ldt(1, 9),
          assigned, assigned + " Name",
          due, if (due == null) null else due.plusDays(5),
          if (completed) ldt(50, 17) else null,
          if (completed) assigned else null,
          if (completed) assigned + " Name" else null,
          null, f"TPL${w % 5}", s"Template ${w % 5}", s"Description of work item $w",
          java.lang.Long.valueOf((1000 + rnd.nextInt(5000)).toLong),
          budget,
          if (budget == null) null else java.lang.Long.valueOf(budget * 3),
          java.lang.Long.valueOf(rnd.nextInt(500).toLong),
          java.lang.Long.valueOf(rnd.nextInt(300).toLong),
          java.lang.Long.valueOf(teMinutes),
          java.lang.Long.valueOf(teMinutes * 2),
          if (budget == null) null else java.lang.Double.valueOf((budget - teMinutes) / 60.0),
          java.lang.Long.valueOf(s.toLong), java.lang.Long.valueOf((snaps - s).toLong),
          java.lang.Boolean.valueOf(rnd.nextInt(4) == 0))
      }
      // tie: duplicate the final snapshot row for every 37th item
      if (w % 37 == 0) snapsRows :+ snapsRows.last else snapsRows
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), ReferenceCatalog.workItemDetails)
  }

  /** WORK_ITEM_BUDGET_VS_ACTUAL_BQ: 1–4 allocations per item, each
    * replicated over 2–3 sync dates (the 7-column dedup target), plus NULL
    * USER_NAME and NULL REPORTING_DATE rows, and budget-only users. */
  def budgetVsActual(spark: SparkSession, nItems: Int = 300): DataFrame = {
    val rnd = new Random(seed + 2)
    val us = users()
    val tasks = Seq("Prep", "Review", "Filing")
    val roles = Seq("Senior", "Junior", "Manager")
    val rows = (0 until nItems).flatMap { w =>
      val nAlloc = 1 + rnd.nextInt(4)
      (0 until nAlloc).flatMap { a =>
        val user = if (rnd.nextInt(25) == 0) null else us(rnd.nextInt(us.length))
        val task = tasks(rnd.nextInt(3)); val role = roles(rnd.nextInt(3))
        // allocation index in the low digit: two allocations of one item can
        // never share BUDGETED_MINUTES, so the 7-col dedup partitions of
        // same-amount same-role allocations never merge (tied sync dates
        // inside a merged partition would make rn=1 nondeterministic)
        val minutes = (60 + rnd.nextInt(1200)).toLong * 10 + a
        val syncs = 2 + rnd.nextInt(2)
        (0 until syncs).map { sIdx =>
          // at most one NULL sync date per allocation so the 7-column window
          // dedup's ORDER BY sync_reporting_date DESC never ties on NULL
          val d: Date = if (sIdx == 0 && rnd.nextInt(20) == 0) null
            else date(jul1.plusDays(10), sIdx * 7)
          // USER_NAME formatted like DIMN_USER/USER_TIME_ENTRY_BQ ("Uxx Name")
          // so budget users and time users meet in the V5 universe join
          Row(d, f"W$w%03d", s"Work item $w",
            f"WT${w % 3}", Seq("Tax", "Audit", "Advisory")(w % 3),
            s"TT-$task", task, "Y", s"R-$role", role,
            "ACC1", "Account One",
            user, if (user == null) null else user + " Name",
            f"IC${w % 20}%02d", s"Internal ${w % 20}",
            f"C${w % 50}%02d", s"Client ${w % 50}",
            minutes, (minutes * (50 + rnd.nextInt(70)) / 100),
            minutes * 2, minutes)
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), ReferenceCatalog.workItemBudgetVsActual)
  }

  def clientDimension(spark: SparkSession, n: Int = 50): DataFrame = {
    val us = users()
    val rows = (0 until n).map { c =>
      Row(f"C$c%02d", s"Client $c", if (c % 3 == 0) "Company" else "Individual",
        if (c % 3 == 0) "LLC" else "Person",
        us(c % us.length), us(c % us.length) + " Name",
        us((c + 7) % us.length), us((c + 7) % us.length) + " Name",
        "NZ", s"Region ${c % 4}", s"City ${c % 10}",
        "ACC1", "Account One", java.time.LocalDateTime.of(2024, 1, 1, 0, 0))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ReferenceCatalog.clientDimension)
  }

  /** PRODUCTIVITY_REPEATS_SYNC: ~1 row per 3rd work item, the V4 measure
    * taxonomy (`…view_v4.sql:106-119`: Productivity / SLA / Productivity SLA). */
  def productivityRepeats(spark: SparkSession, nItems: Int = 300): DataFrame = {
    val rnd = new Random(seed + 3)
    def dec(x: Int) = new java.math.BigDecimal(x).setScale(2)
    val measures = Seq("Productivity", "SLA", "Productivity SLA")
    val rows = (0 until nItems by 3).map { w =>
      Row(f"W$w%03d", "Repeats", s"Project ${w % 7}", measures(rnd.nextInt(3)),
        dec(1 + rnd.nextInt(10)), dec(1 + rnd.nextInt(3)), dec(5 + rnd.nextInt(20)),
        java.time.LocalDateTime.of(2025, 8, 20, 6, 0), "sync-agent")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ReferenceCatalog.productivityRepeats)
  }

  /** DIMN_CLIENT_GROUP: one group row per client (grain CLIENT_GROUP_ID×CLIENT,
    * SURVEY §1.4) — every 5 clients share a group. */
  def clientGroupDimension(spark: SparkSession, n: Int = 50): DataFrame = {
    val rows = (0 until n).map { c =>
      Row(f"G${c / 5}%02d", s"Group ${c / 5}", f"C$c%02d", s"Client $c",
        if (c % 5 == 0) "PRIMARY" else "MEMBER", "ACC1", "Account One")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ReferenceCatalog.clientGroupDimension)
  }

  /** DIMN_TENANT_TEAM: 4 teams, no hierarchy (the reference has 6 flat rows). */
  def tenantTeamDimension(spark: SparkSession): DataFrame = {
    val rows = (0 until 4).map { t =>
      Row(f"T$t%02d", s"Team $t", null, null, "ACC1", "Account One")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ReferenceCatalog.tenantTeamDimension)
  }

  /** DIMN_TENANT_TEAM_MEMBER: each user belongs to exactly one team. */
  def tenantTeamMemberDimension(spark: SparkSession): DataFrame = {
    val rows = users().zipWithIndex.map { case (u, i) =>
      Row(f"TM$i%02d", f"T${i % 4}%02d", u, "ACC1", "Account One")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      ReferenceCatalog.tenantTeamMemberDimension)
  }

  def userDimension(spark: SparkSession): DataFrame = {
    val rows = users().zipWithIndex.map { case (u, i) =>
      Row(u + " Name", u, "Accountant", s"$u@example.com", "2024-01-01", "2024-01-02",
        if (i % 10 == 9) "Inactive" else "Active",
        java.lang.Long.valueOf(6000L), java.lang.Long.valueOf(1200L),
        java.lang.Boolean.valueOf(i % 10 == 0), "ACC1", "Account One")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ReferenceCatalog.userDimension)
  }
}

package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tx10: cross-document line deduplication — the CCNet / C4 boilerplate
  * removal step: a line that recurs across documents (header, nav bar, cookie
  * banner, license footer) is kept only in the FIRST document it appears in
  * (ordered by (idCol, position)) and dropped from every later one; each
  * document's surviving lines are rebuilt in their original order. CCNet
  * (Wenzek et al. 2020 §3.1) does this per paragraph; C4 (Raffel et al. 2020
  * §2.2) per three-sentence span — the unit here is whatever `delim` splits.
  *
  * Scale shape: two shuffles, each moving each line's text exactly once —
  * (1) hash-partition on (scope…, line) for the keep-first window: a
  * streaming row_number, no group buffering, and the heaviest groups are
  * exactly the boilerplate being dropped; (2) re-group on the document id to
  * rebuild, where group size is bounded by the document itself. Both stages
  * carry only (keys, pos, line) — no payload columns ride along.
  */
object LineDedup {

  /** Returns one row per input document: `idCol`, `scopeCols`, the rebuilt
    * text (`outCol`), and `lines_kept` / `lines_dropped` counts. Duplicate
    * detection is scoped to `scopeCols` (e.g. per crawl snapshot / source):
    * the same line in two different scopes survives in both.
    */
  def dropDuplicateLines(df: DataFrame, idCol: String, textCol: String,
      scopeCols: Seq[String] = Nil, delim: String = "\n",
      outCol: String = "text_clean"): DataFrame = {
    val keyCols = (idCol +: scopeCols).map(col)
    val lines = df.select(
      keyCols :+ posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("__pos", "__line")): _*)
    val w = Window.partitionBy(scopeCols.map(col) :+ col("__line"): _*)
      .orderBy(col(idCol), col("__pos"))
    lines.withColumn("__rn", row_number().over(w))
      .groupBy(keyCols: _*)
      .agg(
        array_join(
          transform(
            sort_array(collect_list(when(col("__rn") === 1,
              struct(col("__pos").as("p"), col("__line").as("l"))))),
            x => x("l")),
          delim).as(outCol),
        count(when(col("__rn") === 1, 1)).as("lines_kept"),
        count(when(col("__rn") =!= 1, 1)).as("lines_dropped"))
  }
}

package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact substring-duplication statistics — the "duplicated span"
  * signal of suffix-array-style training-data dedup (find text regions
  * that recur verbatim ACROSS documents), re-expressed as fixed-length
  * token windows: a window is duplicated when its n-gram occurs in at
  * least one OTHER document. Within-doc repetition is deliberately NOT
  * counted here — that is the q52 repetition-signal family; this
  * operator measures cross-doc boilerplate (licenses, headers, templated
  * spans), the usual removal target.
  *
  * Scale shape: windows travel as 64-bit hashes (`ngramHashes` — gram
  * strings never materialize), and the heavy shuffle carries one row per
  * DISTINCT (gram, doc) pair, not per occurrence. This is inherently the
  * most shuffle-intensive op in the dedup family (the suffix-array job
  * it stands in for is a dedicated multi-hour pipeline stage at 100 TB);
  * production would pre-filter with a doc-frequency sketch (CountMin /
  * bloom of grams seen in >1 doc) so only plausibly-shared grams enter
  * the exact count — the exact two-level aggregation here is the
  * verifiable core that such a sketch would gate.
  */
object Substring {

  /** Per-doc window statistics: `(idCol, n_windows, dup_windows,
    * dup_frac)` where `dup_windows` counts window POSITIONS whose n-gram
    * also appears in another doc, and `dup_frac` = dup_windows /
    * n_windows (0 for docs shorter than n tokens).
    */
  def windowStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, "window length must be >= 2 tokens")
    val gh = TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), n)
    val base = docs.select(col(idCol), gh.as("__g"))
    // ngramHashes is null (not empty) below n tokens — count that as 0
    val nWin = base.select(col(idCol),
      coalesce(size(col("__g")), lit(0)).cast("long").as("n_windows"))

    // one row per (gram, doc) with its occurrence count, then the
    // cross-doc doc-count as a WINDOW over the same rollup (gid is
    // distinct per (gram, doc), so the partition row count IS the doc
    // count) — no second aggregation branch, no semi-join, no barrier:
    // one linear pipeline (gram,doc)-agg → gram-window → doc-agg
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__gram"))
    val stats = base
      .select(col(idCol), explode(col("__g")).as("__gram"))
      .groupBy(col("__gram"), col(idCol))
      .agg(count(lit(1)).as("__occ"))
      .withColumn("__nd", count(lit(1)).over(w))
      .groupBy(col(idCol))
      .agg(sum(when(col("__nd") > 1, col("__occ")).otherwise(lit(0L)))
        .as("__dup"))

    // docs below n tokens never enter the rollup — restore them with 0s
    nWin.join(stats, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("__dup"), lit(0L)).cast("long").as("dup_windows"),
        when(col("n_windows") > 0,
          coalesce(col("__dup"), lit(0L)).cast("double") /
            col("n_windows").cast("double"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** VARIABLE-LENGTH duplicated spans — the exact-substring-dedup
    * signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), whose suffix-array pipeline removes any
    * ≥50-token span that recurs verbatim across documents. The
    * distributed re-expression: a position is duplicated when its
    * n-token window recurs in another doc ([[windowStats]]'s signal),
    * and a maximal RUN of consecutive duplicated positions of window-
    * run-length r is a duplicated span of `r + n - 1` tokens — exactly
    * the suffix-array span when the overlap is with a single partner,
    * the union of chained overlaps otherwise (standard for the windowed
    * approximation; spans shorter than n tokens are invisible).
    *
    * Output per doc: `(idCol, n_windows, n_dup_spans,
    * longest_span_tokens)` — the removal decision inputs (Lee et al.
    * cut spans with `longest_span_tokens >= threshold`).
    *
    * Scale shape: windows travel as 64-bit hashes, and the gram stream
    * (one row per window position — the ~linear-in-corpus bulk) goes
    * through exactly ONE wide exchange: a (gram, doc) hash-aggregation
    * that rolls the doc's positions into a list. The cross-doc count is
    * then a window over that rollup (gid rows are distinct per
    * (gram, doc), so the gram-partition row count IS the doc count —
    * [[windowStats]]'s trick), and only positions of ACTUALLY-duplicated
    * grams re-explode into the per-doc run-length scan. The previous
    * shape (distinct + re-aggregate + sort-merge join of the full
    * position stream back onto the dup-gram set) exchanged the gram
    * stream three times, computed the explode twice, and sorted all of
    * it in the join — measured 24×/decade at the sf100 ladder point;
    * this shape removes the join and two of the three wide exchanges.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, "window length must be >= 2 tokens")
    val gh = TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), n)
    val base = docs.select(col(idCol), gh.as("__g"))
    val nWin = base.select(col(idCol),
      coalesce(size(col("__g")), lit(0)).cast("long").as("n_windows"))
    val pos = base.select(col(idCol), posexplode(col("__g")))
      .toDF(idCol, "__i", "__gram")
    // one row per (gram, doc) carrying that doc's window positions; the
    // cross-doc count rides a window over the same rollup, and only
    // dup-gram positions survive to the explode
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("__gram"))
    val dupPos = pos
      .groupBy(col("__gram"), col(idCol))
      .agg(collect_list(col("__i")).as("__is"))
      .withColumn("__nd", count(lit(1)).over(wg))
      .filter(col("__nd") > 1)
      .select(col(idCol), explode(col("__is")).as("__i"))
    // islands of consecutive duplicated positions per doc: the classic
    // i - row_number() grouping key is constant exactly along a run
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__i"))
    val spans = dupPos
      .withColumn("__grp", col("__i") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nspans"), max(col("__run")).as("__maxrun"))
    nWin.join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("__nspans"), lit(0L)).cast("long").as("n_dup_spans"),
        coalesce(col("__maxrun") + lit(n - 1), lit(0L)).cast("long")
          .as("longest_span_tokens"))
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style line-level boilerplate removal (the paragraph dedup of
  * Wenzek et al. 2020, CCNet §3.2): a line appearing in at least
  * `minDocFreq` DISTINCT documents is boilerplate (navigation bars,
  * cookie banners, copyright footers — content repeated across a site)
  * and is removed from every document; remaining lines keep their
  * original order. Complements q94's span DETECTION: this operator
  * actually REWRITES the corpus at line granularity.
  *
  * 100-TB shape: one explode + TWO shuffles total — the line
  * doc-frequency aggregate (map-side partial combine on the line key)
  * and the per-document reassembly. The frequent-line set is then at
  * most (total lines / minDocFreq) distinct values — heavy hitters by
  * construction — so membership is a BROADCAST anti join: the corpus'
  * exploded lines never shuffle for the filter itself. A line repeated
  * inside ONE document counts once toward its doc-frequency (distinct
  * doc count), so self-repetition (q52's signal) can never promote a
  * line to boilerplate.
  */
object LineDedup {

  /** Per input row: `idCol`, `clean_text` (kept lines joined by `sep`;
    * empty string when every line dropped — the row never vanishes),
    * `n_lines_kept`, `n_lines_dropped`. `sep` is a literal separator,
    * not a regex.
    */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long, sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would drop every line")
    require(sep.nonEmpty, "separator must be non-empty")
    val splitter = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val lines = docs.select(col(idCol),
      posexplode(splitter).as(Seq("__pos", "__line")))
    val frequent = lines.groupBy(col("__line"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__line")
    val kept = lines.join(broadcast(frequent), Seq("__line"), "left_anti")
    val reassembled = kept.groupBy(col(idCol))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")), sep).as("__clean"),
        count(lit(1)).as("n_lines_kept"))
    docs.select(col(idCol), size(splitter).as("__total"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__total") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_dropped"))
  }
}

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
  * doc-frequency aggregate and the per-document reassembly. Lines are
  * hashed to 64 bits (xxhash64) BEFORE the frequency aggregate, so the
  * heavy shuffle moves 8-byte keys instead of full line strings and the
  * frequent-line set is a compact long column regardless of line length.
  * The membership filter is then size-gated: the frequent set is
  * materialized once (localCheckpoint — executor-local blocks, lineage
  * truncated, auto-cleaned when the plan is GC'd) and counted; at or
  * under `maxBroadcastLines` it is broadcast (corpus lines never shuffle
  * for the filter), above it the anti join degrades gracefully to a
  * shuffle on the 8-byte hash key — never an unbounded driver-side
  * collect. At 100 TB with a permissive `minDocFreq`, "lines in ≥2 docs"
  * is billions of strings; the old unconditional broadcast would have
  * OOM'd the driver, the gated form just shuffles.
  *
  * Hashing makes membership probabilistic: two distinct lines colliding
  * on 64 bits are conflated (expected collisions ≈ n²/2⁶⁵ for n distinct
  * lines — at 10¹⁰ lines that's ~3 spurious drops corpus-wide, noise for
  * a boilerplate pass). A line repeated inside ONE document still counts
  * once toward its doc-frequency (distinct doc count), so self-repetition
  * (q52's signal) can never promote a line to boilerplate.
  */
object LineDedup {

  /** Per input row: `idCol`, `clean_text` (kept lines joined by `sep`;
    * empty string when every line dropped — the row never vanishes),
    * `n_lines_kept`, `n_lines_dropped`. `sep` is a literal separator,
    * not a regex. `maxBroadcastLines` gates the broadcast of the
    * frequent-line hash set (8 bytes/entry; the 4M default is ~32 MB,
    * inside a typical executor broadcast budget).
    */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long, sep: String = "\n",
      maxBroadcastLines: Long = 4L << 20): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would drop every line")
    require(sep.nonEmpty, "separator must be non-empty")
    val splitter = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val lines = docs.select(col(idCol),
        posexplode(splitter).as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
    val frequent = lines.groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__lh")
      .localCheckpoint()
    val probe =
      if (frequent.count() <= maxBroadcastLines) broadcast(frequent) else frequent
    val kept = lines.join(probe, Seq("__lh"), "left_anti")
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

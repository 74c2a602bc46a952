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
  * Laziness/liveness contract: the size gate needs the frequent-line
  * count, so [[dropFrequentLines]] and [[dropFrequentLinesWithStore]]
  * run Spark jobs (localCheckpoint + count of the frequent set) AT CALL
  * TIME — the returned DataFrame is not a fully lazy plan. And because
  * the checkpointed set has no lineage, losing an executor that holds
  * its blocks between the call and the caller's action fails that
  * action unrecoverably — re-invoke the operator (inputs are immutable,
  * the recompute is deterministic) or persist the result if the gap
  * between construction and consumption is long.
  *
  * Hashing makes membership probabilistic: two distinct lines colliding
  * on 64 bits are conflated (expected collisions ≈ n²/2⁶⁵ for n distinct
  * lines — at 10¹⁰ lines that's ~3 spurious drops corpus-wide, noise for
  * a boilerplate pass). A line repeated inside ONE document still counts
  * once toward its doc-frequency (distinct doc count), so self-repetition
  * (q52's signal) can never promote a line to boilerplate.
  *
  * INCREMENTAL form (the q53/IncrementalDedup posture — per-batch work
  * scales with the batch, not the corpus): [[lineFrequencyStore]]
  * persists one (line_hash, doc_freq) row per distinct batch line,
  * [[mergeLineStores]] adds stores from disjoint-doc batches (doc
  * frequencies are additive exactly when no doc id appears in two
  * batches — the append-only crawl contract), and
  * [[dropFrequentLinesWithStore]] rewrites a batch against the merged
  * store. History is never rescanned; a line that only LATER crosses
  * the threshold is removed from subsequent batches but not
  * retroactively from earlier ones (inherent to any streaming CCNet
  * pass — re-run the batch form for a full-corpus restatement).
  */
object LineDedup {

  private def splitter(textCol: String, sep: String): Column =
    split(col(textCol), java.util.regex.Pattern.quote(sep))

  /** One row per line occurrence: `idCol`, `__pos`, `__line`, `__lh`. */
  private def explodedLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    docs.select(col(idCol),
        posexplode(splitter(textCol, sep)).as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))

  /** Shared rewrite stage: drop `frequentHashes` (one `__lh` column)
    * from `lines`, reassemble per doc in original order. Size-gates the
    * membership broadcast (see the object scaladoc).
    */
  private def removeLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String, lines: DataFrame, frequentHashes: DataFrame,
      maxBroadcastLines: Long): DataFrame = {
    val frequent = frequentHashes.localCheckpoint()
    val probe =
      if (frequent.count() <= maxBroadcastLines) broadcast(frequent) else frequent
    val kept = lines.join(probe, Seq("__lh"), "left_anti")
    val reassembled = kept.groupBy(col(idCol))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")), sep).as("__clean"),
        count(lit(1)).as("n_lines_kept"))
    docs.select(col(idCol), size(splitter(textCol, sep)).as("__total"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__total") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_dropped"))
  }

  /** Per input row: `idCol`, `clean_text` (kept lines joined by `sep`;
    * empty string when every line dropped — the row never vanishes),
    * `n_lines_kept`, `n_lines_dropped`. `sep` is a literal separator,
    * not a regex. `maxBroadcastLines` gates the broadcast of the
    * frequent-line hash set (8 bytes/entry; the 4M default is ~32 MB,
    * inside a typical executor broadcast budget).
    * Runs the frequency aggregation eagerly at call time — see the
    * object scaladoc for the eager-action / executor-liveness contract.
    */
  def dropFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long, sep: String = "\n",
      maxBroadcastLines: Long = 4L << 20): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would drop every line")
    require(sep.nonEmpty, "separator must be non-empty")
    val lines = explodedLines(docs, idCol, textCol, sep)
    val frequent = lines.groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__lh")
    removeLines(docs, idCol, textCol, sep, lines, frequent, maxBroadcastLines)
  }

  /** One batch's line doc-frequency store: `(line_hash, doc_freq)` per
    * distinct line, `doc_freq` counting DISTINCT batch docs. This is
    * what an ingest persists per snapshot — bounded by the batch's
    * distinct-line count, 16 bytes a row.
    */
  def lineFrequencyStore(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    explodedLines(docs, idCol, textCol, sep)
      .groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .select(col("__lh").as("line_hash"), col("doc_freq"))
  }

  /** Add per-batch stores. Doc frequencies are additive ONLY for
    * disjoint doc-id batches (each doc counted in exactly one store) —
    * the append-only ingest contract; re-delivering a doc to two
    * batches overcounts, which is the caller's idempotency ledger's job
    * to prevent (see streaming.BatchLedger).
    */
  def mergeLineStores(stores: Seq[DataFrame]): DataFrame = {
    require(stores.nonEmpty, "mergeLineStores needs at least one store")
    stores.reduce(_ unionByName _)
      .groupBy(col("line_hash"))
      .agg(sum(col("doc_freq")).as("doc_freq"))
  }

  /** Rewrite ONE batch against a (merged) frequency store: lines whose
    * store-wide `doc_freq` reaches `minDocFreq` drop from the batch.
    * Output schema matches [[dropFrequentLines]]. The store is the
    * accumulated corpus knowledge — per-batch cost never rescans
    * history, only the batch and the store.
    */
  def dropFrequentLinesWithStore(batch: DataFrame, store: DataFrame,
      idCol: String, textCol: String, minDocFreq: Long, sep: String = "\n",
      maxBroadcastLines: Long = 4L << 20): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would drop every line")
    require(sep.nonEmpty, "separator must be non-empty")
    val lines = explodedLines(batch, idCol, textCol, sep)
    val frequent = store.filter(col("doc_freq") >= minDocFreq)
      .select(col("line_hash").as("__lh"))
    removeLines(batch, idCol, textCol, sep, lines, frequent, maxBroadcastLines)
  }
}

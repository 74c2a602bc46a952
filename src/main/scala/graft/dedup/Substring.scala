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

  /** Positions-per-gram bound above which a gram is routed through the
    * hot path (see [[hotGrams]]). 256K positions ≈ a few MB per window
    * partition — comfortably one task, far below spill territory.
    */
  val DefaultHotGramCap: Long = 1L << 18

  /** Doc-sampling fraction for the hot-gram probe. */
  val DefaultSampleFrac: Double = 0.01

  /** Salt-bucket count for witnessed-hot rows. A hot gram's rows spread
    * over this many window partitions — enough that even a
    * 30-billion-position boilerplate gram lands ~7M rows per task, few
    * enough that WindowExec's per-partition setup stays negligible
    * (the first cut used per-ROW singleton salts: correct, but 85M
    * one-row window groups measured 1.75× slower than no guard at all
    * on the sf100 stress corpus — per-group overhead swamped the win).
    */
  val HotSaltBuckets: Int = 4096

  /** Sample-probed hot grams WITH exact cross-doc witnesses — the skew
    * guard for the gram windows below. A real corpus is Zipfian in the
    * gram key (one boilerplate license header present in millions of
    * documents), and a window partition cannot be split by AQE, so the
    * raw `partitionBy(__gram)` pass would funnel every occurrence of
    * such a gram into a single task's sort. This probe tokenizes a
    * `frac` doc-sample and flags grams that are BOTH frequent in the
    * sample (estimated count above `cap`, with 4× slack so a true-hot
    * gram is flagged with overwhelming probability) AND seen in ≥ 2
    * distinct sampled docs. The second condition makes the flag an
    * exact WITNESS, not an estimate: those two docs really do contain
    * the gram, so every flagged gram is cross-doc duplicated by
    * definition and its positions need no sort at all — the callers
    * give flagged rows a salt-bucketed window key and force the dup
    * verdict. Routing is sample-dependent; ANSWERS are not (both paths
    * are exact). Grams hot within a single doc are deliberately left
    * cold: their partition size is bounded by one document's length.
    *
    * The flagged set is small by construction (≤ corpus positions /
    * cap), so it broadcasts. At 100 TB the probe is the cheap pass that
    * replaces the doc-frequency sketch production would maintain.
    */
  /** Session cache for [[hotGrams]]: the probe result depends only on
    * (corpus, n, cap, frac), and q62 + q94 probe the SAME corpus with
    * the same parameters — one sample+aggregate pass per corpus per
    * session instead of one per call. Scoped PER SparkSession via a
    * strong-keyed outer map with EAGER eviction: every access first
    * sweeps entries whose session's SparkContext is stopped (their
    * executor-stored checkpoint blocks died with the context, so
    * dropping the map entry is the whole cleanup). A weak-keyed map
    * cannot do this job — the cached DataFrames strongly reference
    * their SparkSession, so the weak key stays reachable through its
    * own value and never collects; strong keys also mean a recycled
    * identity hash can never alias a dead session's entries. Inner key =
    * canonicalized-plan hash + the concrete input-file inventory (a
    * parquet rewrite mints new part-file names, so an in-place table
    * swap misses the cache rather than serving a stale witness — the
    * forced-dup verdict is only correct while its two witness docs
    * exist). Values are localCheckpointed (executor-stored, driver
    * never holds the flagged set; bounded ≤ positions/cap). The inner
    * map is a bounded LRU ([[ProbeCacheMaxEntries]]); evicted entries'
    * checkpoint RDDs are unpersisted eagerly rather than waiting for
    * the ContextCleaner (a caller that held a returned DataFrame
    * across ≥ [[ProbeCacheMaxEntries]] other corpora's probes and then
    * re-executed it would fail — localCheckpoint lineage is truncated;
    * callers consume the probe within one query, and a fresh [[hotGrams]]
    * call always recomputes). The probe itself runs OUTSIDE both locks —
    * two concurrent first probes race benignly (the loser's duplicate
    * checkpoint is unpersisted), instead of one blocking a whole Spark
    * job behind a map bin lock.
    */
  private val probeCaches =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.SparkSession,
      java.util.LinkedHashMap[String, DataFrame]]()

  /** The per-session inner cache, after sweeping every DEAD session's
    * entry (context stopped → its checkpoint blocks are already gone;
    * removing the entry releases the DataFrames and the session).
    */
  private def probeCacheFor(session: org.apache.spark.sql.SparkSession):
      java.util.LinkedHashMap[String, DataFrame] = {
    val it = probeCaches.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    probeCaches.computeIfAbsent(session,
      _ => new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true))
  }

  private[graft] val ProbeCacheMaxEntries = 8

  /** Eagerly free a localCheckpointed probe's storage blocks. The
    * checkpointed Dataset scans a [[org.apache.spark.sql.execution.LogicalRDD]]
    * whose RDD holds the cached blocks; Dataset.unpersist would only
    * consult the CacheManager (no entry here), so unpersist the RDD.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => // not a checkpoint scan — nothing to free
    }

  private[graft] def hotGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int, cap: Long, frac: Double): DataFrame = {
    val session = docs.sparkSession
    val key = Seq(docs.queryExecution.analyzed.semanticHash(),
      docs.inputFiles.toSeq.sorted.hashCode,
      idCol, textCol, n, cap, frac).mkString(":")
    // accessOrder = true inside: iteration order is LRU for eviction
    val cache = probeCacheFor(session)
    cache.synchronized { Option(cache.get(key)) } match {
      case Some(hit) => hit
      case None =>
        // compute + checkpoint outside the lock (a Spark job)
        val computed =
          probeHotGrams(docs, idCol, textCol, n, cap, frac).localCheckpoint()
        cache.synchronized {
          val prior = cache.get(key)
          if (prior != null) {
            unpersistCheckpoint(computed) // lost the race: keep the winner
            prior
          } else {
            cache.put(key, computed)
            while (cache.size > ProbeCacheMaxEntries) {
              val it = cache.entrySet().iterator()
              val eldest = it.next()
              unpersistCheckpoint(eldest.getValue)
              it.remove()
            }
            computed
          }
        }
    }
  }

  private def probeHotGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int, cap: Long, frac: Double): DataFrame = {
    val thresh = math.max(16L, (cap * frac / 4).toLong)
    val gh = TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), n)
    docs.sample(withReplacement = false, frac, seed = 42L)
      .select(col(idCol), explode(gh).as("__gram"))
      .groupBy(col("__gram"))
      .agg(count(lit(1)).as("__sn"),
        min(col(idCol)).as("__smn"), max(col(idCol)).as("__smx"))
      .filter(col("__sn") > thresh && col("__smn") =!= col("__smx"))
      .select(col("__gram"), lit(true).as("__hot"))
  }

  /** Per-doc window statistics: `(idCol, n_windows, dup_windows,
    * dup_frac)` where `dup_windows` counts window POSITIONS whose n-gram
    * also appears in another doc, and `dup_frac` = dup_windows /
    * n_windows (0 for docs shorter than n tokens).
    *
    * `hotGramCap` enables the [[hotGrams]] skew guard (≤ 0 disables):
    * witnessed-hot grams take salt-bucketed window partitions with
    * the dup verdict forced — identical answers, bounded task input.
    */
  def windowStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, hotGramCap: Long = DefaultHotGramCap,
      sampleFrac: Double = DefaultSampleFrac): DataFrame = {
    require(n >= 2, "window length must be >= 2 tokens")
    val gh = TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), n)
    val base = docs.select(col(idCol), gh.as("__g"))

    // one row per (gram, doc) with its occurrence count, then the
    // cross-doc doc-count as a WINDOW over the same rollup (gid is
    // distinct per (gram, doc), so the partition row count IS the doc
    // count) — no second aggregation branch, no semi-join, no barrier:
    // one linear pipeline (gram,doc)-agg → gram-window → doc-agg.
    // Witnessed-hot grams (broadcast flag) are already known cross-doc,
    // so their rollup rows spread over per-doc-hash salt buckets
    // instead of piling a Zipfian doc set into one task.
    val rollup = base
      .select(col(idCol), explode(col("__g")).as("__gram"))
      .groupBy(col("__gram"), col(idCol))
      .agg(count(lit(1)).as("__occ"))
    val stats = (if (hotGramCap <= 0) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__gram"))
      rollup.withColumn("__isdup", count(lit(1)).over(w) > 1)
    } else {
      val hot = hotGrams(docs, idCol, textCol, n, hotGramCap, sampleFrac)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(
        col("__gram"),
        when(col("__hot"), pmod(xxhash64(col(idCol)), lit(HotSaltBuckets.toLong)))
          .otherwise(lit(0L)))
      rollup.join(broadcast(hot), Seq("__gram"), "left")
        .withColumn("__hot", coalesce(col("__hot"), lit(false)))
        .withColumn("__isdup", col("__hot") || count(lit(1)).over(w) > 1)
    })
      .groupBy(col(idCol))
      // sum(__occ) over a doc's rollup rows IS its window count (every
      // exploded position lands in exactly one (gram, doc) row), so the
      // total rides the SAME aggregate — the previous shape re-ran the
      // whole tokenize + n-gram-hash pass over the corpus purely to
      // count windows per doc (guide §1.4: don't compute twice)
      .agg(sum(when(col("__isdup"), col("__occ")).otherwise(lit(0L)))
        .as("__dup"),
        sum(col("__occ")).as("__tot"))

    // docs below n tokens never enter the rollup — restore them with 0s
    // (the restore side scans doc ids only: no text read, no tokenize)
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__tot"), lit(0L)).cast("long").as("n_windows"),
        coalesce(col("__dup"), lit(0L)).cast("long").as("dup_windows"),
        when(coalesce(col("__tot"), lit(0L)) > 0,
          coalesce(col("__dup"), lit(0L)).cast("double") /
            coalesce(col("__tot"), lit(0L)).cast("double"))
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
    * through exactly ONE wide exchange, with NO aggregation buffering at
    * all: a position is cross-doc duplicated iff `min(doc) != max(doc)`
    * over its gram's window partition, so the whole dup probe is one
    * sorted gram-window pass and only duplicated positions continue into
    * the per-doc run-length scan. Measured at the 100× ladder point
    * against the alternatives: the original shape (distinct +
    * re-aggregate + sort-merge join of the full position stream back
    * onto the dup-gram set: three wide exchanges, double explode) ran
    * 24×/decade; a (gram, doc) `collect_list` rollup halves that but
    * pays ObjectHashAggregate's sort-based fallback at corpus-scale
    * group counts; the min/max window runs at the single-exchange floor
    * (~linear per decade once shuffle parallelism scales with data).
    *
    * `hotGramCap` bounds that exchange's worst task (≤ 0 disables): a
    * [[hotGrams]]-witnessed gram is already PROVEN cross-doc, so its
    * positions skip the min/max test entirely — they get a salted
    * per-position bucketed window key (bounded partitions, spread across the
    * cluster by hash) and a forced dup verdict. The Zipfian boilerplate
    * gram that would otherwise put millions of rows into one window
    * sort never reaches a shared partition; answers are unchanged.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, hotGramCap: Long = DefaultHotGramCap,
      sampleFrac: Double = DefaultSampleFrac): DataFrame = {
    require(n >= 2, "window length must be >= 2 tokens")
    val gh = TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))), n)
    val base = docs.select(col(idCol), gh.as("__g"))
    // the restore/denominator side needs only the WINDOW COUNT:
    // max(tokens - (n-1), 0) ≡ coalesce(size(ngramHashes), 0) — same
    // value without re-hashing every token and materializing the gram
    // arrays a second time (the dup stream below is filtered, so the
    // count cannot ride its aggregate the way windowStats' does)
    val nWin = docs.select(col(idCol),
      greatest(size(TextFunctions.tokens(col(textCol))) - lit(n - 1),
        lit(0)).cast("long").as("n_windows"))
    val pos = base.select(col(idCol), posexplode(col("__g")))
      .toDF(idCol, "__i", "__gram")
    // cross-doc test per position without aggregating: min(doc) !=
    // max(doc) over the gram's window partition ⇔ the gram occurs in
    // more than one distinct doc (both extremes computed in the same
    // single window pass)
    val dupPos = (if (hotGramCap <= 0) {
      val wg = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__gram"))
      pos.withColumn("__xdoc",
        min(col(idCol)).over(wg) =!= max(col(idCol)).over(wg))
    } else {
      val hot = hotGrams(docs, idCol, textCol, n, hotGramCap, sampleFrac)
      val wg = org.apache.spark.sql.expressions.Window.partitionBy(
        col("__gram"),
        when(col("__hot"),
            pmod(xxhash64(col(idCol), col("__i")), lit(HotSaltBuckets.toLong)))
          .otherwise(lit(0L)))
      pos.join(broadcast(hot), Seq("__gram"), "left")
        .withColumn("__hot", coalesce(col("__hot"), lit(false)))
        .withColumn("__xdoc", col("__hot") ||
          min(col(idCol)).over(wg) =!= max(col(idCol)).over(wg))
    })
      .filter(col("__xdoc"))
      .select(col(idCol), col("__i"))
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

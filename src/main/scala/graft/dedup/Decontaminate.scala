package graft.dedup

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Eval-set decontamination: flag (or drop) training documents that share
  * long word n-grams with any document of a benchmark/eval table — the
  * gate every real training-data pipeline runs so test examples can't
  * leak into the training corpus and inflate eval scores.
  *
  * The classic rule (publicly documented in the GPT-3 and PaLM reports)
  * is n-gram collision: a training doc is contaminated when it shares at
  * least one n-gram of length >= n (13-gram in those reports; 8 here,
  * scaled to the testdata's short synthetic docs) with the eval set.
  * `overlapStats` reports hits so callers can also apply a
  * fraction-of-document threshold.
  *
  * Scale design (NEVER all-pairs, unlike near-dedup this is corpus ×
  * small-benchmark):
  *   - both sides shingle in one narrow codegen pass (same machinery as
  *     MinHashDedup);
  *   - grams join by 64-bit hash, not text, so the corpus-side exchange
  *     is (hash, id) ~16 bytes per gram occurrence;
  *   - the benchmark gram set is collapsed to DISTINCT hashes and
  *     broadcast: eval sets are orders of magnitude smaller than the
  *     corpus by construction (thousands of docs vs billions), so the
  *     contamination probe is a broadcast-hash-join — the 100 TB corpus
  *     side never shuffles at all;
  *   - counting distinct hashes instead of distinct grams can only
  *     differ if two distinct grams of one doc collide in 64 bits
  *     (~2^-64 per pair — negligible, and countDistinct stays exact).
  */
object Decontaminate {

  private def gramHashes(textCol: Column, n: Int): Column =
    array_distinct(TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(textCol)), n))

  /** Per training doc: `n_grams` (its distinct n-gram count), `n_hits`
    * (how many of those appear in ANY benchmark doc), and `contaminated`
    * (`n_hits >= minHits`). Docs shorter than `n` tokens have zero grams
    * and are never contaminated.
    *
    * ONE corpus pass: grams explode_outer (gram-less docs keep a null
    * row), left-broadcast-join the benchmark gram set, and a single
    * per-doc aggregation counts grams and hits together — no second
    * corpus scan for the totals, no post-join fill. Per-doc grams are
    * already distinct, so plain counts are distinct counts.
    */
  def overlapStats(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchTextCol: String, n: Int = 8,
      minHits: Int = 1): DataFrame = {
    require(n >= 2, "decontamination n-grams must be at least 2 tokens")
    require(minHits >= 1, "minHits must be >= 1")
    val trainGrams = train
      .select(col(idCol), explode_outer(gramHashes(col(textCol), n)).as("__gh"))
    val benchGrams = bench
      .select(explode(gramHashes(col(benchTextCol), n)).as("__gh"))
      .distinct()
      .withColumn("__hit", lit(true))
    trainGrams.join(broadcast(benchGrams), Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__gh")).cast("int").as("n_grams"),
        count(col("__hit")).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** The benchmark's view of contamination — the report an eval owner
    * reads to decide which items to retire: per benchmark doc, how many
    * distinct training docs share >= `minHits` n-grams with it, and the
    * largest such overlap. Zero-hit benchmark docs are kept (count 0).
    * Same broadcast shape as [[overlapStats]], but the benchmark gram
    * set keeps its doc ids instead of collapsing to a distinct set.
    */
  def benchmarkReport(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchIdCol: String, benchTextCol: String, n: Int = 8,
      minHits: Int = 1): DataFrame = {
    require(n >= 2, "decontamination n-grams must be at least 2 tokens")
    require(minHits >= 1, "minHits must be >= 1")
    val trainGrams = train
      .select(col(idCol).as("__tid"), explode(gramHashes(col(textCol), n)).as("__gh"))
    val benchGrams = bench
      .select(col(benchIdCol).as("bench_id"),
        explode(gramHashes(col(benchTextCol), n)).as("__gh"))
    val perPair = trainGrams.join(broadcast(benchGrams), Seq("__gh"))
      .groupBy(col("bench_id"), col("__tid"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minHits)
    val report = perPair.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_contaminating_docs"),
        max(col("__shared")).as("max_shared_grams"))
    bench.select(col(benchIdCol).as("bench_id"))
      .join(report, Seq("bench_id"), "left")
      .na.fill(0L, Seq("n_contaminating_docs", "max_shared_grams"))
  }

  /** The training table minus contaminated docs (left-anti on the flagged
    * id set). `minHits` = how many shared distinct n-grams convict.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, benchTextCol: String, n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val flagged = overlapStats(train, bench, idCol, textCol, benchTextCol, n, minHits)
      .filter(col("contaminated"))
      .select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}

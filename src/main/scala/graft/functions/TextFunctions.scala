package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, word shingles, quality scoring, stopword-based language
  * ID. Everything here is Spark built-in expressions (codegen'd, no UDFs),
  * so at 100 TB these run as a narrow map over the scan — zero shuffle,
  * full WholeStageCodegen.
  */
object TextFunctions {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** BPE-ish regex tokenization: letter runs, digit runs, single other
    * chars. regexp_extract_all is codegen'd.
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Word n-gram shingles joined with spaces; empty array when the doc is
    * shorter than n (guard matters: Spark's `sequence(1, 0)` counts DOWN).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Per-token 64-bit hashes — the input to [[ngramHashes]]. */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))

  /** Word n-gram IDENTITY hashes built from per-token hashes: element i
    * is `xxhash64(...xxhash64(h_i, h_i+1)..., h_i+n-1)` — equal n-grams
    * get equal hashes, distinct ones collide with prob ~2^-64. This is
    * the hash-space twin of [[shingles]]: set operations (distinct,
    * intersect, union sizes — Jaccard) give the same answers as on the
    * gram strings, but nothing ever materializes or compares strings —
    * measured severalfold faster on the minhash and decontamination
    * paths. A NATIVE codegen'd expression (one loop per row) — the
    * earlier n-1 chained `zip_with` formulation paid an interpreted
    * lambda walk per element per level and allocated n-1 intermediate
    * arrays; it survives as [[ngramHashesFold]], the bit-equality spec
    * oracle. Empty when the doc is shorter than n.
    */
  def ngramHashes(toksh: Column, n: Int): Column = {
    require(n >= 2, "ngramHashes needs n >= 2 (use tokenHashes for unigrams)")
    graft.expressions.HashExpressions.ngramHashes(toksh, n)
  }

  /** The chained-`zip_with` formulation the native expression replaced —
    * kept as the independently-derived oracle for its bit-equality spec
    * (each fold step is `xxhash64(acc, next)` against a shifted view;
    * the null-padded tail is cut by the final slice).
    */
  private[graft] def ngramHashesFold(toksh: Column, n: Int): Column = {
    require(n >= 2, "ngramHashes needs n >= 2 (use tokenHashes for unigrams)")
    val sz = size(toksh)
    val rolled = (2 to n).foldLeft(toksh) { (acc, j) =>
      // acc(i) covers tokens i..i+j-2; fold in token i+j-1
      zip_with(acc, slice(toksh, lit(j), greatest(sz - (j - 1), lit(1))),
        (a, b) => xxhash64(a, b))
    }
    when(sz >= n, slice(rolled, lit(1), sz - (n - 1)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Token count of whitespace tokenization. */
  def tokenCount(text: Column): Column = size(tokens(text))

  // Small public stopword lists per language, for the n-gram/stopword
  // language-ID heuristic.
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "zh" -> Seq("的", "了", "是"))

  /** Number of distinct stopwords of `lang` present in the token array.
    * ONE `array_intersect` pass against the stopword literal (returns the
    * distinct members of `toks` that are stopwords) — identical value to
    * summing per-word `array_contains` probes, at 1 array scan per
    * language instead of 6-7.
    */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect(toks, typedLit(stopwords(lang)))).cast("int")

  /** Predicted language by max stopword hits; ties broken by the fixed
    * order en > es > fr > de > zh (deterministic, oracle-reproducible).
    */
  def langId(toks: Column): Column = {
    val order = Seq("en", "es", "fr", "de", "zh")
    val scores = order.map(l => l -> stopwordHits(toks, l)).toMap
    val best = greatest(order.map(scores): _*)
    order.init.foldRight(lit(order.last)) { (l, rest) =>
      when(scores(l) === best, lit(l)).otherwise(rest)
    }
  }

  /** Highest multiplicity of any element in an array, as one codegen'd
    * fold: sort the array, then run-length scan via `aggregate` with a
    * (prev, run, best) struct accumulator — no explode/groupBy shuffle,
    * so per-doc repetition stats stay a narrow map over the scan. 0 for
    * an empty array. `init` must be typed like the elements; its VALUE
    * is irrelevant (run starts at 0, so the first element scores 1
    * whether or not it equals the sentinel). Callers counting string
    * multiplicities should hash to longs first — sorting and comparing
    * longs is several times cheaper than strings.
    */
  def topRunCount(arr: Column, init: Column = lit(0L)): Column = {
    val sorted = sort_array(arr)
    aggregate(sorted,
      struct(init.as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Fraction of array positions occupied by repeats of an earlier
    * element: (total - distinct) / total, 0 for an empty array. Applied
    * to word n-grams this is the Gopher-style duplicate-n-gram
    * boilerplate signal.
    */
  def dupFraction(arr: Column): Column =
    when(size(arr) > 0,
      (size(arr) - size(array_distinct(arr))).cast("double") /
        size(arr).cast("double"))
      .otherwise(lit(0.0))

  /** Fraction of array positions taken by the single most frequent
    * element (Gopher's top-n-gram signal; on raw tokens it catches
    * single-token spam). 0 for an empty array.
    */
  def topElementFraction(arr: Column, init: Column = lit(0L)): Column =
    when(size(arr) > 0,
      topRunCount(arr, init).cast("double") / size(arr).cast("double"))
      .otherwise(lit(0.0))

  /** Heuristic quality score in [0,1]: mixes stopword density, vocabulary
    * diversity, and length. Pure IEEE double arithmetic (no rounding) so
    * it reproduces bit-exactly in any engine.
    */
  def qualityScore(text: Column): Column = qualityScoreFromTokens(tokens(text))

  /** Same score over an already-tokenized column — callers computing
    * several token-based annotations should tokenize ONCE and reuse
    * (every `tokens(...)` use is a separate split pass in the plan).
    */
  def qualityScoreFromTokens(toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val stopRatio = stopwordHits(toks, "en").cast("double") / lit(7.0)
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val lengthScore = least(nTok / lit(100.0), lit(1.0))
    lit(0.3) * least(stopRatio * 2.0, lit(1.0)) +
      lit(0.4) * distinctRatio +
      lit(0.3) * lengthScore
  }
}

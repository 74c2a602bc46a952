package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-cleaning filters from the public LLM-corpus literature,
  * re-expressed as single codegen'd projections (no UDFs, no shuffles —
  * every rule is a higher-order-function pass over the doc's own lines
  * or tokens, so the operators scale as pure map work at any corpus
  * size):
  *
  *  - [[c4LineClean]] — the C4 page/line heuristics (Raffel et al. 2020,
  *    "Exploring the Limits of Transfer Learning", §2.2): keep lines
  *    that end in terminal punctuation and have enough words, drop
  *    lines mentioning javascript, drop whole pages containing code
  *    braces or "lorem ipsum", drop pages left with too few lines.
  *  - [[gopherQuality]] — the Gopher/MassiveText document-quality rules
  *    (Rae et al. 2021, "Scaling Language Models", table A1): word
  *    count, mean word length, symbol-to-word ratio, bullet/ellipsis
  *    line fractions, alphabetic-word fraction, stopword floor.
  *  - [[dedupParagraphs]] — within-document paragraph deduplication
  *    (first occurrence wins, document order preserved) — the page-
  *    internal cousin of the corpus-wide line dedup in
  *    [[graft.dedup.LineDedup]].
  *
  * All rule arithmetic is integer counts and IEEE double ratios, so
  * every decision reproduces bit-exactly in any engine (the DuckDB
  * oracles replay the full rule set declaratively).
  */
object CorpusFilters {

  /** Lines of `text` under literal separator `sep` (regex-quoted). */
  private def lines(text: Column, sep: String): Column =
    split(text, java.util.regex.Pattern.quote(sep))

  private def words(line: Column): Column = split(trim(line), " ")

  /** C4 terminal-punctuation rule: the line's last character is one of
    * `. ! ? "` (Raffel et al. keep only lines that look like prose
    * sentences).
    */
  private def endsTerminal(line: Column): Column = {
    val last = substring(line, -1, 1)
    last.isin(".", "!", "?", "\"")
  }

  /** C4-style page/line cleaning. Per input row: `idCol`,
    * `page_kept` (false ⇒ `clean_text` is empty but the row survives —
    * same never-vanish contract as LineDedup), `has_code` (page contains
    * `{`), `has_lorem` (page contains "lorem ipsum", case-insensitive),
    * `n_lines`, `n_lines_kept`, `clean_text` (kept lines re-joined by
    * `sep`).
    *
    * A line is kept iff it ends in terminal punctuation, has at least
    * `minLineWords` space-separated words, and does not mention
    * "javascript" (case-insensitive). A page is kept iff it has no code
    * brace, no lorem-ipsum marker, and at least `minKeptLines` kept
    * lines. One projection; zero shuffles.
    */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 3,
      sep: String = "\n"): DataFrame = {
    val text = col(textCol)
    val ls = lines(text, sep)
    val keepLine = (l: Column) =>
      endsTerminal(l) && size(words(l)) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(ls, keepLine)
    val hasCode = text.contains("{")
    val hasLorem = lower(text).contains("lorem ipsum")
    val pageKept = !hasCode && !hasLorem && size(kept) >= minKeptLines
    docs.select(col(idCol),
      pageKept.as("page_kept"),
      hasCode.as("has_code"),
      hasLorem.as("has_lorem"),
      size(ls).cast("long").as("n_lines"),
      when(pageKept, size(kept)).otherwise(lit(0)).cast("long")
        .as("n_lines_kept"),
      when(pageKept, array_join(kept, sep)).otherwise(lit(""))
        .as("clean_text"))
  }

  /** Gopher's own stopword floor set (Rae et al. 2021, table A1: "the,
    * be, to, of, and, that, have, with").
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher/MassiveText document-quality signals and keep decision. Per
    * input row: `idCol`, `n_words`, `mean_word_len`, `symbol_ratio`
    * (fraction of words containing `#` or `...`), `alpha_word_frac`
    * (fraction of words with at least one ASCII letter),
    * `bullet_line_frac` (lines starting `- ` or `• `),
    * `ellipsis_line_frac` (lines ending `...`), `stopword_hits`
    * (distinct members of [[gopherStopwords]] present), and `keep`:
    *
    *   50 ≤ n_words ≤ 100000, 3 ≤ mean_word_len ≤ 10,
    *   symbol_ratio ≤ 0.1, bullet_line_frac ≤ 0.9,
    *   ellipsis_line_frac ≤ 0.3, alpha_word_frac ≥ 0.8,
    *   stopword_hits ≥ 2.
    *
    * Ratios are exact-integer-count ÷ exact-integer-count in IEEE
    * doubles, so the thresshold comparisons are engine-reproducible.
    * One projection; zero shuffles.
    */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      sep: String = "\n"): DataFrame = {
    // The line/word arrays feed ~9 metric expressions. Higher-order
    // array functions are CodegenFallback — inlining the array-building
    // chain into every metric re-splits the text per metric per row
    // (measured as the dominant cost of this map-only operator). Stage
    // the arrays as their own projections instead: CollapseProject
    // refuses to duplicate non-cheap expressions referenced more than
    // once (SPARK-36718), so each array is built once per row and the
    // metrics are single passes over materialized arrays.
    val staged = docs
      .select(col(idCol), lines(col(textCol), sep).as("__gq_ls"))
      .select(col(idCol), col("__gq_ls"),
        // words across the whole doc: line separators count as
        // whitespace (flatten per-line word arrays — sep-agnostic)
        filter(flatten(transform(col("__gq_ls"), l => words(l))),
          t => length(t) > 0).as("__gq_toks"))
    val ls = col("__gq_ls")
    val toks = col("__gq_toks")
    val nWords = size(toks).cast("long")
    val nWordsD = nWords.cast("double")
    val meanLen = when(nWords > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / nWordsD).otherwise(lit(0.0))
    val symbolWords = size(filter(toks,
      t => t.contains("#") || t.contains("...")))
    val symbolRatio = when(nWords > 0,
      symbolWords.cast("double") / nWordsD).otherwise(lit(0.0))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val alphaFrac = when(nWords > 0,
      alphaWords.cast("double") / nWordsD).otherwise(lit(0.0))
    val nLines = size(ls)
    val bulletLines = size(filter(ls,
      l => l.startsWith("- ") || l.startsWith("• ")))
    val bulletFrac = when(nLines > 0,
      bulletLines.cast("double") / nLines.cast("double")).otherwise(lit(0.0))
    val ellipsisLines = size(filter(ls, l => l.endsWith("...")))
    val ellipsisFrac = when(nLines > 0,
      ellipsisLines.cast("double") / nLines.cast("double"))
      .otherwise(lit(0.0))
    val stopHits = size(array_intersect(toks, typedLit(gopherStopwords)))
    val keep = nWords >= minWords && nWords <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2
    staged.select(col(idCol),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_word_frac"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      stopHits.cast("long").as("stopword_hits"),
      keep.as("keep"))
  }

  /** Within-document paragraph dedup: drop every repeat of an earlier
    * paragraph, keep document order (C4-adjacent page cleanup; corpus-
    * WIDE frequency-based removal is [[graft.dedup.LineDedup]]'s job).
    * Per input row: `idCol`, `clean_text` (first occurrences re-joined
    * by `sep`), `n_paras`, `n_paras_dropped`.
    *
    * First-occurrence selection is `array_position(paras, p) == i+1`
    * inside one `filter` HOF — O(paras²) character comparisons per doc,
    * a per-row constant for real page shapes (tens of paragraphs), in
    * exchange for zero shuffles and no explode/window pass.
    *
    * The split array is PRE-BOUND as its own projection before the
    * lambda references it: an expression captured inside a HOF lambda is
    * re-evaluated per element (no common-subexpression elimination in
    * interpreted lambda bodies — the [[graft.similarity.ScalarQuant
    * .codes]] contract), so an inline `lines(...)` here would re-split
    * the whole document once per paragraph on top of the documented
    * O(paras²) scans. CollapseProject keeps the two selects apart
    * because `__ps` is referenced more than once and is non-cheap.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = col("__ps")
    val kept = filter(paras, (p, i) => array_position(paras, p) === i + 1L)
    docs.select(col(idCol), lines(col(textCol), sep).as("__ps"))
      .select(col(idCol),
        array_join(kept, sep).as("clean_text"),
        size(paras).cast("long").as("n_paras"),
        (size(paras) - size(kept)).cast("long").as("n_paras_dropped"))
  }
}

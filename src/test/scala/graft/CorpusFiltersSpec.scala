package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CorpusFilters

/** Contract spec for the public-literature corpus filters: C4 page/line
  * cleaning (Raffel et al. 2020 §2.2), Gopher document-quality rules
  * (Rae et al. 2021 table A1), and within-doc paragraph dedup. The
  * oracle gates (q104/q105/q106) replay the full rule sets in DuckDB
  * over planted corpora; this spec pins the rule edges on hand
  * fixtures.
  */
class CorpusFiltersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- C4 ----

  private def c4(rows: (Long, String)*) =
    CorpusFilters.c4LineClean(rows.toDF("id", "text"), "id", "text",
        minLineWords = 5, minKeptLines = 2)
      .as[(Long, Boolean, Boolean, Boolean, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap

  test("c4: line rules — terminal punctuation, word floor, javascript") {
    val got = c4((1L,
      "This line has five good words.\n" + // kept
        "Another proper sentence ends with a bang!\n" + // kept
        "no terminal punctuation on this line\n" + // dropped: no punct
        "Too short.\n" + // dropped: 2 words
        "Please enable javascript to continue browsing here.")) // dropped
    val (_, kept, code, lorem, nLines, nKept, clean) = got(1L)
    assert(kept && !code && !lorem)
    assert(nLines === 5L && nKept === 2L)
    assert(clean === "This line has five good words.\n" +
      "Another proper sentence ends with a bang!")
  }

  test("c4: page rules — code brace, lorem ipsum, kept-line floor") {
    val got = c4(
      (1L, "A fine first sentence stands here.\nif (x) { return; }"),
      (2L, "A fine first sentence stands here.\nLorem Ipsum dolor sit."),
      (3L, "Only one good line survives this page today.\nshort\nnope"))
    assert(got(1L)._3 && !got(1L)._2, "brace pages drop as code")
    assert(got(2L)._4 && !got(2L)._2, "lorem-ipsum pages drop")
    assert(!got(3L)._2 && got(3L)._6 === 0L && got(3L)._7 === "",
      "one kept line < minKeptLines=2 — page dropped, text empty")
  }

  test("c4: question and quote terminals count; ends-with-period only") {
    val got = c4((1L,
      "Does this question count as a sentence?\n" +
        "He said the quote ends like \"this.\"\n" +
        "this.period is internal not terminal x"))
    assert(got(1L)._6 === 2L)
  }

  // ---- Gopher ----

  private def gopher(text: String, minWords: Long = 50L) =
    CorpusFilters.gopherQuality(Seq((1L, text)).toDF("id", "text"),
        "id", "text", minWords = minWords)
      .selectExpr("n_words", "mean_word_len", "symbol_ratio",
        "alpha_word_frac", "bullet_line_frac", "ellipsis_line_frac",
        "stopword_hits", "keep")
      .as[(Long, Double, Double, Double, Double, Double, Long, Boolean)]
      .collect().head

  test("gopher: a clean prose doc passes every rule") {
    val text = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the cat sat on top of all and that with style"
    val g = gopher(text)
    assert(g._1 === 71L && g._7 >= 4L && g._8, s"expected keep, got $g")
  }

  test("gopher: word-count floor and stopword floor reject") {
    assert(!gopher("the and of short doc.")._8, "too few words")
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ")
    val g = gopher(noStops)
    assert(g._7 === 0L && !g._8, "no stopwords — rejected")
  }

  test("gopher: symbol ratio and bullet/ellipsis line fractions") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ") +
      " the of and that"
    val hashy = base + " " + (1 to 10).map(i => s"#h$i").mkString(" ")
    val g = gopher(hashy)
    assert(g._3 > 0.1 && !g._8, "hash spam trips the symbol ratio")
    val bullets = (1 to 9).map(_ => "- bullet item").mkString("\n") +
      "\n" + base
    val gb = gopher(bullets)
    assert(gb._5 === 0.9 && gb._8, "9/10 bullet lines sit AT the 0.9 bound — kept")
    val gb2 = gopher((1 to 19).map(_ => "- bullet item").mkString("\n") +
      "\n" + base)
    assert(gb2._5 === 0.95 && !gb2._8, "19/20 bullet lines — rejected")
  }

  test("gopher: mean word length bounds") {
    val longWords = (1 to 60).map(_ => "extraordinarily").mkString(" ") +
      " the of and that"
    assert(!gopher(longWords)._8, "mean word length > 10 rejects")
  }

  // ---- paragraph dedup ----

  private def paraDedup(rows: (Long, String)*) =
    CorpusFilters.dedupParagraphs(rows.toDF("id", "text"), "id", "text")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap

  test("paragraph dedup: first occurrence wins, order preserved") {
    val got = paraDedup((1L, "A\n\nB\n\nA\n\nC\n\nB"))
    assert(got(1L)._2 === "A\n\nB\n\nC")
    assert(got(1L)._3 === 5L && got(1L)._4 === 2L)
  }

  test("paragraph dedup: adjacent repeats and no-repeat docs") {
    val got = paraDedup((1L, "X\n\nX\n\nX"), (2L, "P\n\nQ"))
    assert(got(1L)._2 === "X" && got(1L)._4 === 2L)
    assert(got(2L)._2 === "P\n\nQ" && got(2L)._4 === 0L)
  }

  test("paragraph dedup: near-identical paragraphs are NOT merged") {
    val got = paraDedup((1L, "same para\n\nsame para \n\nsame para"))
    assert(got(1L)._2 === "same para\n\nsame para " &&
      got(1L)._4 === 1L, "trailing-space variant is a distinct paragraph")
  }
}

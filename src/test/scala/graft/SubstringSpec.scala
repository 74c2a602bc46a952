package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dedup.Substring

class SubstringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cross-doc duplicated windows match hand-computed values") {
    val shared = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      // doc 1: 10 tokens -> 3 windows; windows 1..3 all contain the
      // shared span? No: only window 1 IS the shared 8-gram; the other
      // two windows include tail tokens unique to doc 1
      (1L, shared + " tail1 tail2"),
      // doc 2: the same shared span verbatim -> its single window dups
      (2L, shared),
      // doc 3: unique content, 9 tokens -> 2 windows, none duplicated
      (3L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      // doc 4: too short for any window
      (4L, "tiny doc"))
      .toDF("doc_id", "text")
    val got = Substring.windowStats(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(2L) == ((1L, 1L, 1.0)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("within-doc repetition alone never counts as duplication") {
    val span = "a b c d e f g h"
    // the span occurs TWICE in one doc and nowhere else: both window
    // positions hold the same gram, but no OTHER doc has it
    val docs = Seq(
      (1L, span + " " + span),
      (2L, "totally different words that never collide with anything else"))
      .toDF("doc_id", "text")
    val got = Substring.windowStats(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) == 0L, "within-doc repeats are q52's territory, not cross-doc dup")
  }

  test("every occurrence position of a shared gram counts, not just one") {
    val span = "p q r s t u v w"
    val docs = Seq(
      (1L, span + " " + span), // span twice -> both positions duplicated
      (2L, span))
      .toDF("doc_id", "text")
    val got = Substring.windowStats(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 has 16 tokens -> 9 windows; the two span positions dup
    assert(got(1L)._1 == 9L && got(1L)._2 == 2L)
    assert(got(2L) == ((1L, 1L)))
  }

  test("native ngram_hashes bit-equals the chained zip_with fold") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    val base = Tables.documents(spark, SparkTestSession.sfTiny).limit(150)
    val docs = base.unionByName(
      Seq((999990L, "a b", "en", "s", 0L),                        // < n for n=3,8
        (999991L, "", "en", "s", 0L)).toDF(base.columns: _*))     // degenerate
    for (n <- Seq(2, 3, 8)) {
      val cmp = docs.select(
        TextFunctions.ngramHashes(
          TextFunctions.tokenHashes(TextFunctions.tokens(col("text"))), n).as("native"),
        TextFunctions.ngramHashesFold(
          TextFunctions.tokenHashes(TextFunctions.tokens(col("text"))), n).as("fold"))
      assert(cmp.filter(col("native") =!= col("fold")).isEmpty,
        s"native n=$n diverged from the zip_with fold")
    }
  }

  test("dupSpans recovers exact variable-length spans against a brute oracle") {
    // doc 1 and doc 2 share a 10-token span (-> 3 consecutive dup
    // windows at n=8 -> longest = 3 + 7 = 10); doc 1 additionally
    // shares a second, disjoint 8-token span with doc 3
    val span10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val span8 = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (1L, span10 + " u1 u2 u3 u4 u5 u6 u7 u8 " + span8),
      (2L, "x1 x2 " + span10 + " y1 y2"),
      (3L, span8),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"), // 9 tokens, no overlap
      (5L, "tiny doc"))
      .toDF("doc_id", "text")
    val got = Substring.dupSpans(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: 26 tokens -> 19 windows; spans at positions 0-2 (span10)
    // and 18 (span8) -> 2 spans, longest 10 tokens
    assert(got(1L) === ((19L, 2L, 10L)))
    // doc 2: 14 tokens -> 7 windows; one 3-window run -> one 10-token span
    assert(got(2L) === ((7L, 1L, 10L)))
    assert(got(3L) === ((1L, 1L, 8L)))
    assert(got(4L) === ((2L, 0L, 0L)), "sub-n overlaps are invisible")
    assert(got(5L) === ((0L, 0L, 0L)))
  }

  test("property: dupSpans longest span equals brute longest cross-doc span >= n") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 20L), Gen.choose(1, 12).flatMap(Gen.listOfN(_, word))))
    val n = 3
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withInitialSeed(7L),
      Prop.forAll(docGen) { rows =>
        val docs = rows.distinctBy(_._1).map { case (id, ws) => (id, ws.mkString(" ")) }
        val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
        // brute: the longest token span of length >= n that occurs
        // verbatim in at least one OTHER doc — computed by windowed
        // union (identical semantics to the operator: a position is
        // covered when ITS window recurs elsewhere, runs merge)
        val expected = docs.map { case (id, _) =>
          val mine = toks(id)
          val dupPos = (0 to mine.length - n).filter { i =>
            val g = mine.slice(i, i + n).mkString(" ")
            toks.exists { case (oid, os) =>
              oid != id && os.sliding(n).exists(_.mkString(" ") == g)
            }
          }
          // maximal consecutive runs
          val runs = dupPos.foldLeft(List.empty[(Int, Int)]) {
            case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
            case (acc, i) => (i, i) :: acc
          }
          val longest = if (runs.isEmpty) 0L
            else runs.map { case (s, e) => e - s + n }.max.toLong
          id -> ((runs.size.toLong, longest))
        }.toMap
        val got = Substring.dupSpans(docs.toDF("doc_id", "text"),
            "doc_id", "text", n)
          .select("doc_id", "n_dup_spans", "longest_span_tokens")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        got == expected
      })
    assert(res.passed, res.status.toString)
  }

  test("hot-gram guard: planted boilerplate keeps answers and salts the gram window") {
    // one 8-token boilerplate span present in a third of the docs — the
    // Zipfian shape that would pile every occurrence into ONE window
    // task without the guard
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = (1L to 200L).map { i =>
      if (i % 3 == 0) (i, boiler + s" u${i}a u${i}b u${i}c")
      else (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h w${i}i")
    }.toDF("doc_id", "text")

    // the probe flags exactly the planted gram (66 witnessed docs), and
    // nothing else — every other window contains doc-unique tokens
    val flagged = Substring.hotGrams(docs, "doc_id", "text",
      n = 8, cap = 16, frac = 1.0).collect()
    assert(flagged.length == 1, s"expected 1 hot gram, got ${flagged.length}")

    for ((guarded, unguarded) <- Seq(
        (Substring.dupSpans(docs, "doc_id", "text", n = 8,
          hotGramCap = 16, sampleFrac = 1.0),
         Substring.dupSpans(docs, "doc_id", "text", n = 8, hotGramCap = 0)),
        (Substring.windowStats(docs, "doc_id", "text", n = 8,
          hotGramCap = 16, sampleFrac = 1.0),
         Substring.windowStats(docs, "doc_id", "text", n = 8, hotGramCap = 0)))) {
      // identical answers — the guard only reroutes, never re-decides
      assert(guarded.collect().toSet === unguarded.collect().toSet)
      // the gram window is salted: its partitionSpec gained the hot-hash
      // expression (2 exprs), so no single partition can hold a hot gram
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      val specs = guarded.queryExecution.optimizedPlan
        .collect { case w: LWindow => w.partitionSpec.length }
      assert(specs.contains(2),
        s"expected a salted 2-expr window partitionSpec, got $specs")
      val cold = unguarded.queryExecution.optimizedPlan
        .collect { case w: LWindow => w.partitionSpec.length }
      assert(!cold.contains(2), "guard-off plan must keep the raw gram key")
    }
  }

  test("hot-gram guard: single-doc repetition is never flagged hot") {
    // a gram repeated 200× inside ONE doc clears any count threshold but
    // has no cross-doc witness — it must stay cold (and non-dup)
    val span = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (1L, Seq.fill(200)(span).mkString(" ")),
      (2L, "o1 o2 o3 o4 o5 o6 o7 o8 o9"))
      .toDF("doc_id", "text")
    assert(Substring.hotGrams(docs, "doc_id", "text",
      n = 8, cap = 16, frac = 1.0).isEmpty)
    val got = Substring.dupSpans(docs, "doc_id", "text", n = 8,
        hotGramCap = 16, sampleFrac = 1.0)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) == 0L, "within-doc repeats must not become dup spans")
  }

  test("property: window stats match a Scala brute oracle on random corpora") {
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 30L), Gen.choose(1, 10).flatMap(Gen.listOfN(_, word))))
    val n = 3
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withInitialSeed(11L),
      Prop.forAll(docGen) { rows =>
        val docs = rows.distinctBy(_._1).map { case (id, ws) => (id, ws.mkString(" ")) }
        val grams = docs.map { case (id, t) =>
          id -> t.split(" ").sliding(n).filter(_.length == n)
            .map(_.mkString(" ")).toList
        }.toMap
        val expected = docs.map { case (id, _) =>
          val mine = grams(id)
          val dup = mine.count(g =>
            grams.exists { case (oid, gs) => oid != id && gs.contains(g) })
          id -> ((mine.length.toLong, dup.toLong))
        }.toMap
        val got = Substring.windowStats(docs.toDF("doc_id", "text"),
            "doc_id", "text", n)
          .select("doc_id", "n_windows", "dup_windows")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        got == expected
      })
    assert(res.passed, res.status.toString)
  }
}

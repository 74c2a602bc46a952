package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for the exhaustive q20/q42/q67 oracles: those oracles are
  * valid because the 16×4 MinHash banding at j ≥ 0.8 recovers EVERY
  * pair on the driver's testdata (verified bit-identical against brute
  * force at all three sfs when they landed). That is a property of the
  * CORPUS, not an LSH guarantee — a regenerated testdata drop could
  * silently break it, failing three oracle rows at the gate the way the
  * round-7 events-encoding swap zeroed out the temporal family. This
  * spec recomputes LSH-vs-brute parity on the LIVE sf0.001 testdata so
  * `sbt test` names the drift the moment a drop changes the regime;
  * the fix then is either retuned banding or reverting those oracles
  * to rows-only registration.
  */
class NearDupCanarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("16x4 banding at j >= 0.8 is recall-complete on the current testdata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val lsh = graft.dedup.MinHashDedup
      .nearDuplicates(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over the same shingle sets — every pair, no banding
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val sh = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.shingles(toks, 3)).as("s"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s"))).cast("double")).as("j"))
      .filter(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === brute,
      "LSH banding no longer recall-complete on the current testdata — " +
        s"missing ${(brute -- lsh).take(5)} / spurious ${(lsh -- brute).take(5)}; " +
        "the exhaustive q20/q42/q67 oracles are invalid for this drop " +
        "(retune banding or revert them to rows-only)")
    assert(brute.nonEmpty, "canary is vacuous — no near-dup pairs at sf0.001")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** PageRank against an exact driver-side power iteration of the same
  * stochastic matrix (dangling redistribution included) — the brute
  * oracle convention used by the other float-iterative operators.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference power iteration, same completion as the operator. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val n = verts.size
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = verts.filterNot(out.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      edges.foreach { case (s, t) => contrib(t) += rank(s) / out(s) }
      rank = verts.map(v =>
        v -> ((1 - d) / n + d * (dangling / n + contrib(v)))).toMap
    }
    rank
  }

  // a cycle, a dangling sink (5), a feeder (4), and a PARALLEL edge
  // 1→2 (multigraph weighting: counted twice in 1's out-degree)
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (1L, 2L), (3L, 5L))

  test("matches the exact power iteration to 1e-9, dangling mass redistributed") {
    val got = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = ref(edges, 20, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v: $r vs ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      "ranks must stay a probability distribution")
    // structure sanity: the cycle hub out-ranks the pure feeder
    assert(got(1L) > got(4L))
  }

  test("damping factor changes the distribution (and is validated)") {
    val d85 = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d50 = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 10,
        damping = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(d85(1L) - d50(1L)) > 1e-6)
    val want = ref(edges, 10, 0.5)
    d50.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v at d=0.5")
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", 5, damping = 1.0)
    }
  }

  test("all-dangling graph (no out-edges after filtering) stays uniform-ish") {
    // two vertices, one edge: 2 is dangling; after enough iterations
    // ranks still sum to 1 and both stay positive
    val tiny = Seq((1L, 2L))
    val got = PageRank.pageRank(tiny.toDF("src", "dst"), "src", "dst", 15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = ref(tiny, 15, 0.85)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9) }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("distributed path (cap=0) agrees with the driver path to 1e-12") {
    // maxDriverEdges=0 forces the distributed formulation; the default
    // takes the driver path on this tiny graph. Same update rule, only
    // summation order differs — the two must agree to ulp-level.
    val driver = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 12, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(driver.keySet === dist.keySet)
    driver.foreach { case (v, r) =>
      assert(math.abs(r - dist(v)) < 1e-12, s"vertex $v: $r vs ${dist(v)}")
    }
    // and the distributed path still matches the exact reference
    val want = ref(edges, 12, 0.85)
    dist.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"vertex $v vs ref")
    }
  }
}

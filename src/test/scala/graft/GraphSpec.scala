package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain and pair resolve to min-id labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("long chain converges within default iterations") {
    val edges = (1L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 15L).toSet)
  }

  test("edge direction does not matter") {
    val fwd = Seq((5L, 9L), (9L, 7L)).toDF("a", "b")
    val rev = Seq((9L, 5L), (7L, 9L)).toDF("a", "b")
    val g1 = Graph.connectedComponents(fwd, "a", "b")
      .as[(Long, Long)].collect().toMap
    val g2 = Graph.connectedComponents(rev, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(g1 == g2 && g1.values.toSet == Set(5L))
  }

  test("empty edge set yields empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.connectedComponents(edges, "a", "b").count() == 0)
  }

  /** Scalar reference: the same fixed-iteration undirected PageRank
    * on adjacency maps — what the distributed plan must reproduce. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val und = (edges ++ edges.map(_.swap)).distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = adj.keySet
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters)
      r = nodes.map(v => v -> ((1.0 - d) / n +
        d * adj(v).map(u => r(u) / adj(u).size).sum)).toMap
    r
  }

  test("pageRank matches the scalar reference on a star + path graph " +
      "and preserves total mass") {
    // star 1-{2,3,4} plus path 10-11-12: the hub outranks leaves,
    // the path midpoint outranks its ends
    val edges =
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L), (11L, 12L))
    val got = Graph.pageRank(edges.toDF("a", "b"), "a", "b", iters = 4)
      .as[(Long, Long, Double)].collect()
      .map { case (v, deg, r) => v -> (deg, r) }.toMap
    val want = refPageRank(edges, iters = 4)
    assert(got.keySet == want.keySet)
    want.foreach { case (v, r) =>
      assert(math.abs(got(v)._2 - r) < 1e-12, s"node $v: ${got(v)._2} != $r")
    }
    assert(got(1L)._1 == 3 && got(11L)._1 == 2)
    assert(got(1L)._2 > got(2L)._2, "star hub must outrank a leaf")
    assert(got(11L)._2 > got(10L)._2, "path midpoint must outrank ends")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9,
      "no dangling nodes: rank mass must stay 1")
  }

  test("pageRank on a regular graph (triangle) is uniform at every " +
      "iteration count") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val got = Graph.pageRank(tri, "a", "b", iters = 3)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 3)
    got.foreach { case (_, deg, r) =>
      assert(deg == 2 && math.abs(r - 1.0 / 3) < 1e-12)
    }
  }

  test("triangleStats: hand-counted census on triangle+pendant+square") {
    // triangle 1-2-3, pendant 3-4, square 5-6-7-8 (no triangle):
    // 8 nodes, 8 edges; wedges = C(2,2 appears)... degrees:
    // 1:2 2:2 3:3 4:1 5..8:2 -> sum C(d,2) = 1+1+3+0+1+1+1+1 = 9;
    // triangles = 1; clustering = 3/9
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L)
    ).toDF("a", "b")
    val got = Graph.triangleStats(edges, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((8L, 8L, 9L, 1L, 0.333333)))
  }

  test("triangleStats counts each triangle once on a clique") {
    // K4: 4 nodes, 6 edges, C(4,3)=4 triangles, wedges = 4*C(3,2)=12,
    // clustering = 3*4/12 = 1.0
    val k4 = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toDF("a", "b")
    val got = Graph.triangleStats(k4, "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((4L, 6L, 12L, 4L, 1.0)))
  }
}

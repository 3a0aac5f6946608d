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
}

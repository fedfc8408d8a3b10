package graft.sim

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankFixedPoint: ranks sum to ~1e9 and order matches structure") {
    // Path graph 1-2-3-4-5 plus a hub 10 connected to 1,2,3,4,5.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L))
      .toDF("id_a", "id_b")
    val pr = Graph.pageRankFixedPoint(edges, "id_a", "id_b", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(pr.size == 6)
    // Fixed-point truncation only ever loses mass, < deg·1 unit per node
    // per step — the total stays within a few hundred units of 1e9.
    val total = pr.values.sum
    assert(total <= 1000000000L && total > 999999000L, s"total=$total")
    // The hub touches every other node — it must outrank everything.
    assert(pr(10L) == pr.values.max)
    // Symmetric positions get identical ranks (exact integer arithmetic).
    assert(pr(1L) == pr(5L))
    assert(pr(2L) == pr(4L))
  }

  test("pageRankFixedPoint is invariant to partitioning") {
    val rnd = new scala.util.Random(3)
    val edges = (1 to 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).toDF("id_a", "id_b")
    val a = Graph.pageRankFixedPoint(edges, "id_a", "id_b", 4)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.pageRankFixedPoint(edges.repartition(13), "id_a", "id_b", 4)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}

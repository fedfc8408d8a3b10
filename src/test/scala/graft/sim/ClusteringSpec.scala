package graft.sim

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans converges on separated blobs and recovers the partition") {
    // Three tight blobs around (0,0), (10,0), (0,10); ids arranged so the
    // deterministic seeds (ids 0,1,2) land one per blob.
    val rnd = new scala.util.Random(3)
    def blob(cx: Double, cy: Double, ids: Seq[Long]) =
      ids.map(i => (i, Seq(cx + rnd.nextGaussian() * 0.1, cy + rnd.nextGaussian() * 0.1)))
    val rows = blob(0, 0, Seq(0L) ++ (3L to 32L)) ++
      blob(10, 0, Seq(1L) ++ (33L to 62L)) ++
      blob(0, 10, Seq(2L) ++ (63L to 92L))
    val df = rows.toDF("id", "vec")
    val (assign, cents) = Clustering.kmeans(df, "id", "vec", k = 3, maxIter = 15)
    val a = assign.as[(Long, Int)].collect().toMap
    // Every blob is one pure cluster.
    def clusterOf(ids: Seq[Long]) = {
      val cs = ids.map(a).distinct
      assert(cs.size == 1, s"blob split across clusters $cs")
      cs.head
    }
    val c1 = clusterOf(Seq(0L) ++ (3L to 32L))
    val c2 = clusterOf(Seq(1L) ++ (33L to 62L))
    val c3 = clusterOf(Seq(2L) ++ (63L to 92L))
    assert(Set(c1, c2, c3).size == 3)
    // Centroids sit on the blob means (within the 0.1-σ noise).
    val cmap = cents.select("cluster", "c")
      .as[(Int, Seq[Double])].collect().toMap
    assert(math.abs(cmap(c1)(0) - 0) < 0.2 && math.abs(cmap(c1)(1) - 0) < 0.2)
    assert(math.abs(cmap(c2)(0) - 10) < 0.2 && math.abs(cmap(c2)(1) - 0) < 0.2)
    assert(math.abs(cmap(c3)(0) - 0) < 0.2 && math.abs(cmap(c3)(1) - 10) < 0.2)
    // Cluster sizes recorded alongside.
    val sizes = cents.select("cluster", "n").as[(Int, Long)].collect().toMap
    assert(sizes.values.toSeq.sorted == Seq(31L, 31L, 31L))
  }
}

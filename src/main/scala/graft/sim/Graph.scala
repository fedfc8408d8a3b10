package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph analytics over edge DataFrames.
  *
  * Companion to [[graft.text.Dedup.connectedComponents]] (cluster
  * detection): here PageRank scores rank nodes WITHIN a component — e.g.
  * picking the most-central duplicate as a cluster's keeper instead of
  * min-id.
  */
object Graph {

  /** Fixed-point PageRank (Brin & Page 1998) over an undirected edge
    * list, damping 0.85, `iters` power iterations.
    *
    * Determinism by construction: ranks are 1e-9-unit fixed-point LONGS
    * and every step is integral —
    * `r₀ = 1e9 div n`,
    * `rₜ₊₁(v) = 15e7 div n + (85 · Σ_{u→v} (rₜ(u) div deg(u))) div 100` —
    * so the result is bit-identical regardless of aggregation order,
    * partitioning, or engine (float PageRank would drift by summation
    * order). The div-truncation loss (< deg·1e-9 per node per step) is
    * far below any ranking-relevant difference.
    *
    * Shape at 100 TB: `deg` and the undirected edge list persist across
    * iterations; each iteration is one equi-join of edges against the
    * (nodes-sized) rank table plus one hash aggregation on dst — the
    * standard Pregel-style plan. Only `n` (node count) reaches the
    * driver.
    *
    * Output: (id, r) for every node with ≥ 1 edge; Σr ≈ 1e9.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .persist(lvl)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg")).persist(lvl)
    val n = deg.count()
    if (n == 0) {
      und.unpersist(); deg.unpersist()
      return edges.sparkSession.emptyDataFrame
        .withColumn("id", lit(0L)).withColumn("r", lit(0L)).limit(0)
    }
    val base = 150000000L / n
    var ranks = deg.select(col("src").as("id"), lit(1000000000L / n).as("r"))
    for (i <- 1 to iters) {
      ranks = und
        .join(ranks, und("src") === ranks("id"))
        .join(deg, "src")
        .select(col("dst"), expr("r div deg").as("__c"))
        .groupBy("dst")
        .agg(sum("__c").as("__s"))
        .select(col("dst").as("id"),
          (lit(base) + expr("(85 * __s) div 100")).as("r"))
      // Truncate lineage each iteration: a single lazy plan of k chained
      // join+agg stages makes Catalyst re-optimize a plan that doubles
      // in depth every round — fine at 5 iterations, pathological at 50.
      // The checkpointed frame is nodes-sized; results are unchanged
      // (every step is exact integer arithmetic).
      ranks = ranks.localCheckpoint(true)
    }
    und.unpersist()
    deg.unpersist()
    ranks
  }
}

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
  /** Edge budget for the exact local tier (round-17 optimization; the
    * [[graft.text.Dedup.connectedComponents]] pattern). The distributed
    * loop is ~4 + 2·iters driver-blocking jobs; with integral fixed-point
    * arithmetic the local replay is bit-identical, so when the
    * materialized undirected edge list (which the distributed loop needs
    * anyway) gauges under the budget, one bounded collect pulls it from
    * the cache and the power iterations run on the driver. Past the
    * budget the distributed loop runs unchanged on the same persisted
    * frame. 0 disables.
    */
  private def LocalPrMaxEdges: Int =
    sys.props.get("graft.local.pr.max.edges").orElse(
      sys.env.get("GRAFT_LOCAL_PR_MAX_EDGES")).flatMap(_.toIntOption)
      .getOrElse(1 << 20)

  /** Local tier: the same integral recurrence over a collected edge
    * list — LocalTierParitySpec pins local ≡ distributed.
    */
  private[graft] def pageRankLocal(edgesIn: Array[(Long, Long)],
      iters: Int): Array[(Long, Long)] = {
    import scala.collection.mutable
    val und = edgesIn.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = mutable.HashMap.empty[Long, Long]
    und.foreach { case (s, _) => deg.update(s, deg.getOrElse(s, 0L) + 1L) }
    val n = deg.size.toLong
    if (n == 0) return Array.empty
    val base = 150000000L / n
    var ranks = mutable.HashMap.empty[Long, Long]
    deg.keysIterator.foreach(k => ranks.update(k, 1000000000L / n))
    for (_ <- 1 to iters) {
      val next = mutable.HashMap.empty[Long, Long]
      und.foreach { case (s, dst) =>
        // mirror the distributed inner join: a src absent from the rank
        // table contributes nothing (unreachable on symmetric edges, but
        // the mirror is exact on any input)
        ranks.get(s).foreach { r =>
          next.update(dst, next.getOrElse(dst, 0L) + r / deg(s))
        }
      }
      ranks = next.map { case (k, sum) => k -> (base + (85L * sum) / 100L) }
    }
    ranks.toArray
  }

  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val lvl = StorageLevel.MEMORY_AND_DISK
    // Materialize the undirected edge list once and gauge it with a
    // count — not a limit().collect() probe, whose executeTake ramps the
    // final stage up in sequential waves (the q270 finding, Dedup.scala).
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .persist(lvl)
    val nUnd = und.count()
    val bothLong = edges.schema(srcCol).dataType == LongType &&
      edges.schema(dstCol).dataType == LongType
    if (bothLong && LocalPrMaxEdges > 0 && nUnd <= 2L * LocalPrMaxEdges) {
      val arr = und.collect() // cached rows, bounded by the gauge above
      if (!arr.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        val ranks = pageRankLocal(arr.map(r => (r.getLong(0), r.getLong(1))), iters)
        und.unpersist(false)
        val schema = StructType(Seq(StructField("id", LongType),
          StructField("r", LongType)))
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](ranks.length)
        ranks.foreach { case (id, r) => rows.add(org.apache.spark.sql.Row(id, r)) }
        return edges.sparkSession.createDataFrame(rows, schema)
      }
      // Distinct diagnosis (ADVICE r17): under budget, null-id guard.
      System.err.println("[graph] NOTE: edge list contains null ids — " +
        "distributed PageRank loop")
    } else if (bothLong && LocalPrMaxEdges > 0)
      System.err.println(s"[graph] NOTE: edge list ($nUnd) exceeds local " +
        "budget — distributed PageRank loop")
    pageRankDistributed(edges.sparkSession, und, iters)
  }

  /** The distributed Pregel-style loop over the materialized undirected
    * edge list — the 100 TB tier, unchanged semantics. Unpersists `und`
    * before returning.
    */
  private[graft] def pageRankDistributed(
      s: org.apache.spark.sql.SparkSession, und: DataFrame,
      iters: Int): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg")).persist(lvl)
    val n = deg.count()
    if (n == 0) {
      und.unpersist(); deg.unpersist()
      return s.emptyDataFrame
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

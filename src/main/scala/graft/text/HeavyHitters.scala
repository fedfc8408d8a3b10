package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}

/** Distributed heavy-hitter candidates via per-partition Misra–Gries
  * (Misra & Gries 1982; merged-summary treatment in Agarwal et al.
  * 2013, "Mergeable Summaries" — public algorithms).
  *
  * Guarantee used here (pigeonhole across partitions): if an item's
  * GLOBAL frequency exceeds N/(m+1), then in at least one partition its
  * local frequency exceeds n_p/(m+1), so it survives that partition's
  * MG(m) summary — hence the UNION of per-partition summaries is a
  * superset of the true heavy hitters. The candidate set depends on
  * partitioning/stream order (MG is order-sensitive), but any superset
  * yields the same final answer after the exact re-count, so consumers
  * stay deterministic.
  *
  * This is one of the few justified `mapPartitions` sites in the repo:
  * the MG counter update is genuinely imperative per-partition state
  * with a bounded-memory contract (≤ m counters) that no built-in
  * aggregate expresses. At 100 TB the point is shuffle-width control:
  * the union is at most m × partitions keys, versus a full-vocabulary
  * groupBy whose key space is corpus-dependent.
  */
object HeavyHitters {

  /** Union of per-partition Misra–Gries(m) summaries over a string
    * Dataset — a superset of every item with global frequency
    * > N/(m+1).
    */
  def misraGriesCandidates(items: Dataset[String], m: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { w =>
        if (counts.contains(w)) counts(w) += 1L
        else if (counts.size < m) counts(w) = 1L
        else {
          // Classic MG step: decrement every counter, drop zeros, and
          // discard the incoming item.
          val dead = counts.iterator.filter(_._2 == 1L).map(_._1).toList
          counts.mapValuesInPlace((_, v) => v - 1L)
          dead.foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("w").distinct()
  }
}

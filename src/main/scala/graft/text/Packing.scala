package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Training-batch assembly operators: deterministic train/val/test hash
  * split and GPT-style sequence packing (concatenate the token stream in
  * id order, chunk into fixed-budget batches).
  */
object Packing {

  /** Deterministic hash split: bucket = md5Hash60(text) % 100 (stable
    * across runs, machines and engines), split by cumulative percent
    * thresholds. The standard leakage-free alternative to random
    * sampling for corpus-scale train/val/test assignment.
    */
  def hashSplit(df: DataFrame, textCol: String, trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    val bucket = pmod(TextOps.md5Hash60(col(textCol)), lit(100))
    df.withColumn("bucket", bucket.cast("long"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Sequence packing: documents ordered by `idCol` form one token
    * stream; each document is assigned the batch containing its first
    * token (`batch_id = ⌊exclusive-cumsum / budget⌋`) plus its offset in
    * that batch.
    *
    * Scale shape: a global cumulative sum WITHOUT the single-partition
    * global-window collapse — range-partition by id, per-partition token
    * totals (one tiny row per partition) are prefix-summed on the driver
    * and broadcast back, then each partition streams once adding its
    * offset. The driver handles #partitions values, never rows.
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      budget: Long): DataFrame = {
    val spark = df.sparkSession
    // localCheckpoint (eager): the two passes below MUST see identical
    // partition contents — recomputing the lineage per pass would (a) run
    // an arbitrarily expensive upstream twice (q117 chains dedup +
    // quality + sampling above this) and (b) trust that range
    // re-partitioning lands every row in the same partition id both
    // times. Materializing the tiny (id, n_tokens) frame makes the
    // offset map correct by construction; blocks are GC-reclaimed once
    // the result is dereferenced.
    val base = df
      .select(col(idCol).cast("long").as("id"), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint(true)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n_tokens", LongType),
      StructField("cum_excl", LongType)))
    // Pass 1: (partitionId, tokenSum, minId) — one row per partition.
    val partStats = base.mapPartitions { rows =>
      var s = 0L
      var mn = Long.MaxValue
      var any = false
      rows.foreach { r => any = true; s += r.getLong(1); mn = math.min(mn, r.getLong(0)) }
      if (any)
        Iterator(new org.apache.spark.sql.catalyst.expressions.GenericRow(
          Array[Any](org.apache.spark.TaskContext.getPartitionId().toLong, s, mn)): Row)
      else Iterator.empty
    }(Encoders.row(StructType(Seq(
      StructField("pid", LongType), StructField("psum", LongType),
      StructField("pmin", LongType))))).collect()
    // Driver prefix-sum in id order (partitions hold disjoint id ranges).
    val offsets: Map[Long, Long] = {
      var acc = 0L
      partStats.sortBy(_.getLong(2)).map { r =>
        val o = r.getLong(0) -> acc
        acc += r.getLong(1)
        o
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // Pass 2: stream each partition once, starting from its offset.
    val cumulative = base.mapPartitions { rows =>
      var cum = -1L
      rows.map { r =>
        if (cum < 0) cum = bc.value(org.apache.spark.TaskContext.getPartitionId().toLong)
        val out = new org.apache.spark.sql.catalyst.expressions.GenericRow(
          Array[Any](r.getLong(0), r.getLong(1), cum)): Row
        cum += r.getLong(1)
        out
      }
    }(Encoders.row(schema))
    cumulative
      .withColumn("batch_id", expr(s"cum_excl div $budget"))
      .withColumn("batch_offset", col("cum_excl") % budget)
      .select(col("id").as(idCol), col("n_tokens"), col("batch_id"), col("batch_offset"))
  }
}

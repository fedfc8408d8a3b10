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

  /** Token-balanced shard assignment by folded ("snake") round-robin over
    * the size-descending order: rank documents by (n_tokens DESC, id),
    * then deal rank r to shard `r % S` on even passes and `S-1 - r % S`
    * on odd passes. The fold is the classic deterministic balancer: after
    * every 2S documents each shard has received exactly one large and one
    * small pick of the pass pair, so shard token totals differ by at most
    * a few document lengths regardless of the length distribution — and
    * the whole assignment is a pure function of the corpus, reproducible
    * across runs and engines (unlike greedy LPT, whose argmin depends on
    * float accumulation order).
    *
    * Scale shape: the global rank is the same two-pass distributed
    * pattern as [[packSequences]] — range-partition by the sort key,
    * count rows per partition (one tiny row each), prefix-sum the counts
    * on the driver, then stream each partition once adding its offset.
    * No global window, no single-partition collapse; the driver touches
    * #partitions values, never rows.
    */
  def snakeShards(df: DataFrame, idCol: String, tokens: Column,
      numShards: Int): DataFrame = {
    val spark = df.sparkSession
    val base = df
      .select(col(idCol).cast("long").as("id"), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(col("n_tokens").desc, col("id"))
      .sortWithinPartitions(col("n_tokens").desc, col("id"))
      .localCheckpoint(true)
    // Pass 1: (partitionId, rowCount, first key) — one row per partition.
    // Partitions hold disjoint (n_tokens desc, id) key ranges, so sorting
    // the stats by the first key in that same order recovers the global
    // partition order for the prefix sum.
    val partStats = base.mapPartitions { rows =>
      var n = 0L
      var firstTok = 0L
      var firstId = 0L
      var any = false
      rows.foreach { r =>
        if (!any) { firstTok = r.getLong(1); firstId = r.getLong(0) }
        any = true; n += 1
      }
      if (any)
        Iterator(new org.apache.spark.sql.catalyst.expressions.GenericRow(
          Array[Any](org.apache.spark.TaskContext.getPartitionId().toLong,
            n, firstTok, firstId)): Row)
      else Iterator.empty
    }(Encoders.row(StructType(Seq(
      StructField("pid", LongType), StructField("pcnt", LongType),
      StructField("ftok", LongType), StructField("fid", LongType))))).collect()
    val offsets: Map[Long, Long] = {
      var acc = 0L
      partStats.sortBy(r => (-r.getLong(2), r.getLong(3))).map { r =>
        val o = r.getLong(0) -> acc
        acc += r.getLong(1)
        o
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val s = numShards.toLong
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n_tokens", LongType),
      StructField("rk", LongType)))
    val ranked = base.mapPartitions { rows =>
      var rk = -1L
      rows.map { r =>
        if (rk < 0) rk = bc.value(org.apache.spark.TaskContext.getPartitionId().toLong)
        val out = new org.apache.spark.sql.catalyst.expressions.GenericRow(
          Array[Any](r.getLong(0), r.getLong(1), rk)): Row
        rk += 1
        out
      }
    }(Encoders.row(schema))
    ranked
      .withColumn("shard",
        when(expr(s"(rk div $s) % 2") === 0, col("rk") % s)
          .otherwise(lit(s - 1) - col("rk") % s))
      .select(col("id").as(idCol), col("n_tokens"), col("shard"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming mappings of the reference's incremental-ingest
  * semantics (SURVEY.md §2.9; reference `core/data/cdd.py:100-110` — the
  * cursor refetch + concat + dedup-keep-last merge loop, which in the
  * reference is dead code but defines the upsert contract).
  *
  * Batch and stream share the same operator definitions: the tumbling
  * aggregation below is the streaming twin of
  * [[graft.ohlcv.TimeSeriesOps.resampleOhlcv]] (left-closed `window()`
  * semantics are Spark's streaming-native bucketing; the right-closed
  * pandas-exact variant stays a batch concern in `foreachBatch`).
  */
object StreamingIngest {

  /** File-source stream of OHLCV-shaped events. */
  def readEvents(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked late-data dedup (A2's streaming form): drop duplicate
    * `keys` arriving within the watermark horizon. Spark's
    * `dropDuplicatesWithinWatermark` keeps the FIRST arrival — the
    * keep-last refinement happens in the sink merge ([[foreachBatchUpsert]])
    * exactly like the reference's concat-then-keep-last.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming tumbling-window OHLCV aggregation with watermark:
    * open/close via min_by/max_by on event time, high/low/volume as plain
    * aggregates. Append-mode capable (emits a bucket once the watermark
    * passes its end). `tieCol` breaks event-time ties for open/close
    * deterministically (struct ordering is lexicographic) — without it
    * two events sharing a timestamp make min_by/max_by pick arbitrarily.
    */
  def tumblingOhlcv(events: DataFrame, tsCol: String, valCol: String,
      keyCol: String, width: String, watermark: String,
      tieCol: Option[String] = None): DataFrame = {
    val ord = tieCol match {
      case Some(t) => struct(col(tsCol), col(t))
      case None => struct(col(tsCol))
    }
    events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), width))
      .agg(
        min_by(col(valCol), ord).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), ord).as("close"),
        sum(col(valCol)).as("volume"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("window.start").as("bucket_start"),
        col("window.end").as("bucket_end"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("n_events"))
  }

  /** Sliding-window mean (W1's streaming shape): 256-width / 1-slide in
    * the reference; width/slide parameterized here.
    */
  def slidingMean(events: DataFrame, tsCol: String, valCol: String,
      keyCol: String, width: String, slide: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), width, slide))
      .agg(avg(col(valCol)).as("mean_value"), count(lit(1)).as("n_events"))
      .select(col(keyCol), col("window.start").as("bucket_start"),
        col("mean_value"), col("n_events"))

  /** Streaming EMA via `flatMapGroupsWithState` — the custom-state
    * streaming twin of [[graft.ohlcv.Features.withEma]] (W4): per key,
    * the state carries (ema, observations) across micro-batches; each
    * batch's rows are ordered by (ts, tie) inside the group and folded
    * through the same `α·x + (1−α)·ema` recurrence, emitting one row per
    * event once `minPeriods` observations are seen. With a single
    * AvailableNow batch the output is exactly the batch EMA over the
    * full series (oracle-checked as q106); across batches the state
    * makes it incremental. Requires per-key event-time order across
    * batches (true for append-only time-series ingest).
    *
    * Type contract: `keyCol` and `tieCol` must be integral (they are cast
    * to long — the output `key` is LongType regardless of input width);
    * `tsCol` may be a timestamp (folded at µs resolution) or any integral
    * column. Non-integral keys would need a Row-encoder groupByKey — not
    * plumbed, so the schema states the long contract honestly.
    */
  final case class EmaState(ema: Double, n: Long)

  def streamingEma(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, alpha: Double, minPeriods: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    // Normalize the event time to a sortable long (µs for real
    // timestamps; raw long columns — e.g. nanos-shimmed parquet — pass
    // through unchanged).
    val tsLong = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    {
      import org.apache.spark.sql.types._
      val integral: Set[org.apache.spark.sql.types.DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      Seq(keyCol, tieCol).foreach { c =>
        require(integral(events.schema(c).dataType),
          s"streamingEma: column '$c' must be integral (got " +
            s"${events.schema(c).dataType.simpleString}); long keys are the " +
            "plumbed contract")
      }
    }
    val outSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ema",
        org.apache.spark.sql.types.DoubleType)))
    implicit val rowEnc = Encoders.row(outSchema)
    events
      .select(col(keyCol).cast("long").as("key"), tsLong.as("ts"),
        col(tieCol).cast("long").as("tie"), col(valCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[EmaState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var (ema, n) = state.getOption.map(s => (s.ema, s.n)).getOrElse((0.0, 0L))
          val out = sorted.map { case (_, ts, _, v) =>
            if (n == 0L) ema = v else ema = alpha * v + (1 - alpha) * ema
            n += 1
            Row(key, ts, if (n >= minPeriods) ema else null)
          }
          state.update(EmaState(ema, n))
          out.iterator
      }
  }

  /** Streaming Holt linear-trend smoothing: the q163 batch recurrence
    * (ohlcv.HoltWinters) carried as (level, trend, n) state across
    * micro-batches via `flatMapGroupsWithState` — same per-step operation
    * order, so one AvailableNow pass over a parquet stream equals the
    * batch scan bit-for-bit (oracle q175). Same long key/tie contract as
    * [[streamingEma]].
    */
  final case class HoltState(l: Double, b: Double, n: Long)

  def streamingHolt(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, alpha: Double, beta: Double,
      minPeriods: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    val tsLong = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    {
      import org.apache.spark.sql.types._
      val integral: Set[org.apache.spark.sql.types.DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      Seq(keyCol, tieCol).foreach { c =>
        require(integral(events.schema(c).dataType),
          s"streamingHolt: column '$c' must be integral (got " +
            s"${events.schema(c).dataType.simpleString}); long keys are the " +
            "plumbed contract")
      }
    }
    val outSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("level",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("trend",
        org.apache.spark.sql.types.DoubleType)))
    implicit val rowEnc = Encoders.row(outSchema)
    events
      .select(col(keyCol).cast("long").as("key"), tsLong.as("ts"),
        col(tieCol).cast("long").as("tie"), col(valCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[HoltState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var (l, b, n) = state.getOption.map(s => (s.l, s.b, s.n))
            .getOrElse((0.0, 0.0, 0L))
          val out = sorted.map { case (_, ts, _, v) =>
            if (n == 0L) { l = v; b = 0.0 }
            else {
              val lNew = alpha * v + (1 - alpha) * (l + b)
              b = beta * (lNew - l) + (1 - beta) * b
              l = lNew
            }
            n += 1
            if (n >= minPeriods) Row(key, ts, l, b) else Row(key, ts, null, null)
          }
          state.update(HoltState(l, b, n))
          out.iterator
      }
  }

  /** Streaming Kalman local-level filter: the q181 recurrence with
    * (x, P, n) state across micro-batches — same operation order as
    * ohlcv.HoltWinters.withKalmanLevel, so an AvailableNow pass equals
    * the batch scan bit-for-bit (oracle q201).
    */
  final case class KalmanState(x: Double, p: Double, n: Long)

  def streamingKalman(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, qVar: Double, rVar: Double): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    val tsLong = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    {
      import org.apache.spark.sql.types._
      val integral: Set[org.apache.spark.sql.types.DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      Seq(keyCol, tieCol).foreach { c =>
        require(integral(events.schema(c).dataType),
          s"streamingKalman: column '$c' must be integral (got " +
            s"${events.schema(c).dataType.simpleString}); long keys are the " +
            "plumbed contract")
      }
    }
    val outSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.DoubleType)))
    implicit val rowEnc = Encoders.row(outSchema)
    events
      .select(col(keyCol).cast("long").as("key"), tsLong.as("ts"),
        col(tieCol).cast("long").as("tie"), col(valCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[KalmanState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var (x, p, n) = state.getOption.map(s => (s.x, s.p, s.n))
            .getOrElse((0.0, 0.0, 0L))
          val out = sorted.map { case (_, ts, _, v) =>
            if (n == 0L) { x = v; p = 1.0 }
            else {
              val pPred = p + qVar
              val kGain = pPred / (pPred + rVar)
              x = x + kGain * (v - x)
              p = (1 - kGain) * pPred
            }
            n += 1
            Row(key, ts, x, p)
          }
          state.update(KalmanState(x, p, n))
          out.iterator
      }
  }

  /** The reference's cache-merge upsert (`cdd.py:108-110`): each
    * micro-batch unions with the sink table and keeps the newest row per
    * key — batch A2 applied inside `foreachBatch`, giving exactly-once
    * upsert semantics onto a parquet table.
    */
  def foreachBatchUpsert(stream: DataFrame, sinkDir: String, keys: Seq[String],
      arrivalCol: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Crash recovery: if a previous batch died between the two renames
        // below, the live table is the __old copy (sinkDir missing) — the
        // re-run batch merges against it, so no committed row is ever lost.
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(sinkDir)
        val oldP = new org.apache.hadoop.fs.Path(sinkDir + "__old")
        val existing =
          if (fs.exists(dst)) spark.read.parquet(sinkDir)
          else if (fs.exists(oldP)) spark.read.parquet(sinkDir + "__old")
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        val merged = graft.ohlcv.TimeSeriesOps.dedupKeepLast(
          existing.unionByName(batch), keys, col(arrivalCol))
        // Write to a temp dir then swap — parquet sinks can't be read and
        // overwritten in the same job. The swap renames the old table
        // ASIDE first (never delete-then-rename): at every instant one of
        // sinkDir / sinkDir__old holds a complete committed table.
        val tmp = sinkDir + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        fs.delete(oldP, true) // stale backup from an earlier batch
        if (fs.exists(dst)) fs.rename(dst, oldP)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        fs.delete(oldP, true)
        ()
      }
}

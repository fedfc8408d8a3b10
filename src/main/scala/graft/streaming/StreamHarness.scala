package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Shared fixture for the oracle-checked streaming query family
  * (q103/q106/q112/q118/q124/q131/q137/q151/q175/q201).
  *
  * Each streaming query used to pay its own fixed setup: a fresh temp
  * dir + symlink so the file source sees a directory, a parquet footer
  * read for the schema, and a 32-partition state-store fleet per
  * stateful stage. None of that is part of the operator under test —
  * it's harness tax (~2-3 s per query in the sf0.1 bench). This object
  * shares the prepared source directory and schema per (sfDir, table)
  * across the whole family and bounds the per-query state partitioning,
  * while making the run contract strict: termination is ASSERTED (a
  * timeout throws instead of silently returning a partial sink) and the
  * memory-sink table is dropped after the result is materialized, so
  * repeated harness/bench runs don't accumulate driver memory.
  */
object StreamHarness {

  /** Guards the shuffle-partitions set→start→restore in [[runMemory]]. */
  private val startLock = new Object

  /** RAM-backed scratch root (/dev/shm) when the host offers one. */
  private lazy val ramRoot: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      Some(shm)
    else None
  }

  /** Per-call streaming scratch (checkpoints, sinks, source farms):
    * RAM-backed when available, else the JVM temp dir. Correctness
    * semantics are unchanged — every registered streaming query creates
    * a FRESH checkpoint per call, so cross-process durability is not
    * part of what those runs exercise (the crash-recovery specs create
    * their own checkpoint dirs on the real filesystem and keep their
    * durability guarantees). What the tmpfs removes is the
    * per-micro-batch offset/commit-log fsync, measured as the dominant
    * share of the streaming family's ~1.7 s/query fixed floor. A
    * production deployment points checkpoints at durable storage; this
    * root is harness scratch, deleted after each call.
    */
  def scratchDir(prefix: String): String =
    (ramRoot match {
      case Some(root) => java.nio.file.Files.createTempDirectory(root, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }).toString

  /** Which root [[scratchDir]] resolved to — bench evidence, so a run
    * where /dev/shm was unavailable (checkpoint fsyncs hit real disk and
    * the streaming family's fixed floor multiplies) is identifiable from
    * bench_full.json instead of guessed at.
    */
  def scratchRootName: String = ramRoot match {
    case Some(root) => s"ram:$root"
    case None => s"disk:${System.getProperty("java.io.tmpdir")}"
  }

  private val srcDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val srcSchemas = new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Directory exposing `<sfDir>/<table>.parquet` to the file stream
    * source (which requires a directory, not a file). Created once per
    * JVM per (sfDir, table) and reused — the symlink farm is shared by
    * every streaming query in the suite.
    */
  def sourceDir(sfDir: String, table: String): String =
    srcDirs.computeIfAbsent(s"$sfDir#$table", _ => {
      import java.nio.file.{Files, Paths}
      val base = scratchDir(s"graft_stream_$table")
      val target = Paths.get(sfDir, table + ".parquet")
      if (Files.isDirectory(target)) {
        // Spark-written table directory: the file source does not
        // recurse, so link each contained data file flat.
        import scala.jdk.CollectionConverters._
        val ls = Files.list(target)
        try ls.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(f => Files.createSymbolicLink(
            Paths.get(base, f.getFileName.toString), f))
        finally ls.close()
      } else {
        Files.createSymbolicLink(Paths.get(base, table + ".parquet"), target)
      }
      base
    })

  /** Schema of the shared source — one parquet footer read per
    * (sfDir, table) per JVM instead of one per query.
    */
  def sourceSchema(spark: SparkSession, sfDir: String, table: String): StructType =
    srcSchemas.computeIfAbsent(s"$sfDir#$table",
      _ => spark.read.parquet(s"$sfDir/$table.parquet").schema)

  /** The events table as a file-source stream over the shared fixture.
    *
    * Emits a FIXED time contract no matter how the parquet files encode
    * event time — the corpus has been written both as INT64
    * TIMESTAMP(NANOS) (read as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as timestamp[us]:
    *   - `ts`    TimestampType (µs resolution)
    *   - `ts_us` LongType epoch-µs (the value streaming folds order by —
    *     µs truncation happens HERE, before any stateful recurrence, so
    *     engine and DuckDB oracle sort identically)
    * This mirrors [[graft.Tables.events]]'s batch guard; no registered
    * query touches the raw file type directly.
    */
  def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = StreamingIngest.readEvents(spark, sourceDir(sfDir, "events"),
      sourceSchema(spark, sfDir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer `div`, not `/`: epoch-nanos exceed 2^53, double division
        // would land ±1 µs off true truncation (same pitfall as Tables).
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts_us", unix_micros(col("ts")))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type ${other.simpleString}; " +
          "expected INT64 nanos or timestamp")
    }
  }

  /** Run `out` through an AvailableNow memory sink and return
    * `finish(sinkTable)` materialized as a local relation.
    *
    * - `awaitTermination`'s boolean is asserted: a 300 s timeout THROWS
    *   rather than letting the caller read a partially-populated sink.
    * - The UUID-named memory table is dropped before returning (the
    *   result is collected first — a memory sink is driver-resident by
    *   construction, so the collect adds no scale exposure beyond what
    *   the sink already holds).
    * - `statePartitions` pins the query's shuffle/state partitioning via
    *   the cloned-at-start session conf. A fresh checkpoint is created
    *   per call, so the value only sets how many state-store instances
    *   spin up — never results. 8 keeps local-bench fixed cost low; a
    *   production deployment would size it to the cluster instead.
    * - `requireSingleBatch` ASSERTS (from the query's progress log) that
    *   all input rows arrived in one micro-batch. Queries whose oracle is
    *   order-free but whose stateful emit rule is arrival-order dependent
    *   (q251's admit-iff-band-min: a doc processed in an earlier batch
    *   than a smaller-id collider would be admitted by the stream but
    *   rejected by the oracle) pin their single-batch precondition here
    *   instead of relying on the file source's default batching.
    */
  def runMemory(out: DataFrame, tag: String, statePartitions: Int = 8,
      requireSingleBatch: Boolean = false)(
      finish: DataFrame => DataFrame): DataFrame = {
    val spark = out.sparkSession
    val qn = "graft_" + tag + "_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    // Explicit RAM-backed checkpoint (see scratchDir): without one Spark
    // creates its temp checkpoint under java.io.tmpdir — a real disk on
    // this host — and pays ~µbatch-count fsyncs per query.
    val ckpt = scratchDir("graft_ckpt_" + tag)
    // StreamExecution clones the session conf at start(), so the
    // override is frozen into the query and restored immediately. The
    // whole set→start→restore sequence is SERIALIZED: two concurrent
    // lanes interleaving it could otherwise read each other's override
    // as `prev` and leave the session pinned at `statePartitions` after
    // both restores (lost-restore). Inside the lock, a concurrent BATCH
    // query planned in the short window can still pick up the lower
    // setting — benign: shuffle partition count affects parallelism,
    // never results.
    // Data-batch counter registered BEFORE start so no progress event
    // can precede it. q.recentProgress is NOT used for the guard: it
    // retains only the last numRecentProgressUpdates (default 100)
    // entries, so a run with many empty-trigger progress events could
    // evict the data batch(es) and pass the guard vacuously — failing
    // open on exactly the precondition it exists to pin (round-12
    // ADVICE #2). The listener accumulates without bound; the bus is
    // drained before the count is read (delivery is async).
    val dataBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name == qn && e.progress.numInputRows > 0)
          dataBatches.incrementAndGet()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    if (requireSingleBatch) spark.streams.addListener(listener)
    val q = startLock.synchronized {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      try out.writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    try {
      val finished = q.awaitTermination(300000L)
      require(finished, s"$tag: streaming query did not terminate within 300 s")
      if (requireSingleBatch) {
        org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
        require(dataBatches.get() <= 1,
          s"$tag: input spanned ${dataBatches.get()} micro-batches but the " +
            "query's emit rule is arrival-order dependent and its oracle " +
            "order-free — single-batch delivery is a registered " +
            "precondition (set maxFilesPerTrigger to cover all files)")
      }
      q.stop()
      localize(finish(spark.table(qn)))
    } finally {
      if (requireSingleBatch) spark.streams.removeListener(listener)
      if (q.isActive) q.stop()
      spark.catalog.dropTempView(qn)
      deleteRecursively(ckpt)
    }
  }

  /** Collect `df` into a LocalRelation so its source (memory table,
    * temp sink dir) can be released before the result is consumed.
    * Row order is preserved.
    */
  def localize(df: DataFrame): DataFrame = {
    val rows: java.util.List[Row] = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** Delete a per-call scratch directory (sink/checkpoint) bottom-up. */
  def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Guards the suite against testdata schema drift (the round-7 incident:
  * the corpus was regenerated with `events.ts` as timestamp[us] where it
  * had been INT64 TIMESTAMP(NANOS), and eight streaming queries that
  * hard-coded `ts div 1000` on a long column died at analysis).
  *
  * Strategy: every raw-type assumption must live in exactly two places —
  * [[Tables.events]] (batch) and
  * [[graft.streaming.StreamHarness.eventStream]] (streaming) — and both
  * must emit the SAME normalized contract whichever encoding the file
  * carries. The spec materializes an INT64-nanos twin of the sf0.001
  * events table and checks:
  *   1. the batch loader yields bit-identical frames under both encodings;
  *   2. the stream source emits the fixed (ts timestamp, ts_us long)
  *      contract under both encodings;
  *   3. every registered query ANALYZES against the nanos fixture (plan
  *      resolution is where the round-7 breakage surfaced);
  *   4. the full streaming family EXECUTES identically on both encodings
  *      (end-to-end, state stores and all);
  *   5. no source file outside the two loaders (+ the session conf)
  *      mentions the raw-long arithmetic / nanos read conf.
  */
class SchemaDriftSpec extends SparkSpec {

  private val stdDir = "/root/testdata/sf0.001"

  /** The streaming queries: their `run` executes a stream to completion,
    * so they are exercised end-to-end (test 4) instead of analysis-only
    * (test 3). Guarded below so a new streaming query can't silently land
    * in the analysis-only bucket.
    */
  private val streamingNames = Set(
    "q103_stream_upsert", "q106_stream_ema", "q112_stream_ohlcv",
    "q118_stream_sliding", "q124_stream_sessions", "q131_stream_join",
    "q137_stream_enrich", "q151_stream_dedup", "q175_stream_holt",
    "q190_late_data", "q201_stream_kalman", "q209_stream_decontam",
    "q251_stream_neardup", "q289_stream_quality_gate",
    "q295_stream_dsir_gate", "q298_stream_media_gate")

  /** sf0.001 twin dir with every plausible writer drift applied at once:
    * `events.ts` as raw INT64 epoch-nanos (what the legacy
    * TIMESTAMP(NANOS) files arrive as under
    * `spark.sql.legacy.parquet.nanosAsLong`), `embeddings.embedding`
    * widened float→double, `documents.n_chars` narrowed bigint→int.
    * Values are identical in every twin — only encodings drift.
    */
  private lazy val nanosDir: String = {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft_drift_nanos")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      Files.createSymbolicLink(base.resolve(t + ".parquet"),
        Paths.get(stdDir, t + ".parquet"))
    }
    val ev = spark.read.parquet(s"$stdDir/events.parquet")
    require(ev.schema("ts").dataType == TimestampType,
      "fixture premise: the current corpus carries ts as timestamp")
    ev.select(ev.schema.fieldNames.map {
        case "ts" => (unix_micros(col("ts")) * lit(1000L)).as("ts")
        case other => col(other)
      }.toSeq: _*)
      .coalesce(1)
      .write.parquet(base.resolve("events.parquet").toString)
    val emb = spark.read.parquet(s"$stdDir/embeddings.parquet")
    emb.select(emb.schema.fieldNames.map {
        case "embedding" => col("embedding").cast("array<double>").as("embedding")
        case other => col(other)
      }.toSeq: _*)
      .coalesce(1)
      .write.parquet(base.resolve("embeddings.parquet").toString)
    val docs = spark.read.parquet(s"$stdDir/documents.parquet")
    docs.select(docs.schema.fieldNames.map {
        case "n_chars" => col("n_chars").cast("int").as("n_chars")
        case other => col(other)
      }.toSeq: _*)
      .coalesce(1)
      .write.parquet(base.resolve("documents.parquet").toString)
    base.toString
  }

  test("streaming-name guard: every *stream* query is in the executed set") {
    val streamy = Queries.all.map(_.name).filter(_.contains("stream")).toSet
    assert(streamy.subsetOf(streamingNames),
      s"new streaming queries missing from SchemaDriftSpec: ${streamy -- streamingNames}")
    val unknown = streamingNames -- Queries.all.map(_.name).toSet
    assert(unknown.isEmpty, s"stale names in streamingNames: $unknown")
  }

  test("batch events loader is encoding-invariant (schema + values)") {
    val a = Tables.events(spark, stdDir)
    val b = Tables.events(spark, nanosDir)
    assert(a.schema == b.schema,
      s"schema drift: ${a.schema.simpleString} vs ${b.schema.simpleString}")
    val ka = a.orderBy("event_id").collect().toSeq
    val kb = b.orderBy("event_id").collect().toSeq
    assert(ka == kb, "batch loader values differ between encodings")
  }

  test("stream source emits the fixed (ts timestamp, ts_us long) contract") {
    import graft.streaming.StreamHarness
    Seq(stdDir, nanosDir).foreach { d =>
      val s = StreamHarness.eventStream(spark, d)
      assert(s.schema("ts").dataType == TimestampType, s"$d: ts not timestamp")
      assert(s.schema("ts_us").dataType == LongType, s"$d: ts_us not long")
    }
  }

  test("every batch query analyzes against the INT64-nanos fixture") {
    val failures = Queries.all.filterNot(q => streamingNames(q.name))
      .flatMap { q =>
        try { q.run(spark, nanosDir).schema; None }
        catch { case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis on nanos events:\n${failures.mkString("\n")}")
  }

  test("streaming family executes identically on both encodings") {
    val byName = Queries.all.map(q => q.name -> q).toMap
    streamingNames.toSeq.sorted.foreach { name =>
      val q = byName(name)
      val a = q.run(spark, stdDir).collect().toSeq
      val b = q.run(spark, nanosDir).collect().toSeq
      assert(a == b, s"$name: results differ between ts encodings " +
        s"(${a.size} vs ${b.size} rows)")
      assert(a.nonEmpty, s"$name: empty result undermines the comparison")
    }
  }

  test("raw event-time assumptions are centralized in the two loaders") {
    import scala.jdk.CollectionConverters._
    val allowDiv = Set("Tables.scala", "StreamHarness.scala")
    val allowNanosConf = Set("Session.scala", "Tables.scala", "StreamHarness.scala")
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
    val offenders = try walk.iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val f = p.getFileName.toString
        val div = if (text.contains("ts div 1000") && !allowDiv(f))
          Some(s"$p: raw `ts div 1000`") else None
        val conf = if (text.contains("nanosAsLong") && !allowNanosConf(f))
          Some(s"$p: nanosAsLong conf reference") else None
        div ++ conf
      }.toList
    finally walk.close()
    assert(offenders.isEmpty,
      s"raw-type assumptions leaked outside the loaders:\n${offenders.mkString("\n")}")
  }
}

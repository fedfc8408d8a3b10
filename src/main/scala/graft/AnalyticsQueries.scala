package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.Rounding.{pround, sqlRound}
import graft.VectorTextQueries.{sqlHash60, sqlToks}
import graft.operators.Funnel
import graft.text.{Bpe, Contamination, Sampling, TextOps}

/** Round-5 batch 2: event-log analytics (ordered funnel, stream-stream
  * join), OLAP pivot, and training-data-pipeline additions (Bloom-pruned
  * decontamination, BPE pair mining, temperature mixture weights) — each
  * with a DuckDB oracle.
  */
object AnalyticsQueries {

  /** DuckDB n-gram shingles over a token column named `w`. */
  private def shinglesW(n: Int): String =
    s"[array_to_string(w[i:i+${n - 1}], ' ') FOR i IN range(1, len(w) - ${n - 2})]"

  private val funnel: Seq[Q] = Seq(
    // Ordered conversion funnel signup → view → click → purchase: stage k
    // counts only strictly after stage k-1 (product-analytics rule). The
    // engine's stacked conditional window-minima (one shuffle) are checked
    // against an independent DuckDB formulation (cascaded FILTER joins).
    // The latency mean divides an EXACT long sum once, so no
    // fold-order float drift.
    Q("q126_funnel",
      (s, d) => {
        val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
        Funnel.stageTimes(e, "user_id", "us", "event_type",
            Seq("signup", "view", "click", "purchase"))
          .agg(
            count(col("t0")).as("n_signup"),
            count(col("t1")).as("n_view"),
            count(col("t2")).as("n_click"),
            count(col("t3")).as("n_purchase"),
            pround(
              sum(col("t3") - col("t0")).cast("double") /
                (count(col("t3")) * lit(1e6)), 6).as("avg_latency_s"))
      },
      Some(s"""WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
              |    event_type FROM events),
              |s0 AS (SELECT user_id,
              |    min(us) FILTER (WHERE event_type = 'signup') AS t0
              |  FROM e GROUP BY 1),
              |s1 AS (SELECT e.user_id, s0.t0,
              |    min(e.us) FILTER (WHERE e.event_type = 'view'
              |      AND e.us > s0.t0) AS t1
              |  FROM e JOIN s0 USING (user_id) GROUP BY 1, 2),
              |s2 AS (SELECT e.user_id, s1.t0, s1.t1,
              |    min(e.us) FILTER (WHERE e.event_type = 'click'
              |      AND e.us > s1.t1) AS t2
              |  FROM e JOIN s1 USING (user_id) GROUP BY 1, 2, 3),
              |s3 AS (SELECT e.user_id, s2.t0, s2.t1, s2.t2,
              |    min(e.us) FILTER (WHERE e.event_type = 'purchase'
              |      AND e.us > s2.t2) AS t3
              |  FROM e JOIN s2 USING (user_id) GROUP BY 1, 2, 3, 4)
              |SELECT count(t0) AS n_signup, count(t1) AS n_view,
              |  count(t2) AS n_click, count(t3) AS n_purchase,
              |  ${sqlRound("CAST(sum(t3 - t0) AS DOUBLE) / (count(t3) * 1e6)", 6)}
              |    AS avg_latency_s
              |FROM s3""".stripMargin)),

    // Stream-stream interval join (Structured Streaming, both sides
    // watermarked, inner join with a time-range condition): every click
    // paired with the same user's errors in the following 5 minutes. With
    // replayed history the append-mode inner join emits exactly the batch
    // join's pairs — which is what the oracle computes.
    Q("q131_stream_join",
      (s, d) => {
        import graft.streaming.StreamingIngest
        import org.apache.spark.sql.streaming.Trigger
        val base = java.nio.file.Files.createTempDirectory("graft_q131").toString
        val src = base + "/src"
        java.nio.file.Files.createDirectory(java.nio.file.Paths.get(src))
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(src, "events.parquet"),
          java.nio.file.Paths.get(d, "events.parquet"))
        val schema = s.read.parquet(src).schema
        val ev = StreamingIngest.readEvents(s, src, schema)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"),
            timestamp_micros(expr("ts div 1000")).as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "2 days")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("e_user"),
            timestamp_micros(expr("ts div 1000")).as("e_ts"),
            col("event_id").as("e_id"))
          .withWatermark("e_ts", "2 days")
        val joined = clicks.join(errors,
          col("c_user") === col("e_user") &&
            col("e_ts") >= col("c_ts") &&
            col("e_ts") <= col("c_ts") + expr("INTERVAL 5 MINUTES"))
        val qn = "graft_q131_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = joined.writeStream.format("memory").queryName(qn)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(300000)
        q.stop()
        s.table(qn)
          .select(col("c_id"), col("e_id"), col("c_user").as("user_id"),
            (unix_micros(col("e_ts")) - unix_micros(col("c_ts"))).as("delta_us"))
          .orderBy("c_id", "e_id")
      },
      Some("""WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
             |    event_id, event_type FROM events)
             |SELECT c.event_id AS c_id, er.event_id AS e_id, c.user_id,
             |  er.us - c.us AS delta_us
             |FROM (SELECT * FROM e WHERE event_type = 'click') c
             |JOIN (SELECT * FROM e WHERE event_type = 'error') er
             |  ON c.user_id = er.user_id AND er.us >= c.us
             |    AND er.us <= c.us + 300000000
             |ORDER BY c_id, e_id""".stripMargin)))

  private val olap: Seq[Q] = Seq(
    // Pivot / crosstab: lang × source document counts. Pivot values are
    // given EXPLICITLY — at 100 TB that skips the driver-side distinct
    // scan Spark otherwise runs to discover the column set.
    Q("q130_pivot",
      (s, d) => {
        val sources = (0 until 20).map("src" + _)
        Tables.documents(s, d)
          .groupBy("lang")
          .pivot("source", sources)
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("lang")
      },
      Some {
        val cols = (0 until 20)
          .map(i => s"count(*) FILTER (WHERE source = 'src$i') AS src$i")
          .mkString(",\n|  ")
        s"""SELECT lang,
           |  $cols
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
      }))

  private val pipeline: Seq[Q] = Seq(
    // Bloom-pruned decontamination: same answer as the exact q110 overlap
    // (sketch-then-verify is lossless), but the corpus grams are filtered
    // through a broadcast Bloom filter BEFORE any shuffle. 6-grams here
    // vs q110's 8 so the two exercise different overlap densities.
    Q("q127_bloom_decontam",
      (s, d) => Contamination.bloomPrunedOverlap(Tables.documents(s, d),
          "doc_id", "text", col("source") === "src0", n = 6)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, source, $sqlToks AS w FROM documents),
              |sh AS (SELECT doc_id, source, unnest(${shinglesW(6)}) AS g FROM t),
              |hh AS (SELECT doc_id, source, ${sqlHash60("g")} AS h FROM sh),
              |b AS (SELECT DISTINCT h FROM hh WHERE source = 'src0'),
              |c AS (SELECT DISTINCT doc_id, h FROM hh WHERE source <> 'src0'),
              |sj AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
              |  FROM c JOIN b USING (h) GROUP BY 1)
              |SELECT d.doc_id,
              |  coalesce(sj.n_shared, CAST(0 AS BIGINT)) AS n_shared,
              |  coalesce(sj.n_shared, 0) > 0 AS contaminated
              |FROM documents d LEFT JOIN sj USING (doc_id)
              |WHERE d.source <> 'src0'
              |ORDER BY d.doc_id""".stripMargin)),

    // One BPE merge-step scan: corpus-wide adjacent character-pair counts
    // within words, top 32 by (count DESC, pair ASC).
    Q("q128_bpe_pairs",
      (s, d) => Bpe.topPairs(Tables.documents(s, d), col("text"), 32),
      Some(s"""WITH w AS (SELECT unnest($sqlToks) AS w FROM documents),
              |p AS (SELECT unnest([substring(w, i, 2) FOR i IN range(1, len(w))])
              |    AS pair FROM w WHERE len(w) >= 2)
              |SELECT pair, count(*) AS n FROM p GROUP BY 1
              |ORDER BY n DESC, pair LIMIT 32""".stripMargin)),

    // Temperature mixture weights (α = 0.5) over sources: token share p
    // and resampling weight q ∝ √p. Exact-integer token totals + ordered
    // window folds + correctly-rounded sqrt keep both engines bitwise in
    // step before the 6-dp rounding.
    Q("q129_mixture_weights",
      (s, d) => Sampling.mixtureWeights(Tables.documents(s, d), "source",
          TextOps.tokenCount(col("text")).cast("long"), alpha = 0.5)
        .select(col("source"), col("n_tokens"),
          pround(col("p"), 6).as("p"), pround(col("q"), 6).as("q"))
        .orderBy("source"),
      Some(s"""WITH per AS (SELECT source,
              |    CAST(sum(len($sqlToks)) AS BIGINT) AS n_tokens
              |  FROM documents GROUP BY 1),
              |n AS (SELECT source, n_tokens,
              |    CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER fw AS DOUBLE) AS p
              |  FROM per WINDOW fw AS (ORDER BY source
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
              |SELECT source, n_tokens, ${sqlRound("p", 6)} AS p,
              |  ${sqlRound("sqrt(p) / sum(sqrt(p)) OVER fw", 6)} AS q
              |FROM n WINDOW fw AS (ORDER BY source
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              |ORDER BY source""".stripMargin)))

  def all: Seq[Q] = funnel ++ olap ++ pipeline
}

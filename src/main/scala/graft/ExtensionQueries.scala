package graft

import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.Rounding.{pround, sqlRound}

/** Queries exercising the SparkSessionExtensions pack end-to-end against
  * the DuckDB oracle: the native as-of join operator (logical node +
  * planner strategy + merge exec) and the fused-dot optimizer rule.
  * Companion plan-shape assertions live in ExtensionsSpec.
  */
object ExtensionQueries {

  private val extension: Seq[Q] = Seq(
    // q121's semantics through the NATIVE operator instead of the
    // union-then-window encoding: clicks as-of-join the user's most
    // recent view. Three independent formulations now agree on this
    // dataset — the window encoding (q121), this custom exec, and
    // DuckDB's built-in ASOF LEFT JOIN.
    Q("q161_asof_native",
      (s, d) => {
        val e = Tables.events(s, d)
          .withColumn("us", unix_micros(col("ts")))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("us"), col("event_id"), col("value"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("us"), col("event_id"), col("value"))
        org.apache.spark.sql.graft.AsOfNative
          .asofBackward(clicks, views, "user_id", "us", "event_id",
            rightPayload = Seq("event_id", "value"))
          .select(col("user_id"), col("us"), col("event_id"),
            pround(col("value"), 6).as("value"),
            col("r_event_id"), pround(col("r_value"), 6).as("r_value"))
          .orderBy("event_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_type,
              |    CAST(epoch_us(ts) AS BIGINT) AS us, event_id, value FROM events),
              |v AS (SELECT user_id, us, event_id, value FROM
              |  (SELECT user_id, us, event_id, value,
              |     row_number() OVER (PARTITION BY user_id, us
              |       ORDER BY event_id DESC) AS rn
              |   FROM e WHERE event_type = 'view') WHERE rn = 1)
              |SELECT c.user_id, c.us, c.event_id,
              |  ${sqlRound("c.value", 6)} AS value,
              |  v.event_id AS r_event_id, ${sqlRound("v.value", 6)} AS r_value
              |FROM (SELECT * FROM e WHERE event_type = 'click') c
              |ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.us >= v.us
              |ORDER BY c.event_id""".stripMargin)),

    // Declarative higher-order-function dot product — the PORTABLE SQL a
    // user writes — against three broadcast probe vectors. The
    // FuseDotProduct rule rewrites it into the codegen'd ArrayDotStrict
    // kernel at optimization time (ExtensionsSpec asserts the plan), so
    // correctness here checks the fused kernel's values, not the
    // interpreted lambdas the query text nominally describes.
    Q("q162_fused_dot",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("ev"))
        val probes = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("probe_id"), col("ev").as("pv"))
        emb.filter(col("vec_id") >= 3)
          .crossJoin(broadcast(probes))
          .select(col("vec_id"), col("probe_id"),
            pround(expr("aggregate(zip_with(ev, pv, (x, y) -> x * y), " +
              "cast(0 as double), (acc, t) -> acc + t)"), 6).as("dot"))
          .orderBy("vec_id", "probe_id")
      },
      Some(s"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
              |p AS (SELECT vec_id AS probe_id, ev AS pv FROM emb WHERE vec_id < 3)
              |SELECT e.vec_id, p.probe_id,
              |  ${sqlRound("list_dot_product(e.ev, p.pv)", 6)} AS dot
              |FROM emb e, p WHERE e.vec_id >= 3
              |ORDER BY e.vec_id, p.probe_id""".stripMargin)))

  private val sources: Seq[Q] = Seq(
    // DataSource V2 paginated scan (SURVEY §2.1 S1): every page is an
    // independent InputPartition, so the backfill parallelizes instead
    // of walking one cursor. The oracle pins exactly what pagination
    // gets wrong — duplicated or dropped rows at page boundaries — via
    // the closed-form index stats of [0, total); bar VALUES are pinned
    // by ExchangeSourceSpec against the driver-side cursor loop (the
    // generator is Scala, not SQL).
    Q("q179_paged_source",
      (s, d) => s.read.format("graft.sources.ExchangeSource")
        .option("symbol", "BTC-USD").option("start_ms", 0L)
        .option("interval_ms", 3600000L).option("total", 5000L)
        .option("page", 1000).load()
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("ts_ms")).as("n_distinct_ts"),
          min(col("ts_ms")).as("min_ts_ms"), max(col("ts_ms")).as("max_ts_ms"),
          sum(col("ts_ms")).as("sum_ts_ms")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT i) AS BIGINT) AS n_distinct_ts,
             |  CAST(min(i * 3600000) AS BIGINT) AS min_ts_ms,
             |  CAST(max(i * 3600000) AS BIGINT) AS max_ts_ms,
             |  CAST(sum(i * 3600000) AS BIGINT) AS sum_ts_ms
             |FROM (SELECT unnest(range(5000)) AS i)""".stripMargin)))

  def all: Seq[Q] = extension ++ sources
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ohlcv.{Features, Indicators}
import graft.Queries.Q
import graft.Rounding.{pround, sqlRound}

/** Fourth TA-query batch (F14 completion): the `add_all_ta_features`
  * families the first three batches didn't cover — VWAP, Ichimoku,
  * Aroon, WMA, awesome oscillator, Ulcer index, KST, ADI, VPT, NVI,
  * mass index, TSI, PVO, stochastic RSI, PSAR, STC — each with a DuckDB
  * oracle mirroring the engine's arithmetic exactly (sequential HOF list
  * sums for window statistics, recursive CTEs for EMA recurrences,
  * `MATERIALIZED` bridges between chained recursions).
  */
object TaQueries {

  private def hourlyBars(s: SparkSession, d: String) =
    Queries.hourlyResampled(s, d, emitEmpty = false)
      .select("user_id", "bucket_s", "high", "low", "close", "volume")

  private def hourlyClose(s: SparkSession, d: String) =
    Queries.hourlyResampled(s, d, emitEmpty = false)
      .select("user_id", "bucket_s", "close")

  // --------------------------------------------------------------
  // Window-shaped families
  // --------------------------------------------------------------

  private val windowed: Seq[Q] = Seq(
    Q("q85_vwap",
      (s, d) =>
        Indicators.withVwap(hourlyBars(s, d), "user_id", "bucket_s", w = 14)
          .filter(col("vwap").isNotNull)
          .select(col("user_id"), col("bucket_s"), pround(col("vwap"), 6).as("vwap"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyOhlcvCte},
              |l AS (SELECT user_id, bucket_s,
              |    list((high + low + close) / 3.0 * volume) OVER w AS tpvs,
              |    list(volume) OVER w AS vols
              |  FROM aggv
              |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket_s
              |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
              |SELECT user_id, bucket_s,
              |  ${sqlRound("list_sum(tpvs) / list_sum(vols)", 6)} AS vwap
              |FROM l WHERE len(tpvs) = 14 AND list_sum(vols) <> 0
              |ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q86_ichimoku",
      (s, d) =>
        Indicators.withIchimoku(hourlyBars(s, d), "user_id", "bucket_s")
          .select(col("user_id"), col("bucket_s"),
            pround(col("ichimoku_conv"), 6).as("ichimoku_conv"),
            pround(col("ichimoku_base"), 6).as("ichimoku_base"),
            pround(col("ichimoku_a"), 6).as("ichimoku_a"),
            pround(col("ichimoku_b"), 6).as("ichimoku_b"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyOhlcvCte},
              |m AS (SELECT user_id, bucket_s,
              |    (max(high) OVER w1 + min(low) OVER w1) / 2.0 AS conv,
              |    (max(high) OVER w2 + min(low) OVER w2) / 2.0 AS base,
              |    (max(high) OVER w3 + min(low) OVER w3) / 2.0 AS spanb
              |  FROM aggv
              |  WINDOW w1 AS (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
              |    w2 AS (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
              |    w3 AS (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 51 PRECEDING AND CURRENT ROW))
              |SELECT user_id, bucket_s, ${sqlRound("conv", 6)} AS ichimoku_conv,
              |  ${sqlRound("base", 6)} AS ichimoku_base,
              |  ${sqlRound("(conv + base) / 2.0", 6)} AS ichimoku_a,
              |  ${sqlRound("spanb", 6)} AS ichimoku_b
              |FROM m ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q87_aroon",
      (s, d) =>
        Indicators.withAroon(hourlyClose(s, d), "user_id", "bucket_s", w = 25)
          .filter(col("aroon_up").isNotNull)
          .select(col("user_id"), col("bucket_s"),
            pround(col("aroon_up"), 6).as("aroon_up"),
            pround(col("aroon_down"), 6).as("aroon_down"),
            pround(col("aroon_osc"), 6).as("aroon_osc"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyCloseCte},
              |l AS (SELECT user_id, bucket_s,
              |    list(close) OVER (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS cs
              |  FROM agg),
              |a AS (SELECT user_id, bucket_s,
              |    100.0 * CAST(list_position(cs, list_max(cs)) AS DOUBLE) / 25 AS aroon_up,
              |    100.0 * CAST(list_position(cs, list_min(cs)) AS DOUBLE) / 25 AS aroon_down
              |  FROM l WHERE len(cs) = 25)
              |SELECT user_id, bucket_s, ${sqlRound("aroon_up", 6)} AS aroon_up,
              |  ${sqlRound("aroon_down", 6)} AS aroon_down,
              |  ${sqlRound("aroon_up - aroon_down", 6)} AS aroon_osc
              |FROM a ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q88_wma",
      (s, d) =>
        Indicators.withWma(hourlyClose(s, d), "user_id", "bucket_s", w = 9)
          .filter(col("wma").isNotNull)
          .select(col("user_id"), col("bucket_s"), pround(col("wma"), 6).as("wma"))
          .orderBy("user_id", "bucket_s"),
      Some {
        val wts = (1 to 9).map(i => s"$i.0").mkString("[", ", ", "]")
        s"""WITH ${Queries.HourlyCloseCte},
           |l AS (SELECT user_id, bucket_s,
           |    list(close) OVER (PARTITION BY user_id ORDER BY bucket_s
           |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS cs
           |  FROM agg)
           |SELECT user_id, bucket_s,
           |  ${sqlRound(s"list_sum([z[1] * z[2] FOR z IN list_zip(cs, $wts)]) / 45.0", 6)} AS wma
           |FROM l WHERE len(cs) = 9 ORDER BY user_id, bucket_s""".stripMargin
      }),

    Q("q89_awesome",
      (s, d) =>
        Indicators.withAwesome(hourlyBars(s, d), "user_id", "bucket_s")
          .filter(col("ao").isNotNull)
          .select(col("user_id"), col("bucket_s"), pround(col("ao"), 6).as("ao"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyOhlcvCte},
              |l AS (SELECT user_id, bucket_s,
              |    list((high + low) / 2.0) OVER wf AS mf,
              |    list((high + low) / 2.0) OVER ws AS ms
              |  FROM aggv
              |  WINDOW wf AS (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
              |    ws AS (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 33 PRECEDING AND CURRENT ROW))
              |SELECT user_id, bucket_s,
              |  ${sqlRound("list_sum(mf) / 5.0 - list_sum(ms) / 34.0", 6)} AS ao
              |FROM l WHERE len(ms) = 34 ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q90_ulcer",
      (s, d) =>
        Indicators.withUlcer(hourlyClose(s, d), "user_id", "bucket_s", w = 14)
          .filter(col("ulcer").isNotNull)
          .select(col("user_id"), col("bucket_s"), pround(col("ulcer"), 6).as("ulcer"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyCloseCte},
              |r AS (SELECT user_id, bucket_s,
              |    CASE WHEN count(close) OVER w = 14
              |      THEN 100.0 * (close - max(close) OVER w) / (max(close) OVER w) END AS dd
              |  FROM agg
              |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket_s
              |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
              |l AS (SELECT user_id, bucket_s,
              |    list(dd) OVER (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS dds
              |  FROM r WHERE dd IS NOT NULL)
              |SELECT user_id, bucket_s,
              |  ${sqlRound("sqrt(list_sum([x * x FOR x IN dds]) / 14)", 6)} AS ulcer
              |FROM l WHERE len(dds) = 14 ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q91_kst",
      (s, d) =>
        Indicators.withKst(hourlyClose(s, d), "user_id", "bucket_s")
          .filter(col("kst_sig").isNotNull)
          .select(col("user_id"), col("bucket_s"),
            pround(col("kst"), 4).as("kst"),
            pround(col("kst_sig"), 4).as("kst_sig"))
          .orderBy("user_id", "bucket_s"),
      Some {
        val rocs = Seq(10, 15, 20, 30)
        val smooths = Seq(10, 10, 10, 15)
        val rocCols = rocs.zipWithIndex.map { case (r, i) =>
          s"CASE WHEN lag(close, $r) OVER pw IS NOT NULL AND lag(close, $r) OVER pw <> 0 " +
            s"THEN (close - lag(close, $r) OVER pw) / lag(close, $r) OVER pw END AS roc$i"
        }.mkString(",\n    ")
        val maCols = smooths.zipWithIndex.map { case (n, i) =>
          s"CASE WHEN count(roc$i) OVER (PARTITION BY user_id ORDER BY bucket_s " +
            s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) = $n " +
            s"THEN avg(roc$i) OVER (PARTITION BY user_id ORDER BY bucket_s " +
            s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) END AS rm$i"
        }.mkString(",\n    ")
        s"""WITH ${Queries.HourlyCloseCte},
           |r AS (SELECT user_id, bucket_s,
           |    $rocCols
           |  FROM agg WINDOW pw AS (PARTITION BY user_id ORDER BY bucket_s)),
           |m AS (SELECT user_id, bucket_s,
           |    $maCols
           |  FROM r),
           |k AS (SELECT user_id, bucket_s,
           |    100.0 * (rm0 + 2.0 * rm1 + 3.0 * rm2 + 4.0 * rm3) AS kst
           |  FROM m),
           |sg AS (SELECT user_id, bucket_s, kst,
           |    CASE WHEN count(kst) OVER w9 = 9 THEN avg(kst) OVER w9 END AS kst_sig
           |  FROM k
           |  WINDOW w9 AS (PARTITION BY user_id ORDER BY bucket_s
           |    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW))
           |SELECT user_id, bucket_s, ${sqlRound("kst", 4)} AS kst,
           |  ${sqlRound("kst_sig", 4)} AS kst_sig
           |FROM sg WHERE kst_sig IS NOT NULL ORDER BY user_id, bucket_s""".stripMargin
      }))

  // --------------------------------------------------------------
  // Cumulative / scan families
  // --------------------------------------------------------------

  private val cumulative: Seq[Q] = Seq(
    // Bucket volume is an aggregation-order-dependent sum, so cumulative
    // volume lines carry ~1e-10 absolute noise (q54 precedent): round 2.
    Q("q92_adi",
      (s, d) =>
        Indicators.withAdi(hourlyBars(s, d), "user_id", "bucket_s")
          .select(col("user_id"), col("bucket_s"), pround(col("adi"), 2).as("adi"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyOhlcvCte}
              |SELECT user_id, bucket_s, ${sqlRound("adi", 2)} AS adi FROM (
              |  SELECT user_id, bucket_s,
              |    sum((CASE WHEN high > low
              |        THEN ((close - low) - (high - close)) / (high - low)
              |        ELSE 0.0 END) * volume)
              |      OVER (PARTITION BY user_id ORDER BY bucket_s
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS adi
              |  FROM aggv)
              |ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q93_vpt",
      (s, d) =>
        Indicators.withVpt(hourlyBars(s, d), "user_id", "bucket_s")
          .filter(col("vpt").isNotNull)
          .select(col("user_id"), col("bucket_s"), pround(col("vpt"), 4).as("vpt"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH ${Queries.HourlyOhlcvCte},
              |t AS (SELECT user_id, bucket_s,
              |    CASE WHEN pc IS NOT NULL AND pc <> 0
              |      THEN volume * (close - pc) / pc END AS term
              |  FROM (SELECT *, lag(close) OVER (PARTITION BY user_id ORDER BY bucket_s) AS pc
              |    FROM aggv)),
              |c AS (SELECT user_id, bucket_s,
              |    count(term) OVER cw AS n, sum(term) OVER cw AS vpt
              |  FROM t
              |  WINDOW cw AS (PARTITION BY user_id ORDER BY bucket_s
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT user_id, bucket_s, ${sqlRound("vpt", 4)} AS vpt
              |FROM c WHERE n > 0 ORDER BY user_id, bucket_s""".stripMargin)),

    Q("q94_nvi",
      (s, d) =>
        Indicators.withNvi(hourlyBars(s, d), "user_id", "bucket_s")
          .select(col("user_id"), col("bucket_s"), pround(col("nvi"), 6).as("nvi"))
          .orderBy("user_id", "bucket_s"),
      Some(s"""WITH RECURSIVE ${Queries.HourlyOhlcvCte},
              |ord AS (SELECT user_id, bucket_s, close, volume,
              |    row_number() OVER (PARTITION BY user_id ORDER BY bucket_s) AS rn
              |  FROM aggv),
              |b AS (SELECT *, lag(close) OVER pw AS pc, lag(volume) OVER pw AS pv
              |  FROM ord WINDOW pw AS (PARTITION BY user_id ORDER BY rn)),
              |rec AS (
              |  SELECT user_id, bucket_s, rn, CAST(1000.0 AS DOUBLE) AS nvi
              |  FROM b WHERE rn = 1
              |  UNION ALL
              |  SELECT o.user_id, o.bucket_s, o.rn,
              |    CASE WHEN o.volume < o.pv AND o.pc <> 0
              |      THEN r.nvi * (1.0 + (o.close - o.pc) / o.pc)
              |      ELSE r.nvi END
              |  FROM b o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
              |SELECT user_id, bucket_s, ${sqlRound("nvi", 6)} AS nvi
              |FROM rec ORDER BY user_id, bucket_s""".stripMargin)))

  def all: Seq[Q] = windowed ++ cumulative
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.{hourlyResampled, HourlyCloseCte, Q}
import graft.Rounding.{pround, sqlRound}
import graft.ohlcv.HoltWinters

/** Classical forecasting / risk analytics over the hourly bars — the
  * statsmodels-adjacent surface a user of the reference pipeline reaches
  * for next (ref: core/forecast's eval loop): Holt double-exponential
  * smoothing, drawdown, autocorrelation, market beta and return/risk
  * summaries. All are one-shuffle plans: the bar resample shuffles on
  * user_id and every subsequent window/aggregate reuses that
  * partitioning.
  */
object ForecastQueries {

  private def w = Window.partitionBy("user_id").orderBy("bucket_s")

  private val forecasting: Seq[Q] = Seq(
    // Holt linear-trend smoothing (α=.5, β=.25 — exactly representable,
    // so the oracle's folded constants are bit-identical): fitted level,
    // trend and one-step forecast per bar, via one ordered scan per key.
    Q("q163_holt",
      (s, d) => {
        val hc = hourlyResampled(s, d, emitEmpty = false)
          .select("user_id", "bucket_s", "close")
        HoltWinters.withHolt(hc, "user_id", "bucket_s", "close",
            alpha = 0.5, beta = 0.25)
          .select(col("user_id"), col("bucket_s"),
            pround(col("level"), 4).as("level"),
            pround(col("trend"), 4).as("trend"),
            pround(col("level") + col("trend"), 4).as("yhat"))
          .orderBy("user_id", "bucket_s")
      },
      // Same recurrence, same operation order, carried as (l, b) columns
      // through a recursive CTE.
      Some(s"""WITH RECURSIVE $HourlyCloseCte,
              |ord AS (SELECT user_id, bucket_s, close,
              |    row_number() OVER (PARTITION BY user_id ORDER BY bucket_s) AS rn
              |  FROM agg),
              |rec AS (
              |  SELECT user_id, bucket_s, close, rn,
              |    close AS l, CAST(0 AS DOUBLE) AS b FROM ord WHERE rn = 1
              |  UNION ALL
              |  SELECT o.user_id, o.bucket_s, o.close, o.rn,
              |    0.5 * o.close + (1 - 0.5) * (r.l + r.b),
              |    0.25 * ((0.5 * o.close + (1 - 0.5) * (r.l + r.b)) - r.l)
              |      + (1 - 0.25) * r.b
              |  FROM ord o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
              |SELECT user_id, bucket_s, ${sqlRound("l", 4)} AS level,
              |  ${sqlRound("b", 4)} AS trend, ${sqlRound("l + b", 4)} AS yhat
              |FROM rec ORDER BY user_id, bucket_s""".stripMargin)),

    // Maximum drawdown per user: running peak then min(close/peak − 1).
    // Pure window + aggregate — no fp-order sensitivity (max/min/divide
    // are order-independent), so no co-moment rounding risk.
    Q("q164_drawdown",
      (s, d) => {
        val hc = hourlyResampled(s, d, emitEmpty = false)
        hc.withColumn("runmax", max(col("close")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("dd", col("close") / col("runmax") - 1)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_bars"),
            pround(max(col("close")), 6).as("peak"),
            pround(min(col("dd")), 6).as("max_drawdown"))
          .orderBy("user_id")
      },
      Some(s"""WITH $HourlyCloseCte,
              |dd AS (SELECT user_id, close,
              |    close / max(close) OVER (PARTITION BY user_id ORDER BY bucket_s
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS dd
              |  FROM agg)
              |SELECT user_id, CAST(count(*) AS BIGINT) AS n_bars,
              |  ${sqlRound("max(close)", 6)} AS peak,
              |  ${sqlRound("min(dd)", 6)} AS max_drawdown
              |FROM dd GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Autocorrelation of the close at lags 1–3 per user (the ACF panel an
    // AR-order pick reads). corr() skips null pairs in both engines, so
    // the first k bars fall out of lag-k identically.
    Q("q165_acf",
      (s, d) => {
        val hc = hourlyResampled(s, d, emitEmpty = false)
          .select("user_id", "bucket_s", "close")
        hc.withColumn("l1", lag(col("close"), 1).over(w))
          .withColumn("l2", lag(col("close"), 2).over(w))
          .withColumn("l3", lag(col("close"), 3).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_bars"),
            pround(corr(col("close"), col("l1")), 6).as("acf1"),
            pround(corr(col("close"), col("l2")), 6).as("acf2"),
            pround(corr(col("close"), col("l3")), 6).as("acf3"))
          .orderBy("user_id")
      },
      Some(s"""WITH $HourlyCloseCte,
              |lagged AS (SELECT user_id, close,
              |    lag(close, 1) OVER w AS l1, lag(close, 2) OVER w AS l2,
              |    lag(close, 3) OVER w AS l3
              |  FROM agg WINDOW w AS (PARTITION BY user_id ORDER BY bucket_s))
              |SELECT user_id, CAST(count(*) AS BIGINT) AS n_bars,
              |  ${sqlRound("corr(close, l1)", 6)} AS acf1,
              |  ${sqlRound("corr(close, l2)", 6)} AS acf2,
              |  ${sqlRound("corr(close, l3)", 6)} AS acf3
              |FROM lagged GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Market beta per user: the "market" is the cross-sectional mean
    // close per hour; β = covar_pop(close, mkt) / var_pop(mkt) over the
    // user's observed hours. One extra tiny aggregate + broadcast-sized
    // join on bucket_s.
    Q("q166_beta",
      (s, d) => {
        val hc = hourlyResampled(s, d, emitEmpty = false)
          .select("user_id", "bucket_s", "close")
        val mkt = hc.groupBy("bucket_s").agg(avg(col("close")).as("mkt"))
        hc.join(broadcast(mkt), "bucket_s")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_bars"),
            pround(covar_pop(col("close"), col("mkt")) /
              var_pop(col("mkt")), 6).as("beta"))
          .orderBy("user_id")
      },
      Some(s"""WITH $HourlyCloseCte,
              |mkt AS (SELECT bucket_s, avg(close) AS mkt FROM agg GROUP BY bucket_s)
              |SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_bars,
              |  ${sqlRound("covar_pop(a.close, m.mkt) / var_pop(m.mkt)", 6)} AS beta
              |FROM agg a JOIN mkt m USING (bucket_s)
              |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin)),

    // Return/risk summary per user: hourly log returns → mean, population
    // volatility, annualized Sharpe (rf = 0, 8760 hourly bars/year).
    Q("q167_risk",
      (s, d) => {
        val hc = hourlyResampled(s, d, emitEmpty = false)
          .select("user_id", "bucket_s", "close")
        hc.withColumn("r", log(col("close")) - log(lag(col("close"), 1).over(w)))
          .filter(col("r").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_rets"),
            pround(avg(col("r")), 6).as("mean_r"),
            pround(stddev_pop(col("r")), 6).as("vol"),
            pround(when(stddev_pop(col("r")) > 0,
              avg(col("r")) / stddev_pop(col("r")) * sqrt(lit(8760.0))), 6)
              .as("sharpe"))
          .orderBy("user_id")
      },
      Some(s"""WITH $HourlyCloseCte,
              |r AS (SELECT user_id,
              |    ln(close) - ln(lag(close, 1) OVER (PARTITION BY user_id
              |      ORDER BY bucket_s)) AS r
              |  FROM agg)
              |SELECT user_id, CAST(count(*) AS BIGINT) AS n_rets,
              |  ${sqlRound("avg(r)", 6)} AS mean_r,
              |  ${sqlRound("stddev_pop(r)", 6)} AS vol,
              |  ${sqlRound(
                  "CASE WHEN stddev_pop(r) > 0 THEN avg(r) / stddev_pop(r) * sqrt(8760.0) END",
                  6)} AS sharpe
              |FROM r WHERE r IS NOT NULL
              |GROUP BY user_id ORDER BY user_id""".stripMargin)))

  def all: Seq[Q] = forecasting
}

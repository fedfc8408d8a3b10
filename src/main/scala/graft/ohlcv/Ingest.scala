package graft.ohlcv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest operators (SURVEY.md §2.1 S1–S4, S6): the reference's
  * CSV-cached, REST-paginated OHLCV corpus, re-expressed as explicit-schema
  * Spark reads plus a driver-side cursor fetch.
  */
object Ingest {

  /** OHLCV file schema (reference `data/bitstamp` CSV header,
    * `core/data/utils.py:45`).
    */
  val OhlcvSchema: StructType = StructType(Seq(
    StructField("datetime", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  /** S3 CSV scan with explicit schema (never infer at 100 TB), tagging
    * `symbol` and a per-file arrival index (`ingest_order`) — the
    * fabricated arrival order keep-last dedup needs (SURVEY §7.4 #7).
    */
  def readCsv(spark: SparkSession, path: String, symbol: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(OhlcvSchema)
      .csv(path)
      .withColumn("symbol", lit(symbol))
      .withColumn("ingest_order", monotonically_increasing_id())

  /** S4 CSV sink (reference `cdd.py:123` persists without index). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S2 list-of-lists → table (reference `utils.py:32-53`): exchange rows
    * are `[epoch_ms, open, high, low, close, volume]`; derive `datetime`
    * and drop the raw cursor column.
    */
  def fromExchangeRows(spark: SparkSession,
      rows: Seq[(Long, Double, Double, Double, Double, Double)],
      symbol: String): DataFrame = {
    import spark.implicits._
    rows.toDF("ts_ms", "open", "high", "low", "close", "volume")
      .withColumn("datetime", timestamp_millis(col("ts_ms")))
      .withColumn("symbol", lit(symbol))
      .withColumn("ingest_order", monotonically_increasing_id())
      .drop("ts_ms")
  }

  /** S1 paginated REST scan semantics (reference `cdd.py:54-64`): page at
    * most `maxPerPage` rows from `cursor`, advance cursor to last
    * timestamp + 1, stop on an empty page or once `stopLimit` rows are
    * fetched, truncate to `stopLimit`. `fetchPage` abstracts the exchange
    * client — driver-side by design: ingest is a cursor loop over a rate-
    * limited API, not a distributed job (the corpus lands in files and
    * every downstream operator reads those).
    */
  def fetchPaginated(
      fetchPage: (Long, Int) => Seq[(Long, Double, Double, Double, Double, Double)],
      startMs: Long, stopLimit: Int, maxPerPage: Int = 1000)
      : Seq[(Long, Double, Double, Double, Double, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Double, Double, Double, Double)]
    var cursor = startMs
    var done = false
    while (!done && out.length < stopLimit) {
      val page = fetchPage(cursor, maxPerPage)
      if (page.isEmpty) done = true
      else {
        out ++= page
        cursor = page.map(_._1).max + 1
      }
    }
    out.take(stopLimit).toSeq
  }
}

/** S6 timeframe literal parser (reference `core/data/utils.py:7-22`):
  * `"<n><unit>"` with unit ∈ m/h/d/w/M/y → seconds.
  */
object Timeframes {
  private val Pattern = "([0-9]+)([a-zA-Z])".r

  def parseSeconds(tf: String): Long = tf match {
    case Pattern(n, unit) =>
      val k = n.toLong
      unit match {
        case "m" => k * 60
        case "h" => k * 3600
        case "d" => k * 86400
        case "w" => k * 7 * 86400
        case "M" => k * 30 * 86400 // calendar month approximated as 30d,
        case "y" => k * 365 * 86400 // year as 365d (reference timedelta)
        case other => throw new IllegalArgumentException(s"unsupported unit $other in $tf")
      }
    case _ => throw new IllegalArgumentException(s"unparseable timeframe $tf")
  }
}

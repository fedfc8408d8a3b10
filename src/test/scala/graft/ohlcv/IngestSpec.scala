package graft.ohlcv

import java.nio.file.Files
import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("timeframe parser: m/h/d/w/M/y units, errors on junk") {
    assert(Timeframes.parseSeconds("1m") == 60L)
    assert(Timeframes.parseSeconds("4h") == 14400L)
    assert(Timeframes.parseSeconds("1d") == 86400L)
    assert(Timeframes.parseSeconds("2w") == 1209600L)
    assert(Timeframes.parseSeconds("1M") == 2592000L)
    assert(Timeframes.parseSeconds("1y") == 31536000L)
    intercept[IllegalArgumentException](Timeframes.parseSeconds("1x"))
    intercept[IllegalArgumentException](Timeframes.parseSeconds("h"))
  }

  test("CSV round-trip: explicit schema, symbol tag, arrival order") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    val rows = Seq(
      (1704067200000L, 1.0, 2.0, 0.5, 1.5, 100.0),
      (1704070800000L, 1.5, 3.0, 1.0, 2.5, 200.0))
    val df = Ingest.fromExchangeRows(spark, rows, "BTC/USD")
    assert(df.columns.contains("datetime") && df.columns.contains("ingest_order"))
    Ingest.writeCsv(df.drop("ingest_order"), dir)
    val back = Ingest.readCsv(spark, dir, "BTC/USD")
    assert(back.count() == 2)
    assert(back.schema("datetime").dataType.typeName == "timestamp")
    assert(back.schema("close").dataType.typeName == "double")
  }

  test("paginated fetch: cursor advance, empty-page stop, stop-limit truncation") {
    // Fake exchange with 2500 hourly bars from t0.
    val t0 = 1600000000000L
    val total = 2500
    def page(cursor: Long, maxPerPage: Int) = {
      val startIdx = ((cursor - t0 + 3599999) / 3600000L).toInt.max(0)
      (startIdx until math.min(startIdx + maxPerPage, total)).map { i =>
        (t0 + i * 3600000L, 1.0, 2.0, 0.5, 1.5, 10.0)
      }
    }
    val all = Ingest.fetchPaginated(page, t0, stopLimit = 5000, maxPerPage = 1000)
    assert(all.length == total)          // stopped on empty page
    assert(all.map(_._1).distinct.length == total) // cursor never re-fetches
    val capped = Ingest.fetchPaginated(page, t0, stopLimit = 1500, maxPerPage = 1000)
    assert(capped.length == 1500)        // truncated to stop_limit
  }
}

package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ohlcv.Ingest

class ExchangeSourceSpec extends SparkSpec {

  private def read(total: Long, page: Int) =
    spark.read.format("graft.sources.ExchangeSource")
      .option("symbol", "BTC-USD").option("start_ms", 1000L)
      .option("interval_ms", 60000L).option("total", total)
      .option("page", page).load()

  test("DSv2 pages equal the driver-side cursor loop over the same feed") {
    val dsv2 = read(total = 2500, page = 1000)
      .orderBy("ts_ms")
      .select("ts_ms", "open", "high", "low", "close", "volume")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val cursorLoop = Ingest.fetchPaginated(
      ExchangeFeed.page("BTC-USD", 1000L, 60000L, total = 2500),
      startMs = 1000L, stopLimit = 2500, maxPerPage = 1000)
    assert(dsv2.length == 2500)
    assert(dsv2.toSeq == cursorLoop)
  }

  test("each page plans as its own partition") {
    val df = read(total = 2500, page = 1000)
    assert(df.rdd.getNumPartitions == 3) // ceil(2500/1000)
    // Short final page carries the remainder.
    assert(df.count() == 2500)
  }

  test("ts_ms predicate prunes pages at plan time without changing results") {
    val df = read(total = 2500, page = 1000)
    // Watermark at bar 2000 → only the third page should plan.
    val caught = df.filter(col("ts_ms") >= lit(1000L + 2000L * 60000L))
    assert(caught.rdd.getNumPartitions == 1, "expected 1 surviving page")
    assert(caught.count() == 500)
    // Unpruned evaluation agrees (pushdown is an optimization, not a filter).
    val expected = read(total = 2500, page = 1000).collect()
      .filter(_.getAs[Long]("ts_ms") >= 1000L + 2000L * 60000L).length
    assert(expected == 500)
    // Range predicate prunes both ends: bars [1000, 2000) → one page.
    val mid = df.filter(col("ts_ms") >= lit(1000L + 1000L * 60000L) &&
      col("ts_ms") < lit(1000L + 2000L * 60000L))
    assert(mid.rdd.getNumPartitions == 1)
    assert(mid.count() == 1000)
  }

  test("column pruning narrows the scan's ReadSchema") {
    val df = read(total = 100, page = 50).select("ts_ms", "close")
    // The BatchScan's output column list is the DSv2 ReadSchema; a
    // pruned scan lists only the projected fields (no symbol/open/...).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan exchange(BTC-USD)[ts_ms#") &&
      plan.contains(", close#") && !plan.contains("volume#"),
      s"expected pruned BatchScan output in:\n$plan")
    // Pruned read returns the same values as the full read's projection.
    val full = read(total = 100, page = 50).collect()
      .map(r => (r.getAs[Long]("ts_ms"), r.getAs[Double]("close"))).toSeq
    val pruned = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned.sorted == full.sorted)
  }

  test("pushdown at the start boundary keeps bar 0 (floor-div, not truncate)") {
    // ts_ms > 999 with startMs=1000: bar 0 qualifies; truncating division
    // would compute lo=1 and prune the page containing it.
    val df = read(total = 100, page = 50).filter(col("ts_ms") > 999L)
    assert(df.count() == 100)
    val df2 = read(total = 100, page = 50).filter(col("ts_ms") >= 999L)
    assert(df2.count() == 100)
  }

  test("cursor loop stops on the empty page past the feed's end") {
    val rows = Ingest.fetchPaginated(
      ExchangeFeed.page("ETH-USD", 0L, 1000L, total = 150),
      startMs = 0L, stopLimit = 999, maxPerPage = 100)
    assert(rows.length == 150) // feed exhausted before stopLimit
    assert(rows.map(_._1) == (0L until 150L).map(_ * 1000L))
  }
}

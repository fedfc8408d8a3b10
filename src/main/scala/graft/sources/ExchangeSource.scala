package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic "exchange feed": the stand-in for the
  * reference's rate-limited REST endpoint (`cdd.py:54-64`) in a
  * zero-egress sandbox. Bar `i` of a symbol is a pure function of
  * (symbol, i) — a splitmix-style hash drives a bounded random walk — so
  * ANY reader (driver cursor loop, DSv2 partition, test oracle) computes
  * identical pages.
  */
object ExchangeFeed {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def u01(z: Long): Double =
    (mix(z) >>> 11).toDouble / (1L << 53).toDouble

  /** `[ts_ms, open, high, low, close, volume]` for bar `i`. */
  def bar(symbol: String, i: Long, startMs: Long, intervalMs: Long)
      : (Long, Double, Double, Double, Double, Double) = {
    val seed = symbol.hashCode.toLong << 32
    val base = 100.0 + 50.0 * u01(seed) +
      10.0 * math.sin(i / 37.0) + 4.0 * (u01(seed + i) - 0.5)
    val open = base + (u01(seed + 7 * i + 1) - 0.5)
    val close = base + (u01(seed + 7 * i + 2) - 0.5)
    val high = math.max(open, close) + u01(seed + 7 * i + 3)
    val low = math.min(open, close) - u01(seed + 7 * i + 4)
    val volume = 1000.0 * u01(seed + 7 * i + 5)
    (startMs + i * intervalMs, open, high, low, close, volume)
  }

  /** Page of at most `limit` bars from the epoch-ms `cursor` — the exact
    * callback shape `Ingest.fetchPaginated` consumes, bounded by `total`
    * bars overall.
    */
  def page(symbol: String, startMs: Long, intervalMs: Long, total: Long)(
      cursorMs: Long, limit: Int)
      : Seq[(Long, Double, Double, Double, Double, Double)] = {
    val first = math.max(0L, (cursorMs - startMs + intervalMs - 1) / intervalMs)
    val last = math.min(total, first + limit)
    (first until last).map(i => bar(symbol, i, startMs, intervalMs))
  }
}

/** DataSource V2 paginated scan — SURVEY §2.1 S1's "custom DSv2
  * TableProvider with offset pagination" mapping, made concrete. The
  * reference fetches pages SEQUENTIALLY because a cursor loop is all a
  * REST client offers; a Spark-first source instead plans each page as an
  * independent `InputPartition` (page k = bars [k·pageSize, …)), so a
  * 1000-page backfill runs on 1000 tasks with no shared cursor state, no
  * driver bottleneck, and deterministic page boundaries. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.ExchangeSource")
  *   .option("symbol", "BTC-USD").option("start_ms", 0L)
  *   .option("interval_ms", 3600000L).option("total", 5000L)
  *   .option("page", 1000).load()
  * }}}
  */
class ExchangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExchangeSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ExchangeTable(new CaseInsensitiveStringMap(properties))
}

object ExchangeSource {
  val Schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  final case class PageParams(symbol: String, startMs: Long, intervalMs: Long,
      total: Long, pageSize: Int)

  def params(o: CaseInsensitiveStringMap): PageParams = PageParams(
    o.getOrDefault("symbol", "BTC-USD"),
    o.getLong("start_ms", 0L),
    o.getLong("interval_ms", 3600000L),
    o.getLong("total", 1000L),
    math.max(1, o.getInt("page", 1000)))
}

private[sources] class ExchangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val p = ExchangeSource.params(options)

  override def name(): String = s"exchange(${p.symbol})"
  override def schema(): StructType = ExchangeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with org.apache.spark.sql.connector.read.SupportsPushDownFilters
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      override def build(): Scan = this

      // Column pruning: the reader materializes ONLY the projected
      // fields — at scale the generator (or a real REST payload parse)
      // skips whole columns, and `.explain` shows the narrowed
      // ReadSchema exactly like a parquet scan would.
      private var required: StructType = ExchangeSource.Schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      // Cursor-catch-up pushdown: `ts_ms >= X` / `> X` narrows the FIRST
      // bar index, `<= X` / `< X` the last, so an incremental reader
      // plans only the pages past its watermark — page pruning at plan
      // time, the DSv2 analog of the reference's `cursor = last_ts + 1`.
      // Bounds only tighten ([lo, hi) stays within [0, total)), and the
      // filters are also kept (returned from pushedFilters, re-evaluated
      // by Spark) so pruning can never change results, only skip pages.
      private var lo = 0L
      private var hi = p.total
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

      // floorDiv, NOT `/`: Java's `/` truncates toward zero, so a cursor
      // value just BELOW startMs would compute bar index 0 instead of −1
      // and prune page 0 — silently dropping a qualifying row (pruning
      // removes pages entirely; the residual filter can't restore them).
      private def barsAtOrAfter(tsMs: Long): Long =
        math.max(0L, -Math.floorDiv(p.startMs - tsMs, p.intervalMs))
      private def barsAfter(tsMs: Long): Long =
        math.max(0L, Math.floorDiv(tsMs - p.startMs, p.intervalMs) + 1)

      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        import org.apache.spark.sql.sources._
        filters.foreach {
          case GreaterThanOrEqual("ts_ms", v: Long) => lo = math.max(lo, barsAtOrAfter(v))
          case GreaterThan("ts_ms", v: Long) => lo = math.max(lo, barsAfter(v))
          case LessThan("ts_ms", v: Long) => hi = math.min(hi, barsAtOrAfter(v))
          case LessThanOrEqual("ts_ms", v: Long) => hi = math.min(hi, barsAfter(v))
          case _ => ()
        }
        pushed = filters.filter {
          case GreaterThanOrEqual("ts_ms", _: Long) | GreaterThan("ts_ms", _: Long) |
               LessThan("ts_ms", _: Long) | LessThanOrEqual("ts_ms", _: Long) => true
          case _ => false
        }
        // Everything is handed back as residual: the source prunes pages,
        // Spark still applies the exact predicate row-wise.
        filters
      }

      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

      override def planInputPartitions(): Array[InputPartition] = {
        val first = math.min(lo, hi)
        val firstPage = (first / p.pageSize).toInt
        val lastPage = (((hi - 1) / p.pageSize) + 1).toInt
        (firstPage until math.max(firstPage, lastPage)).map { k =>
          ExchangePage(p.symbol, p.startMs, p.intervalMs,
            math.max(first, k.toLong * p.pageSize),
            math.min(hi, (k.toLong + 1) * p.pageSize))
            : InputPartition
        }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        // Resolve the projected fields to canonical ordinals ONCE — the
        // per-row loop below is then a branch-free int-indexed fill, not
        // a per-field string match.
        val ordinals = required.fieldNames.map(
          ExchangeSource.Schema.fieldNames.indexOf(_))
        new PartitionReaderFactory {
          override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
            val pg = partition.asInstanceOf[ExchangePage]
            new PartitionReader[InternalRow] {
              private var i = pg.first - 1
              private val sym = UTF8String.fromString(pg.symbol)
              private val full = new Array[Any](7)
              full(0) = sym
              override def next(): Boolean = { i += 1; i < pg.until }
              override def get(): InternalRow = {
                val (ts, o2, h, l, c, v) =
                  ExchangeFeed.bar(pg.symbol, i, pg.startMs, pg.intervalMs)
                full(1) = ts; full(2) = o2; full(3) = h
                full(4) = l; full(5) = c; full(6) = v
                val out = new Array[Any](ordinals.length)
                var j = 0
                while (j < ordinals.length) { out(j) = full(ordinals(j)); j += 1 }
                InternalRow.fromSeq(scala.collection.immutable.ArraySeq
                  .unsafeWrapArray(out))
              }
              override def close(): Unit = ()
            }
          }
        }
      }
    }
}

/** One page = one independent task: bars [first, until). */
final case class ExchangePage(symbol: String, startMs: Long, intervalMs: Long,
    first: Long, until: Long) extends InputPartition

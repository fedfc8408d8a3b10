package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet storage — the shuffle-free co-located join path.
  *
  * At 100 TB the dominant cost of a large equi-join is the shuffle of both
  * sides. Bucketing removes it: each side is written once, hash-partitioned
  * on its join key into a fixed bucket count, and every later join (or
  * aggregation) on that key reads the buckets as an already-satisfied
  * `HashPartitioning` — Catalyst plans a SortMergeJoin with NO Exchange on
  * either side (asserted by BucketedSpec). Write once, join shuffle-free
  * forever — the classic fact/dim layout for a training-data lake where
  * the same corpus is joined against metadata every pipeline run.
  *
  * Spark specifics this module encodes:
  *  - `bucketBy` is only honored by `saveAsTable` (catalog tables), not
  *    plain `save`; tables land under `spark.sql.warehouse.dir`.
  *  - bucket counts must MATCH on both sides for exchange-free joins
  *    (Spark can coalesce mismatched counts only when one divides the
  *    other and `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  *  - `sortBy` within buckets lets the reader skip the in-memory sort when
  *    each bucket holds one file; with several files per bucket Spark
  *    still plans a Sort, but never an Exchange — at scale the Exchange is
  *    the cost that matters (network + disk for every row vs a local sort
  *    that AQE sizes to fit memory).
  */
object Bucketed {

  /** Write `df` as a bucketed parquet catalog table (overwrite). */
  def write(df: DataFrame, table: String, buckets: Int, bucketCol: String,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def read(s: SparkSession, table: String): DataFrame = s.table(table)

  /** Drop the catalog entry AND the warehouse files of a managed table.
    * (In-memory catalog `DROP TABLE` already removes managed files; the
    * explicit delete keeps repeated harness runs from accreting dirs if a
    * run dies between write and drop.)
    */
  def drop(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      .stripPrefix("file:")
    val dir = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

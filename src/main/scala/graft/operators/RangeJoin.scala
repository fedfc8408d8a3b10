package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic non-equi interval join without the cartesian product.
  *
  * Spark executes `p BETWEEN lo AND hi` joins as BroadcastNestedLoopJoin
  * (fine only while one side broadcasts). The scale-safe encoding here is
  * the classic bucketed overlap join: quantize both sides to fixed-width
  * buckets — a point lands in one bucket, an interval explodes to every
  * bucket it overlaps — equi-join on the bucket id, then re-verify the
  * exact predicate. Lossless for ANY width (an interval covers every
  * bucket its span touches, so each true (point, interval) pair meets in
  * exactly one bucket — the point's); `width` only tunes fan-out:
  * ~the median interval length keeps the explode factor ≈ 2.
  *
  * At 100 TB this is one shuffle of each side on the bucket key, with
  * per-bucket work bounded by bucket occupancy — no broadcast-size
  * ceiling, no nested loop.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose [loCol, hiCol] contains
    * pCol (both ends inclusive). Output: every `points` column plus the
    * matching interval's columns; non-matching points are dropped (inner).
    * Each matching pair appears exactly once (the point's bucket).
    */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val pb = points.withColumn("__bucket", floor(col(pCol) / width).cast("long"))
    val ib = intervals
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / width).cast("long"),
          floor(col(hiCol) / width).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }
}

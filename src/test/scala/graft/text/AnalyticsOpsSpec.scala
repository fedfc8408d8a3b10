package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Specs for the round-5 batch-2 pipeline operators: BPE pair mining,
  * Bloom-pruned decontamination (losslessness vs the exact path), and
  * temperature mixture weights.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Bpe.pairCounts counts within-word adjacent pairs only") {
    val docs = Seq("abab ab", "x yz").toDF("text")
    val got = Bpe.pairCounts(docs, col("text"))
      .as[(String, Long)].collect().toMap
    // "abab" → ab, ba, ab; "ab" → ab; "x" too short; "yz" → yz
    assert(got == Map("ab" -> 3L, "ba" -> 1L, "yz" -> 1L))
  }

  test("Bpe.topPairs breaks count ties by pair ascending") {
    val docs = Seq("ba dc ba dc").toDF("text")
    val got = Bpe.topPairs(docs, col("text"), 1).as[(String, Long)].collect()
    assert(got.toSeq == Seq(("ba", 2L)))
  }

  test("bloomPrunedOverlap equals the exact benchmarkOverlap") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Contamination.benchmarkOverlap(docs, "doc_id", "text",
      col("source") === "src0", n = 5).orderBy("doc_id").collect()
    val bloom = Contamination.bloomPrunedOverlap(docs, "doc_id", "text",
      col("source") === "src0", n = 5, fpp = 0.2).orderBy("doc_id").collect()
    assert(exact.toSeq == bloom.toSeq)
    assert(exact.nonEmpty)
  }

  test("rollingMedian: middle order statistic, null under min_periods") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 1.0), (1L, 3L, 9.0),
      (1L, 4L, 3.0), (1L, 5L, 7.0), (2L, 1L, 2.0))
      .toDF("k", "t", "v")
    val got = df.withColumn("m",
        graft.ohlcv.Features.rollingMedian(col("v"), col("k"), col("t"), 3))
      .orderBy("k", "t")
      .select("m").collect().map(r => Option(r.getAs[Any](0)))
    // key 1: nulls until 3 rows, then median(5,1,9)=5, median(1,9,3)=3,
    // median(9,3,7)=7; key 2: single row → null.
    assert(got.toSeq == Seq(None, None, Some(5.0), Some(3.0), Some(7.0), None))
  }

  test("mixtureWeights: q sums to 1 and compresses the distribution") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Sampling.mixtureWeights(docs, "source",
        TextOps.tokenCount(col("text")).cast("long"), alpha = 0.5)
      .select("source", "p", "q").as[(String, Double, Double)].collect()
    assert(rows.length > 1)
    assert(approx(rows.map(_._2).sum, 1.0, 1e-9))
    assert(approx(rows.map(_._3).sum, 1.0, 1e-9))
    // α < 1 moves every stratum's weight toward uniform: rare strata gain,
    // common strata lose.
    val n = rows.length.toDouble
    rows.foreach { case (_, p, q) =>
      if (p < 1.0 / n) assert(q >= p)
      else if (p > 1.0 / n) assert(q <= p)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ohlcv.{TimeSeriesOps, Windows}
import graft.SparkSpec

/** Property-based invariants (SURVEY.md §5 item 4), driven by raw
  * ScalaCheck generators sampled with fixed seeds (the scalatest-plus
  * bridge is not in the offline cache). Spark jobs per case are
  * expensive — 5 cases per property; generators kept tiny.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    (0 until 5).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => body(a, b) }

  private val idxValues: Gen[List[(Long, Double)]] =
    Gen.chooseNum(3, 30).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(-100.0, 100.0)))
    }.map(_.distinctBy(_._1).sortBy(_._1)).suchThat(_.size >= 3)

  test("gapFillFfill yields a dense contiguous index per key") {
    forAll(idxValues) { rows =>
      val df = rows.map { case (i, v) => ("k", i, v) }.toDF("symbol", "time_idx", "close")
      val out = TimeSeriesOps.gapFillFfill(df, "symbol", "time_idx", Seq("close"))
        .orderBy("time_idx").select("time_idx").as[Long].collect()
      val lo = rows.map(_._1).min
      val hi = rows.map(_._1).max
      assert(out.toSeq == (lo to hi).toSeq)
    }
  }

  test("z-score then un-z-score round-trips the raw window") {
    forAll(Gen.listOfN(8, Gen.chooseNum(-1000.0, 1000.0))) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("symbol", "idx", "close")
      val w = Windows.slidingZscored(df, "symbol", "idx", "close", len = 8)
      val back = w.select(Windows.unzscore(
          col("zvalues"), col("center"), col("scale") + lit(1e-8)).as("r"))
        .as[Seq[Double]].head()
      back.zip(vals).foreach { case (a, b) => assert(approx(a, b, 1e-9)) }
    }
  }

  test("window count is n - len + 1 per key") {
    forAll2(Gen.chooseNum(5, 40), Gen.chooseNum(2, 5)) { (n, len) =>
      val df = (0 until n).map(i => ("k", i.toLong, i.toDouble))
        .toDF("symbol", "idx", "close")
      val c = Windows.slidingZscored(df, "symbol", "idx", "close", len).count()
      assert(c == math.max(0, n - len + 1))
    }
  }

  test("dedupKeepLast leaves unique keys and keeps the max arrival") {
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 100L)))) { rows =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "arrival")
      val out = TimeSeriesOps.dedupKeepLast(df, Seq("k"), col("arrival"))
        .select("k", "arrival").as[(Long, Long)].collect()
      assert(out.map(_._1).distinct.length == out.length)
      val expect = rows.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.map(_._2.toLong).max).toMap
      out.foreach { case (k, a) => assert(expect(k) == a) }
    }
  }

  test("knn top-k is the prefix of the full distance sort") {
    forAll(Gen.listOfN(15, Gen.listOfN(4, Gen.chooseNum(-10.0, 10.0)))) { vecs =>
      val corpus = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("cid", "v")
      val queries = Seq((0L, vecs.head)).toDF("qid", "qv")
      val topk = graft.ohlcv.Search.knnJoin(corpus, queries, "cid", "v", "qid", "qv", 5, "l2")
        .orderBy("rank").select("cid").as[Long].collect().toSeq
      val full = corpus
        .withColumn("d", graft.ohlcv.Search.l2(col("v"), array(vecs.head.map(lit): _*)))
        .orderBy(col("d").asc, col("cid").asc).select("cid").as[Long].collect().toSeq
      assert(topk == full.take(5))
    }
  }

  test("resample at the same delta is idempotent") {
    forAll(idxValues) { rows =>
      val df = rows.map { case (i, v) =>
        ("k", new java.sql.Timestamp(1700000000000L + i * 3600 * 1000), v, v, v, v, v)
      }.toDF("symbol", "datetime", "open", "high", "low", "close", "volume")
      val once = TimeSeriesOps.resampleOhlcv(df, "symbol", "datetime", 3600,
        emitEmpty = false)
      val twice = TimeSeriesOps.resampleOhlcv(once, "symbol", "datetime", 3600,
        emitEmpty = false)
      val a = once.orderBy("datetime")
        .select("datetime", "open", "high", "low", "close").collect().toSeq
      val b = twice.orderBy("datetime")
        .select("datetime", "open", "high", "low", "close").collect().toSeq
      assert(a == b)
    }
  }
}

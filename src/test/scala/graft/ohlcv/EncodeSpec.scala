package graft.ohlcv

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EncodeSpec extends SparkSpec {
  import spark.implicits._

  test("pcaMatrix: learned projection has the right shape and captures the dominant axis") {
    // Windows that vary almost entirely along one direction.
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(8)(i => math.sin(i.toDouble))
    val rows = (0 until 200).map { _ =>
      val a = rnd.nextGaussian() * 10
      Tuple1(base.map(x => x * a + rnd.nextGaussian() * 0.01).toSeq)
    }
    val df = rows.toDF("values")
    val m = Encode.pcaMatrix(df, "values", inLen = 8, outDim = 2)
    assert(m.length == 2 && m.forall(_.length == 8))
    // First PC should be parallel to `base` (up to sign).
    val b = base
    val dot = math.abs(m(0).zip(b).map { case (x, y) => x * y }.sum)
    val nm = math.sqrt(m(0).map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
    assert(dot / nm > 0.99)
  }

  test("randomProjectionMatrix is deterministic in its seed") {
    val a = Encode.randomProjectionMatrix(16, 4, 42L)
    val b = Encode.randomProjectionMatrix(16, 4, 42L)
    val c = Encode.randomProjectionMatrix(16, 4, 43L)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.toSeq != c.flatten.toSeq)
    assert(a.flatten.forall(x => x >= -1.0 && x <= 1.0))
  }

  test("whitenedPcaMatrix yields ~unit projection variance per component") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(8)(i => math.sin(i.toDouble))
    val base2 = Array.tabulate(8)(i => math.cos(2.0 * i))
    val rows = (0 until 400).map { _ =>
      val a = rnd.nextGaussian() * 10
      val b = rnd.nextGaussian() * 2
      Tuple1(base.indices.map(j =>
        base(j) * a + base2(j) * b + rnd.nextGaussian() * 0.01).toSeq)
    }
    val df = rows.toDF("values")
    val w = Encode.whitenedPcaMatrix(df, "values", inLen = 8, outDim = 2)
    assert(w.length == 2 && w.forall(_.length == 8))
    // Project the same data through the whitened matrix: each
    // component's variance must be ~1 (the whitening law) — the raw
    // PCA components would instead show variances ~100 vs ~4.
    val data = rows.map(_._1.toArray)
    val vars = w.map { comp =>
      val proj = data.map(v => v.zip(comp).map { case (x, y) => x * y }.sum)
      val mean = proj.sum / proj.length
      proj.map(p => (p - mean) * (p - mean)).sum / proj.length
    }
    vars.foreach(v => assert(math.abs(v - 1.0) < 0.2,
      s"whitened component variance $v should be ~1"))
    // And it must differ from the unwhitened fit (not a no-op).
    val m = Encode.pcaMatrix(df, "values", inLen = 8, outDim = 2)
    assert(w.flatten.toSeq != m.flatten.toSeq)
  }
}

package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Dedup
import org.apache.spark.sql.graft.{PerceptualHashExpressions, PerceptualHashKernel}

/** Pins the perceptual-hash fingerprints (round-15 #2) and — the load-
  * bearing property — hamming-neighbor RECALL of the banded pair path
  * on a constructed near-dup fixture: perturbed copies of a base image
  * must land within the hamming bar and be recovered by the pigeonhole
  * band join, pair-for-pair equal to brute force.
  */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  /** A deterministic 8-wide "image": smooth vertical gradient plus a
    * per-image phase so different ids differ, as raw grid bytes.
    */
  private def baseImage(id: Int, rows: Int = 24): Array[Byte] =
    Array.tabulate(rows * 8) { i =>
      val r = i / 8; val c = i % 8
      (((r * 9 + c * 5 + id * 37) % 200) + 20).toByte
    }

  /** Perturb `k` pixels — a re-encode/watermark stand-in. The grid is
    * 24×8 and the hash samples 11 of 24 rows × 6 of 8 cols, so a few
    * changed pixels flip at most a few fingerprint bits.
    */
  private def perturb(img: Array[Byte], k: Int, seed: Int): Array[Byte] = {
    val out = img.clone()
    val rnd = new scala.util.Random(seed)
    (0 until k).foreach { _ =>
      val i = rnd.nextInt(out.length)
      out(i) = (out(i) + 40).toByte
    }
    out
  }

  test("kernel determinism, 60-bit range, and null on short payloads") {
    val img = baseImage(1)
    val d1 = PerceptualHashKernel.dhash60(img, 8)
    val d2 = PerceptualHashKernel.dhash60(img.clone(), 8)
    assert(d1 == d2 && d1 != null)
    val dv = d1.asInstanceOf[Long]
    assert(dv >= 0L && dv < (1L << 60), "fingerprint must fit 60 bits")
    val av = PerceptualHashKernel.ahash60(img, 8).asInstanceOf[Long]
    assert(av >= 0L && av < (1L << 60))
    // aHash bit balance: by construction ~half the pixels sit above the
    // mean — all-zero / all-one fingerprints would mean a broken sample.
    val pop = java.lang.Long.bitCount(av)
    assert(pop > 5 && pop < 55, s"degenerate aHash popcount $pop")
    assert(PerceptualHashKernel.dhash60(Array[Byte](1, 2, 3), 8) == null)
    assert(PerceptualHashKernel.ahash60(Array.empty[Byte], 8) == null)
  }

  test("near-dup fixture: perturbed copies stay within the bar; banded recall is exact") {
    // 30 distinct base images; images 0..4 each get two perturbed
    // near-dup copies (ids 100+i, 200+i).
    val imgs: Seq[(Long, Array[Byte])] =
      (0 until 30).map(i => (i.toLong, baseImage(i))) ++
        (0 until 5).flatMap(i => Seq(
          (100L + i, perturb(baseImage(i), 2, seed = i)),
          (200L + i, perturb(baseImage(i), 3, seed = 7 * i + 1))))
    val df = imgs.toDF("doc_id", "payload")
      .select(col("doc_id"),
        PerceptualHashExpressions.dhash60(col("payload")).as("phash"))
    val fps = df.as[(Long, Long)].collect().toMap
    // The constructed near-dups really are hamming-near (the fixture is
    // meaningful), and at least one planted pair is non-trivial (>0).
    val planted = (0 until 5).flatMap(i =>
      Seq((i.toLong, 100L + i), (i.toLong, 200L + i)))
    planted.foreach { case (a, b) =>
      val h = java.lang.Long.bitCount(fps(a) ^ fps(b))
      assert(h <= 6, s"planted pair ($a,$b) drifted to hamming $h")
    }
    assert(planted.exists { case (a, b) =>
      java.lang.Long.bitCount(fps(a) ^ fps(b)) > 0 })
    // Banded path == brute force, pair-for-pair (pigeonhole losslessness
    // at maxHamming=6 with 7 bands over 60 bits).
    val banded = Dedup.simhashNearDupPairs(df, "doc_id", "phash",
        maxHamming = 6, bits = 60)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val ids = fps.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 6
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    // Recall on the planted fixture specifically: every planted pair is
    // in the banded output.
    planted.foreach { case (a, b) =>
      assert(banded.exists(p => p._1 == a && p._2 == b),
        s"planted near-dup ($a,$b) missed by the banded path")
    }
  }

  test("codegen and interpreted paths agree (q285's projection is codegen'd)") {
    val img = baseImage(3)
    val df = Seq((1L, img)).toDF("id", "payload")
      .select(
        PerceptualHashExpressions.dhash60(col("payload")).as("d"),
        PerceptualHashExpressions.ahash60(col("payload")).as("a"))
    val row = df.collect().head
    assert(row.getLong(0) == PerceptualHashKernel.dhash60(img, 8))
    assert(row.getLong(1) == PerceptualHashKernel.ahash60(img, 8))
  }
}

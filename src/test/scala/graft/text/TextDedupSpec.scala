package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("md5Hash60 matches the DuckDB-portable definition") {
    // DuckDB: SELECT ('0x' || substr(md5('abc'), 1, 15))::BIGINT
    val out = Seq(Tuple1("abc")).toDF("t")
      .select(TextOps.md5Hash60(col("t"))).as[Long].head()
    assert(out == 648541476951500027L)
  }

  test("wordShingles: n-grams joined by single space, ragged tail trimmed") {
    val df = Seq(Tuple1("  the quick  brown fox ")).toDF("t")
    val sh2 = df.select(TextOps.wordShingles(col("t"), 2)).as[Seq[String]].head()
    assert(sh2 == Seq("the quick", "quick brown", "brown fox"))
    val sh5 = df.select(TextOps.wordShingles(col("t"), 5)).as[Seq[String]].head()
    assert(sh5.isEmpty)
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq(("A  b\tC", 1L), ("a b c", 2L)).toDF("t", "id")
    val fps = df.select(TextOps.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("token counts: whitespace and subword") {
    val df = Seq(Tuple1("hello, world! formidable")).toDF("t")
    val row = df.select(
      TextOps.tokenCount(col("t")).as("ws"),
      TextOps.subwordCount(col("t")).as("sub")).head()
    assert(row.getAs[Int]("ws") == 3)
    // hell+o+','  worl+d+'!'  form+idab+le -> 9
    assert(row.getAs[Int]("sub") == 9)
  }

  test("exact dedup keeps smallest id per normalized text") {
    val df = Seq((1L, "a b"), (2L, "A  B"), (3L, "c")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("simhashAgg equals the columnar simhash formulation") {
    val df = Seq((1L, "w x y z w x"), (2L, "p q r s t u v")).toDF("doc_id", "text")
    val viaAgg = Dedup.simhashAgg(df, "doc_id", TextOps.wordShingles(col("text"), 2), 16)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val viaCol = df.select(col("doc_id"),
      Dedup.simhash(TextOps.wordShingles(col("text"), 2), 16).as("simhash"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(viaAgg.toSeq == viaCol.toSeq)
  }

  test("hamming distance of simhashes") {
    val df = Seq((0L, 0L), (0L, 7L)).toDF("a", "b")
    val out = df.select(Dedup.hamming(col("a"), col("b"))).as[Long].collect()
    assert(out.toSeq == Seq(0L, 3L))
  }

  test("ngramJaccardPairs finds crafted near-dups, exact jaccard value") {
    // doc1/doc2 share most 2-grams; doc3 unrelated.
    val df = Seq(
      (1L, "a b c d e f"), // 2-grams: ab bc cd de ef (5)
      (2L, "a b c d e g"), // ab bc cd de eg -> inter 4, union 6 -> J=2/3
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", shingleN = 2, threshold = 0.5)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id_a") == 1L && out.head.getAs[Long]("id_b") == 2L)
    assert(approx(out.head.getAs[Double]("jaccard"), 4.0 / 6.0, 1e-5))
  }

  test("minhash signature estimates jaccard roughly") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g z"))
      .toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      Dedup.minhashSignature(TextOps.wordShingles(col("text"), 2), 32).as("sig"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val est = sigs(0)._2.zip(sigs(1)._2).count { case (a, b) => a == b } / 32.0
    assert(est > 0.4 && est < 1.0) // true J = 6/8
  }

  test("minhashLshPairs surfaces high-jaccard pairs as candidates") {
    val df = Seq(
      (1L, "the cat sat on the mat today again"),
      (2L, "the cat sat on the mat today too"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", shingleN = 2,
      numHashes = 12, bands = 6).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhashNearDupPairs: banded equi-join matches brute force, no cartesian") {
    val fps: Seq[(Long, Long)] = Seq(
      (1L, 0x0F0F0F0FL), (2L, 0x0F0F0F0EL), // hamming 1
      (3L, 0x12345678L), (4L, 0x12345778L), // hamming 1
      (5L, 0L), (6L, 0xFFFFFFFFL),          // hamming 32
      (7L, 0x0F0F0F0FL),                    // dup of 1 (collides in EVERY band)
      (8L, 0x0F0F1F1FL))                    // hamming 2 from 1
    val df = fps.toDF("doc_id", "simhash")
    val banded = Dedup.simhashNearDupPairs(df, "doc_id", "simhash", maxHamming = 6)
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 6
    } yield (a, b, h.toLong)).toSet
    assert(banded.as[(Long, Long, Long)].collect().toSet == brute)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("simhashNearDupPairs: 60-bit banding is lossless on random fingerprints") {
    // The q49 registered width: 7 bands of 8–9 bits. Seeded random corpus
    // with planted near-duplicates; banded output must equal brute force.
    val rnd = new scala.util.Random(1234L)
    val base = Seq.tabulate(40)(i => (i.toLong, rnd.nextLong() & ((1L << 60) - 1)))
    val planted = base.take(10).map { case (id, fp) =>
      var v = fp
      (0 until rnd.nextInt(7)).foreach(_ => v ^= 1L << rnd.nextInt(60))
      (id + 1000L, v)
    }
    val fps = base ++ planted
    val df = fps.toDF("doc_id", "simhash")
    val banded = Dedup.simhashNearDupPairs(df, "doc_id", "simhash",
      maxHamming = 6, bits = 60)
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 6
    } yield (a, b, h.toLong)).toSet
    assert(brute.nonEmpty)
    assert(banded.as[(Long, Long, Long)].collect().toSet == brute)
  }

  test("connectedComponents resolves chains and separate clusters") {
    // Component {1,2,3,9} is a chain 9-3-2-1 (needs >1 propagation
    // round for 9 to reach label 1); {5,6} is separate.
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 9L), (5L, 6L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("embeddingNearDup(planes>0): subset of exact pairs, errors on bad dim") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.9, 0.1, 0.0, 0.0)),
      (3L, Array(-1.0, 0.0, 0.0, 0.0)),
      (4L, Array(0.0, 1.0, 0.0, 0.0)))
    val df = vecs.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.5,
      planes = 2, dim = 4).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact))
    assert(bucketed.contains((1L, 2L))) // near-identical vectors share buckets
    val bad = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.5,
      planes = 2, dim = 7)
    intercept[Exception] { bad.collect() }
  }

  test("langid: spanish markers beat english on spanish-ish text") {
    val df = Seq((1L, "el gato de la casa y los perros")).toDF("doc_id", "text")
    val out = TextOps.withLangId(df, "text").select("lang_pred").as[String].head()
    assert(out == "es")
  }

  test("quality score: empty text scores 0, clean prose scores high") {
    val df = Seq(
      (1L, ""),
      (2L, "the cat sat on the mat and it was a good day for all of the cats in town")
    ).toDF("doc_id", "text")
    val out = TextOps.qualityScore(df, "text").orderBy("doc_id")
      .select("quality_score").as[Double].collect()
    assert(out(0) == 0.0)
    assert(out(1) > 0.5)
  }
}

package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract pins for the round-12 banded twins of the exact-simhash
  * family (q256/q257/q258) and the PPJoin twin (q259): each twin must be
  * a faithful RESTRICTION of its exact counterpart — the banded proposer
  * may lose recall (pairs sharing no minhash band), but every pair it
  * does emit must carry the exact tier's verdict bit-for-bit, and the
  * cluster/apply steps must be internally consistent with the pair tier
  * they consume. Hash-level engine/oracle parity lives in the DuckDB
  * oracles; these specs pin the cross-query semantics on sf0.001.
  */
class BandedTierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.Queries.all.find(_.name == name).get.run(spark, sf)

  test("q256 is non-empty here and a subset of q49 with identical hamming values") {
    val banded = q("q256_simhash_banded")
    val exact = q("q49_simhash_neardup")
    // Non-vacuous: the fixture corpus has near-dup mass the banded tier finds.
    assert(banded.count() > 0, "banded tier found nothing — subset test vacuous")
    // Every banded pair appears in the exact tier with the same hamming
    // (hamming is a pure function of the two fingerprints, so a mismatch
    // would mean the twin verified against different fingerprints).
    val mismatched = banded.as("b").join(exact.as("e"),
      col("b.id_a") === col("e.id_a") && col("b.id_b") === col("e.id_b"),
      "left")
      .filter(col("e.id_a").isNull || col("b.hamming") =!= col("e.hamming"))
    assert(mismatched.count() == 0,
      "banded pair missing from exact tier or hamming diverges")
  }

  test("q257 clusters are consistent with q256's pairs (endpoints co-clustered, keeper = cluster min)") {
    val pairs = q("q256_simhash_banded").cache()
    val comp = q("q257_dedup_clusters_banded").cache()
    // Every pair's endpoints share a cluster label.
    val lbl = comp.select(col("doc_id"), col("cluster"))
    val split = pairs
      .join(lbl.select(col("doc_id").as("id_a"), col("cluster").as("ca")), "id_a")
      .join(lbl.select(col("doc_id").as("id_b"), col("cluster").as("cb")), "id_b")
      .filter(col("ca") =!= col("cb"))
    assert(split.count() == 0, "a verified pair spans two clusters")
    // Keeper flag is exactly "doc_id equals its cluster's minimum id".
    val badKeeper = comp
      .withColumn("mn", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster")))
      .filter((col("doc_id") === col("mn")) =!= col("is_keeper"))
    assert(badKeeper.count() == 0, "is_keeper diverges from cluster min")
    pairs.unpersist(); comp.unpersist()
  }

  test("q258 survivors = documents minus q257's non-keepers") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id")
    val losers = q("q257_dedup_clusters_banded")
      .filter(!col("is_keeper")).select("doc_id")
    val expected = docs.except(losers)
    val got = q("q258_dedup_apply_banded").select("doc_id")
    assert(got.except(expected).count() == 0 &&
      expected.except(got).count() == 0,
      "apply step diverges from clusters' keeper rule")
  }

  test("q259 is non-empty here and a subset of q42 with identical jaccard values") {
    val banded = q("q259_jaccard_pairs_banded")
    val exact = q("q42_ngram_jaccard")
    assert(banded.count() > 0, "banded Jaccard tier found nothing — test vacuous")
    val mismatched = banded.as("b").join(exact.as("e"),
      col("b.id_a") === col("e.id_a") && col("b.id_b") === col("e.id_b"),
      "left")
      .filter(col("e.id_a").isNull || col("b.jaccard") =!= col("e.jaccard"))
    assert(mismatched.count() == 0,
      "banded Jaccard pair missing from PPJoin tier or value diverges")
  }

  test("annotation closure: the q49/q107/q125/q42 family all carry scaleLimited at their twins") {
    val byName = graft.Queries.all.map(qq => qq.name -> qq).toMap
    assert(byName("q49_simhash_neardup").scaleLimited
      .contains("q256_simhash_banded"))
    assert(byName("q107_dedup_clusters").scaleLimited
      .contains("q257_dedup_clusters_banded"))
    assert(byName("q125_dedup_apply").scaleLimited
      .contains("q258_dedup_apply_banded"))
    assert(byName("q42_ngram_jaccard").scaleLimited
      .contains("q259_jaccard_pairs_banded"))
  }
}

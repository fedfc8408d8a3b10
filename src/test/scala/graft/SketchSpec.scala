package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Semantic invariants for the round-11 sketch/compression queries:
  * q241 KMV corpus-overlap sketches (Beyer et al. 2007) and q242 SQ8
  * scalar-quantization audit. Hash-level parity lives in the DuckDB
  * oracles; these pin the ESTIMATOR contracts against exact ground
  * truth computed independently on the sf0.001 corpus.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.Queries.all.find(_.name == name).get.run(spark, sf)

  /** Distinct (source, shingle-hash) ground truth — the set the KMV
    * sketch summarizes.
    */
  private def shingleSets = Tables.documents(spark, sf)
    .select(col("source"), explode(array_distinct(
      TextOps.wordShingles(col("text"), 3))).as("s"))
    .select(col("source"), TextOps.md5Hash60(col("s")).as("h"))
    .distinct()

  test("q241: one row per source pair; sketch counters are bounded and ordered") {
    val out = q("q241_kmv_overlap").cache()
    val nSrc = shingleSets.select("source").distinct().count()
    assert(out.count() == nSrc * (nSrc - 1) / 2)
    assert(out.filter(col("ku") > 64 || col("inter_k") > col("ku")).count() == 0)
    assert(out.filter(col("jaccard_est") < 0 || col("jaccard_est") > 1).count() == 0)
    assert(out.filter(col("source_a") >= col("source_b")).count() == 0)
    out.unpersist()
  }

  test("q241: KMV Jaccard tracks exact Jaccard within the k=64 error budget") {
    val sh = shingleSets.cache()
    val d = sh.groupBy("source").agg(count(lit(1)).as("nd"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(d.select(col("source").as("sa"), col("nd").as("nda")), "sa")
      .join(d.select(col("source").as("sb"), col("nd").as("ndb")), "sb")
      .select(col("sa"), col("sb"), (col("ni").cast("double") /
        (col("nda") + col("ndb") - col("ni")).cast("double")).as("jexact"))
    val joined = q("q241_kmv_overlap")
      .join(exact, col("source_a") === col("sa") && col("source_b") === col("sb"), "left")
      .select(col("jaccard_est"), coalesce(col("jexact"), lit(0.0)).as("jexact"))
      .collect()
    val errs = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    // k=64 ⇒ binomial SE ≤ 1/√64·√(J(1−J)) ≈ 0.0625 at worst; the
    // sf0.001 corpus measures mean 0.015 / max 0.080 — bound with slack
    // so the spec pins the estimator, not the corpus.
    assert(errs.sum / errs.length <= 0.05,
      s"mean |est−exact| = ${errs.sum / errs.length}")
    assert(errs.max <= 0.20, s"max |est−exact| = ${errs.max}")
    sh.unpersist()
  }

  test("q241: per-source distinct estimates track exact distinct counts") {
    val d = shingleSets.groupBy("source").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val out = q("q241_kmv_overlap")
      .select("source_a", "est_distinct_a", "source_b", "est_distinct_b")
      .collect()
    val rel = out.flatMap(r => Seq(
      math.abs(r.getDouble(1) - d(r.getString(0))) / d(r.getString(0)),
      math.abs(r.getDouble(3) - d(r.getString(2))) / d(r.getString(2))))
    // (k−1)/h_k has relative SE ≈ 1/√(k−2) ≈ 12.7% at k=64; measured
    // mean 11.5% / max 18.7% on sf0.001.
    assert(rel.sum / rel.length <= 0.20, s"mean rel err = ${rel.sum / rel.length}")
    assert(rel.max <= 0.40, s"max rel err = ${rel.max}")
  }

  test("q242: every vector audited once per label; labels partition the store") {
    val out = q("q242_sq8_quantize").cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.agg(sum("n_vecs")).collect()(0).getLong(0) == n)
    assert(out.select("label").distinct().count() == out.count())
    out.unpersist()
  }

  test("q243: grid mass equals the candidate set; deciles >= 5 are exactly the verified tier") {
    val out = q("q243_tier_calibration").cache()
    val candRows = PipelineQueries.bandedCandidateOverlap(spark, sf).count()
    assert(out.agg(sum("n_pairs")).collect()(0).getLong(0) == candRows,
      "every banded candidate pair lands in exactly one grid cell")
    // floor(10·J) ≥ 5 ⟺ J ≥ 0.5 for exact rationals, so the high-decile
    // mass must equal the q239/q240 verified-pair tier bit-for-bit.
    val hi = out.filter(col("jacc_decile") >= 5)
      .agg(coalesce(sum("n_pairs"), lit(0L))).collect()(0).getLong(0)
    assert(hi == PipelineQueries.bandedVerifiedPairs(spark, sf).count())
    out.unpersist()
  }

  test("q243: hamming distance separates the accepted tier from the rejected one") {
    val cells = q("q243_tier_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def wMean(p: ((Long, Long, Long)) => Boolean): Option[Double] = {
      val xs = cells.filter(p)
      if (xs.isEmpty) None
      else Some(xs.map(c => c._2.toDouble * c._3).sum / xs.map(_._3).sum)
    }
    (wMean(_._1 >= 5), wMean(_._1 < 5)) match {
      case (Some(acc), Some(rej)) =>
        assert(acc < rej,
          s"accepted-tier mean hamming bin $acc should sit below rejected-tier $rej")
      case _ => // corpus produced only one side of the bar — nothing to compare
    }
  }

  test("q244: remap covers exactly the non-canonical members and never demotes length") {
    val out = q("q244_canonical_remap").cache()
    import graft.text.Dedup
    val comp = Dedup.connectedComponents(
      PipelineQueries.bandedVerifiedPairs(spark, sf)).cache()
    val members = comp.count()
    val clusters = comp.select("cluster").distinct().count()
    assert(out.count() == members - clusters,
      "one remap row per non-canonical cluster member")
    // Canonicals are fixed points: never remapped themselves.
    assert(out.select("canonical_id").intersect(out.select("doc_id")).count() == 0)
    // Keep-the-longest: the canonical is never shorter than the doc it
    // replaces, and ties break to the smaller id.
    val nc = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val bad = out
      .join(nc.select(col("doc_id"), col("n_chars").as("nc_loser")), "doc_id")
      .join(nc.select(col("doc_id").as("canonical_id"),
        col("n_chars").as("nc_canon")), "canonical_id")
      .filter(col("nc_canon") < col("nc_loser") ||
        (col("nc_canon") === col("nc_loser") && col("canonical_id") > col("doc_id")))
    assert(bad.count() == 0, "canonical must win on (n_chars desc, doc_id asc)")
    comp.unpersist(); out.unpersist()
  }

  test("q250: exact output; MG candidate union is a superset; bounded size") {
    import spark.implicits._
    val out = q("q250_heavy_hitters").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Ground truth from a plain-Scala count.
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
    val counts = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = words.length.toLong
    val truth = counts.filter { case (_, c) => c * 30L > n }
    assert(out == truth, "exact heavy-hitter set and counts")
    // The Misra–Gries union must contain every true heavy hitter and
    // stay within its m × partitions size bound.
    val tokDs = Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .as[String]
    val cand = graft.text.HeavyHitters.misraGriesCandidates(tokDs, 29)
      .collect().map(_.getString(0)).toSet
    assert(truth.keySet.subsetOf(cand), "MG union must cover true HHs")
    assert(cand.size <= 29 * tokDs.rdd.getNumPartitions)
  }

  test("q242: midpoint reconstruction bounds MSE by the worst half-step squared") {
    // |v − recon| ≤ step_d/2 per dimension (uniform grid, midpoint
    // dequant), so every per-vector MSE — hence max_mse — is bounded by
    // max_d (step_d/2)², computed here independently from the store.
    val maxStep = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dpos", "v")))
      .groupBy("dpos").agg(((max("v") - min("v")) / lit(256.0)).as("step"))
      .agg(max("step")).collect()(0).getDouble(0)
    val bound = math.pow(maxStep / 2.0, 2) + 1e-9
    val out = q("q242_sq8_quantize").cache()
    assert(out.filter(col("max_mse") > bound).count() == 0,
      s"some label's max_mse exceeds the half-step bound $bound")
    assert(out.filter(col("mean_mse") > col("max_mse")).count() == 0)
    assert(out.filter(col("mean_mse") <= 0).count() == 0,
      "quantization distortion should be strictly positive on real data")
    out.unpersist()
  }
}

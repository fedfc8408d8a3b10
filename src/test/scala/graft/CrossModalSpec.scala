package graft

import org.apache.spark.sql.functions._

/** Laws for the cross-modal release manifest (q293) and the dedup
  * policy audit (q296): partition/commutativity of the manifest
  * accounting, and the constructed-chain fixture on which the CC and
  * pair-local policies diverge by EXACTLY the chain interior — the
  * divergence q291/q292 measured in the wild, reproduced minimally.
  */
class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    Queries.all.find(_.name == name).get.run(spark, sf)

  test("q293: first-cause accounting partitions the corpus; survivors are tier-order-independent") {
    val rows = run("q293_release_manifest_multimodal").collect()
    // Partition law per source: kept + Σ_tier removed == total, for
    // docs AND tokens — first-cause attribution never double-counts.
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) ==
        r.getLong(3) + r.getLong(5) + r.getLong(7) + r.getLong(9) + r.getLong(11),
        s"$src: doc accounting does not partition")
      assert(r.getLong(2) ==
        r.getLong(4) + r.getLong(6) + r.getLong(8) + r.getLong(10) + r.getLong(12),
        s"$src: token accounting does not partition")
    }
    // Non-vacuous: at least one tier beyond text removes something.
    val rmOther = rows.map(r => r.getLong(5) + r.getLong(7) + r.getLong(9)).sum
    assert(rmOther > 0, "no image/audio/video removals — fixture vacuous")
    // Survivor set independently recomputed as docs minus the UNION of
    // the four tier loser sets — and a union is symmetric, so building
    // it in the reverse tier order yields the same set (the
    // intersection-of-survivors commutativity the manifest claims).
    val tl = PipelineQueries.keepBestLosers(spark, sf)
      .as[Long].collect().toSet
    val il = MediaQueries.imagePairLocalLosers(spark, sf).as[Long].collect().toSet
    val al = MediaQueries.audioPairLocalLosers(spark, sf).as[Long].collect().toSet
    val vl = MediaQueries.videoPairLocalLosers(spark, sf).as[Long].collect().toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect()
    val forward = docs.filterNot(d => ((tl ++ il) ++ al) ++ vl contains d._1)
    val reverse = docs.filterNot(d => ((vl ++ al) ++ il) ++ tl contains d._1)
    assert(forward.toSet == reverse.toSet, "survivor set not order-independent")
    val keptBySrc = forward.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(11) == keptBySrc.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: kept_docs != independent survivor recount")
    }
  }

  // Zigzag chain 1–4–2–5–3: normalized pairs (1,4),(2,4),(2,5),(3,5).
  // Pair-local losers = {4,5} (the only ids ever on the b side); exact
  // CC losers = {2,3,4,5}; the divergence {2,3} is exactly the chain
  // INTERIOR — nodes whose neighbors are all larger but whose component
  // min is smaller. Diameter 4 > AuditRounds, so the bounded probe must
  // report non-convergence.
  private val zigzag = Seq((1L, 4L), (2L, 4L), (2L, 5L), (3L, 5L))

  test("q296 fixture: bounded labels, convergence flag, and CC-vs-local divergence = chain interior") {
    val pairs = zigzag.toDF("id_a", "id_b")
    // Bounded labels at rounds=4 (>= diameter): exact CC — every node
    // labeled 1; local losers {4,5}; divergence = interior {2,3}.
    val l4 = CrossModalQueries.boundedMinLabels(pairs, 4)
      .as[(Long, Long)].collect().toMap
    assert(l4 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    val ccLosers = l4.filter { case (id, lbl) => lbl != id }.keySet
    val localLosers = zigzag.map(_._2).toSet
    assert(ccLosers == Set(2L, 3L, 4L, 5L))
    assert(localLosers == Set(4L, 5L))
    assert(ccLosers -- localLosers == Set(2L, 3L),
      "divergence is not exactly the chain interior")
    // The audit itself (AuditRounds = 3 < diameter): must flag
    // non-convergence and recommend pair_local.
    val (tier, gauged, nPairs, docsIn, _, converged, _, survCc, survLocal,
      divergence, policy) = CrossModalQueries.tierAudit(spark, "zz", pairs, 5L)
    assert(tier == "zz" && gauged == 5L && nPairs == 4L && docsIn == 5L)
    assert(converged == 0L, "5-chain converged within 3 rounds?")
    assert(policy == "pair_local", "non-convergence must force pair_local")
    assert(survLocal == 3L, s"pair-local survivors $survLocal != 3")
    // Even at the bounded horizon the probe has already found the chain
    // interior: labels after 3 rounds are below their ids for all of
    // {2,3,4,5}, so the divergence reads 2 (the interior size).
    assert(survCc == 1L && divergence == 2L)
  }

  test("q296 fixture: a triangle converges, diverges nowhere, and recommends cc") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val (_, _, _, _, nGroups, converged, alpha, survCc, survLocal, div,
      policy) = CrossModalQueries.tierAudit(spark, "tri", tri, 3L)
    assert(converged == 1L && nGroups == 1L)
    assert(survCc == 1L && survLocal == 1L && div == 0L)
    // One cluster ⇒ k_eff = 0 ⇒ the Hill sum is empty ⇒ α̂ undefined ⇒
    // the α branch cannot fire and the converged probe recommends cc.
    assert(alpha.isEmpty && policy == "cc")
  }

  test("q296 on the corpus: laws hold row-wise and match the registered tiers") {
    val rows = run("q296_dedup_policy_audit").collect()
    assert(rows.length == 4, "expected one row per tier")
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("audio", "image", "text", "video"))
    rows.foreach { r =>
      val (gauged, inPairs, groups) = (r.getLong(1), r.getLong(3), r.getLong(4))
      val (conv, survCc, survLocal, div) =
        (r.getLong(5), r.getLong(7), r.getLong(8), r.getLong(9))
      assert(inPairs <= gauged && groups <= inPairs)
      // Bounded-CC losers ⊇ pair-local losers, always.
      assert(survCc <= survLocal && div == survLocal - survCc)
      val alpha = if (r.isNullAt(6)) None else Some(r.getDouble(6))
      val expected =
        if (conv == 0L || alpha.exists(_ <= 2.0)) "pair_local" else "cc"
      assert(r.getString(10) == expected,
        s"${r.getString(0)}: policy != documented rule")
    }
    // The per-tier pair counts are the registered tiers' own counts.
    val byTier = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byTier("image") == MediaQueries.imagePairs(spark, sf).count())
    assert(byTier("audio") == MediaQueries.audioPairs(spark, sf).count())
    assert(byTier("video") == MediaQueries.videoPairsBanded(spark, sf).count())
    assert(byTier("text") ==
      PipelineQueries.bandedVerifiedPairs(spark, sf).count())
  }

  test("q299: check rows mirror q296's recommendations against the manifest wiring") {
    val audit = run("q296_dedup_policy_audit").collect()
      .map(r => r.getString(0) -> r.getString(10)).toMap
    val rows = run("q299_policy_manifest_check").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("audio", "image", "text", "video"))
    // What q293 actually wires (see CrossModalQueries.ManifestPolicy):
    // text rides the keep-best CLUSTER election, media tiers pair-local.
    val wired = Map("text" -> "cc", "image" -> "pair_local",
      "audio" -> "pair_local", "video" -> "pair_local")
    rows.foreach { r =>
      val tier = r.getString(0)
      assert(r.getString(1) == wired(tier), s"$tier: manifest_policy drifted")
      assert(r.getString(2) == audit(tier),
        s"$tier: recommended_policy != q296's recommendation")
      val consistent = r.getBoolean(5)
      assert(consistent ==
        !(r.getString(1) == "cc" && r.getString(2) == "pair_local"),
        s"$tier: consistent flag != documented rule")
      // The query itself require()-fails on the dangerous quadrant, so
      // reaching here means every row is consistent.
      assert(consistent, s"$tier: inconsistent row surfaced without error")
    }
  }
}

package graft.text

import graft.SparkSpec

/** Semantic pins for q260_bpe_phrase_1k (the ≥1k-merge phrase-BPE
  * trainer). Hash-level engine/oracle parity lives in the DuckDB
  * recursive-CTE oracle; these tests pin the claims the query makes:
  * the merge count target, the adaptive stop, and the batch-safety
  * invariant (pairwise non-interference within a round) that makes
  * round-start counts exact at application time.
  */
class PhraseBpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val traj = graft.Queries.all
    .find(_.name == "q260_bpe_phrase_1k").get.run(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("learns at least 1024 merges, stopping exactly when the target is crossed") {
    assert(traj.length >= 1024, s"only ${traj.length} merges learned")
    val lastRound = traj.map(_._1).max
    val beforeLast = traj.count(_._1 < lastRound)
    assert(beforeLast < 1024,
      "loop ran a round after the target was already met (adaptive stop broken)")
  }

  test("rounds and batch indices are contiguous") {
    val rounds = traj.map(_._1).distinct.sorted
    assert(rounds.sameElements(1L to rounds.max),
      "round numbering has gaps — a round accepted nothing but continued")
    rounds.foreach { r =>
      val bks = traj.filter(_._1 == r).map(_._2).sorted
      assert(bks.sameElements(1L to bks.max), s"round $r bk gap")
    }
  }

  test("every round's batch is pairwise non-interfering (shared or created symbols)") {
    traj.groupBy(_._1).foreach { case (r, ms) =>
      val batch = ms.sortBy(_._2).map(m => (m._3, m._4))
      for (i <- batch.indices; j <- 0 until i) {
        val (pl, pr) = batch(i); val (ql, qr) = batch(j)
        val interferes = ql == pl || ql == pr || qr == pl || qr == pr ||
          (ql + qr) == pl || (ql + qr) == pr ||
          (pl + pr) == ql || (pl + pr) == qr
        assert(!interferes,
          s"round $r: merges ($ql,$qr) and ($pl,$pr) interfere — batch invariant broken")
      }
    }
  }

  test("counts are positive and weakly credible (a merge's count fits the corpus)") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    val maxTokens = 4096L * nDocs
    traj.foreach { case (r, bk, l, rr, c) =>
      assert(c >= 1, s"round $r bk $bk: non-positive count")
      assert(c <= maxTokens, s"round $r bk $bk: count $c exceeds corpus bound")
    }
  }
}

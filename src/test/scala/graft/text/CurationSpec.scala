package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the round-8 curation queries: q212 SemDeDup
  * (Abbas et al. 2023) and q213 DSIR importance weights (Xie et al.
  * 2023). The hash-level parity lives in the DuckDB oracle; these
  * specs pin the SEMANTIC contract on the sf0.001 corpus.
  */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.Queries.all.find(_.name == name).get.run(spark, sf)

  test("q212: partition of the corpus — every vector once, flag is 0/1") {
    val out = q("q212_semdedup").cache()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    val flags = out.select("is_dup").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flags.subsetOf(Set(0L, 1L)))
    out.unpersist()
  }

  test("q212: every dup has a same-cluster survivor — dedup never empties a cluster") {
    val out = q("q212_semdedup").cache()
    val perCluster = out.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("is_dup")).as("d"))
      .collect()
    perCluster.foreach { r =>
      assert(r.getLong(2) < r.getLong(1),
        s"cluster ${r.get(0)}: all ${r.getLong(1)} members marked dup")
    }
    out.unpersist()
  }

  test("q213: weights rank target-like docs above the rest") {
    val w = q("q213_dsir_weights")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "lang")
    val byLang = w.join(docs, "doc_id")
      .groupBy(col("lang") === "en").agg(avg("weight"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // DSIR's whole point: docs drawn from the target slice score higher
    // on average than the rest of the raw corpus.
    assert(byLang(true) > byLang(false),
      s"en avg ${byLang(true)} should exceed non-en avg ${byLang(false)}")
  }

  test("q213: every doc with >=1 token is scored, weights are finite") {
    val w = q("q213_dsir_weights").cache()
    val expected = graft.Tables.documents(spark, sf)
      .filter(size(TextOps.tokens(col("text"))) >= 1).count()
    assert(w.count() == expected)
    assert(w.filter(col("weight").isNull || isnan(col("weight"))).count() == 0)
    w.unpersist()
  }

  test("q214: partition of the corpus, flags 0/1, no bucket emptied") {
    val out = q("q214_semdedup_lsh").cache()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    val flags = out.select("is_dup").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flags.subsetOf(Set(0L, 1L)))
    out.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("is_dup")).as("d"))
      .collect().foreach { r =>
        assert(r.getLong(2) < r.getLong(1),
          s"bucket ${r.get(0)}: all ${r.getLong(1)} members marked dup")
      }
    out.unpersist()
  }

  test("q214: P(N) holds expected bucket size ~32 as N grows") {
    import graft.PipelineQueries.semPlanes
    // 2^P >= N/32 (bucket size bounded) without overshooting by more
    // than one doubling (buckets don't degenerate to singletons).
    Seq(100L, 2000L, 64000L, 1000000L, 100000000L).foreach { n =>
      val p = semPlanes(n)
      assert((1L << p) * 32 >= n, s"N=$n P=$p: buckets too big")
      assert(p == 1 || (1L << (p - 1)) * 32 < n, s"N=$n P=$p: overshoot")
    }
    // Monotone: more data never means fewer planes.
    val ps = Seq(10L, 100L, 1000L, 10000L, 100000L).map(semPlanes)
    assert(ps == ps.sorted)
  }

  test("q215: NB scores separate the training classes") {
    val w = q("q215_nb_quality").cache()
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "source")
    val bySrc = w.join(docs, "doc_id")
      .groupBy(col("source") === "src0").agg(avg("nb_score"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // The model is trained with src0 as the positive class; its own
    // training docs must average a higher log-odds score.
    assert(bySrc(true) > bySrc(false),
      s"src0 avg ${bySrc(true)} should exceed rest avg ${bySrc(false)}")
    assert(w.filter(col("nb_score").isNull || isnan(col("nb_score"))).count() == 0)
    w.unpersist()
  }

  test("q216: top-25 PMI pairs are real adjacent bigrams above the floor") {
    val out = q("q216_pmi_collocations").cache()
    assert(out.count() <= 25)
    assert(out.filter(col("c12") < 5).count() == 0)
    // Non-increasing PMI in the returned order (orderBy is part of the
    // contract; re-sorting here would mask a broken ORDER BY).
    val pmis = out.collect().map(_.getAs[Double]("pmi")).toSeq
    assert(pmis == pmis.sorted.reverse, "pmi not non-increasing")
    // Every returned pair occurs adjacently in the corpus.
    val toks = graft.Tables.documents(spark, sf)
      .select(TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bigrams = toks.select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', element_at(toks, i), " +
          "'w2', element_at(toks, i + 1)))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2")).distinct()
    assert(out.join(bigrams, Seq("w1", "w2"), "left_anti").count() == 0,
      "returned pair never occurs adjacently in the corpus")
    out.unpersist()
  }

  test("q217: kept set is the maximal hash-priority prefix per source") {
    val out = q("q217_token_budget_sample").cache()
    // Within budget, and each source's cum actually tracks its own
    // ordered token sums (prefix-sum consistency).
    assert(out.filter(col("cum") > 500).count() == 0)
    val perSrc = out.groupBy("source")
      .agg(sum("n_tokens").as("tok_sum"), max("cum").as("cum_max"))
      .collect()
    perSrc.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"source ${r.getString(0)}: token sum ${r.getLong(1)} != max cum ${r.getLong(2)}"))
    // Maximality AND exactness: recompute the kept set independently
    // (same priority order, same prefix sum) and require `out` to equal
    // it row-for-row — an under-filled budget (e.g. cutting at 400) or
    // an extra row both fail the two anti-joins.
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.md5Hash60(concat(lit("budget:"),
          col("doc_id").cast("string"))).as("pri"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("pri"), col("doc_id"))
    val expected = docs
      .withColumn("cum", sum(col("n_tokens"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("cum") <= 500)
      .select("source", "doc_id", "n_tokens", "cum")
    assert(expected.count() > 0, "recomputed kept set is empty — vacuous test")
    assert(out.join(expected, Seq("source", "doc_id", "n_tokens", "cum"),
      "left_anti").count() == 0, "query kept a row the recomputed set excludes")
    assert(expected.join(out, Seq("source", "doc_id", "n_tokens", "cum"),
      "left_anti").count() == 0, "query dropped a row the recomputed set keeps")
    out.unpersist()
  }

  test("q218: per-source diversity ratios are consistent exact counts") {
    val out = q("q218_ngram_diversity").cache()
    // Exactly the sources that have at least one >=3-token doc.
    val srcs = graft.Tables.documents(spark, sf)
      .filter(size(TextOps.tokens(col("text"))) >= 3)
      .select("source").distinct().count()
    assert(out.count() == srcs)
    out.collect().foreach { r =>
      val total = r.getAs[Long]("total_ngrams")
      val distinct = r.getAs[Long]("distinct_ngrams")
      val ttr = r.getAs[Double]("ttr")
      val top = r.getAs[Double]("top_share")
      assert(total >= distinct && distinct > 0)
      assert(ttr > 0 && ttr <= 1.0 + 1e-9)
      assert(top > 0 && top <= 1.0 + 1e-9)
      // ttr is the rounded quotient of the two exact counts it sits next to.
      assert(math.abs(ttr - distinct.toDouble / total.toDouble) < 1e-5)
    }
    // Independent recount for one source: shingle count equals
    // sum over docs of max(0, n_tokens - 2).
    val expected = graft.Tables.documents(spark, sf)
      .select(col("source"), size(TextOps.tokens(col("text"))).as("nt"))
      .filter(col("nt") >= 3)
      .groupBy("source").agg(sum(col("nt") - 2).as("tot"))
    val joined = out.join(expected, "source")
      .filter(col("total_ngrams") =!= col("tot")).count()
    assert(joined == 0, "total_ngrams != sum(n_tokens - 2)")
    out.unpersist()
  }

  test("q219: kept set is the maximal QUALITY-ordered prefix per source") {
    val out = q("q219_quality_budget_sample").cache()
    assert(out.filter(col("cum") > 600).count() == 0)
    // Quality ordering: within a source, every kept doc's score is >= any
    // dropped doc's score (ties broken by doc_id, so allow equality).
    val kept = out.groupBy("source").agg(
      min("nb_score").as("min_kept"), sum("n_tokens").as("tok_sum"),
      max("cum").as("cum_max"))
    kept.collect().foreach { r =>
      assert(r.getAs[Long]("tok_sum") == r.getAs[Long]("cum_max"),
        s"source ${r.getAs[String]("source")}: prefix-sum inconsistency")
    }
    val dropped = graft.Tables.documents(spark, sf).select("doc_id", "source")
      .join(out.select("doc_id"), Seq("doc_id"), "left_anti")
    // Recompute every doc's score independently through the registered
    // q215 output (same quantized scoring) and check the order property.
    val scores = q("q215_nb_quality").select(col("doc_id"), col("nb_score"))
    val dmax = dropped.join(scores, "doc_id")
      .groupBy("source").agg(max("nb_score").as("max_dropped"))
    // 1e-5 slack: the displayed scores are rounded at 6 dp while the
    // ordering used the exact BIGINT key, so a dropped doc can appear
    // up to ~1e-6 above a kept doc without violating the exact order.
    val bad = kept.join(dmax, "source")
      .filter(col("max_dropped") > col("min_kept") + 1e-5).count()
    assert(bad == 0, "a dropped doc outscores a kept doc in the same source")
    out.unpersist()
  }

  test("q221: BPE training — step-1 argmax is the true char bigram max, counts non-increase") {
    val out = q("q221_bpe_train").cache()
    val rows = out.orderBy("step").collect()
    // Contiguous steps from 1; 32 on this corpus (BpeSteps) — fewer only
    // if a degenerate corpus exhausts its symbol pairs (the engine's
    // early-exit mirrors the oracle's empty-b_i degradation).
    val steps = rows.map(_.getAs[Long]("step")).toSeq
    assert(steps == (1L to steps.size.toLong))
    assert(steps.size == 32, s"expected BpeSteps=32 merges, got ${steps.size}")
    // BPE property: each step's best-pair count can never exceed the
    // previous step's (new pairs created by a merge are bounded by the
    // merged pair's own occurrence count).
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse, s"counts increase: $cnts")
    // Independent recount of step 1: weighted char-bigram frequencies
    // over the alphanumeric word types.
    val words = graft.Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[A-Za-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(length(col("w")) >= 2)
    val big = words.select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), " +
          "i -> named_struct('l', substring(w, i, 1), " +
          "'r', substring(w, i + 1, 1)))")).as("p"))
      .groupBy("p.l", "p.r").agg(sum("freq").as("cnt"))
      .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()(0)
    assert(rows(0).getAs[String]("lhs") == big.getString(0) &&
      rows(0).getAs[String]("rhs") == big.getString(1) &&
      rows(0).getAs[Long]("cnt") == big.getLong(2),
      s"step-1 merge ${rows(0)} != independent argmax $big")
    // Deterministic across runs.
    val again = q("q221_bpe_train")
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("q222: BPE apply — fertility bounded by [1, chars/word], merges reduce subwords") {
    val out = q("q222_bpe_apply").cache()
    // Every doc with >=1 alphanumeric word appears exactly once.
    val expected = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[A-Za-z0-9]+$"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ew"), sum(length(col("w"))).as("echars"))
    assert(out.count() == expected.count())
    val j = out.join(expected, "doc_id").cache()
    assert(j.filter(col("n_words") =!= col("ew")).count() == 0)
    // 1 <= subwords-per-word; subwords <= total chars (merging only
    // shrinks the initial one-symbol-per-char segmentation).
    assert(j.filter(col("n_subwords") < col("n_words")).count() == 0)
    assert(j.filter(col("n_subwords") > col("echars")).count() == 0)
    // The 4 merges actually fire somewhere: total subwords < total chars.
    val tot = j.agg(sum("n_subwords"), sum("echars")).collect()(0)
    assert(tot.getLong(0) < tot.getLong(1), "no merge ever applied")
    j.unpersist(); out.unpersist()
  }

  test("q276: fertility audit — per-source mass conserved, metrics bounded and self-consistent") {
    val out = q("q276_bpe_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // Every source with ≥1 alphanumeric word appears exactly once, and
    // the per-source word/char masses match an independent recount.
    val expected = graft.Tables.documents(spark, sf)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[A-Za-z0-9]+$"))
      .groupBy("source")
      .agg(count(lit(1)).as("ew"), sum(length(col("w"))).as("ec"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.map(_._1).toSet == expected.keySet, "source set mismatch")
    out.foreach { case (src, nw, nc, ns, fert, cps, cont) =>
      val (ew, ec) = expected(src)
      assert(nw == ew && nc == ec, s"$src: word/char mass != recount")
      // Segmentation bounds: every word is 1..len(word) subwords.
      assert(ns >= nw && ns <= nc, s"$src: n_subwords $ns outside [words, chars]")
      assert(approx(fert, math.floor(ns.toDouble / nw * 1e6 + 0.5) / 1e6, 1e-9))
      assert(approx(cps, math.floor(nc.toDouble / ns * 1e6 + 0.5) / 1e6, 1e-9))
      assert(cont >= 0.0 && cont <= 1.0)
      // fertility == 1 exactly when nothing was ever continued.
      assert((ns == nw) == (cont == 0.0),
        s"$src: fertility/continued-rate inconsistent ($ns/$nw vs $cont)")
    }
  }

  test("q223: LSH dedup eval — counts consistent, ratios in [0,1], tp bounded") {
    val out = q("q223_lsh_dedup_eval").collect()
    assert(out.length == 1)
    val r = out(0)
    val (nc, nt, tp) = (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_true"),
      r.getAs[Long]("tp"))
    assert(tp <= nc && tp <= nt, s"tp $tp exceeds a side ($nc, $nt)")
    val (p, rec) = (r.getAs[Double]("prec"), r.getAs[Double]("rec"))
    assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1)
    assert(math.abs(p - (if (nc == 0) 0.0 else tp.toDouble / nc)) < 1e-5)
    assert(math.abs(rec - (if (nt == 0) 0.0 else tp.toDouble / nt)) < 1e-5)
    // The banded tier must actually be useful on this corpus: it should
    // recover most true pairs (recall well above chance).
    assert(nt == 0 || rec >= 0.5, s"LSH recall $rec collapsed")
  }

  test("q220: at most 8 per bucket, contiguous ranks, deterministic") {
    val out = q("q220_cluster_sample").cache()
    val per = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
      .collect()
    per.foreach { r =>
      assert(r.getAs[Long]("n") <= 8)
      assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx") == r.getAs[Long]("n"),
        s"bucket ${r.get(0)}: ranks not contiguous from 1")
    }
    assert(out.select("vec_id").distinct().count() == out.count())
    // Deterministic: a second run is row-identical.
    val again = q("q220_cluster_sample")
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("q225: redaction is complete — no PII pattern survives, counts match") {
    val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val ipRe = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
    val phoneRe = """\+\d{1,2}-\d{3}-\d{4}"""
    val out = q("q225_pii_redact").cache()
    assert(out.count() == graft.Tables.documents(spark, sf).count())
    // Every augmented row carried exactly one of each PII kind by
    // construction, and the output must account for all of them.
    assert(out.filter(col("n_email") =!= 1 || col("n_ip") =!= 1 ||
      col("n_phone") =!= 1).count() == 0)
    // The scrub is total: re-running the matchers on the redacted text
    // finds nothing, and every placeholder token is present.
    val leftover = out.filter(
      regexp_count(col("redacted"), lit(emailRe)) > 0 ||
        regexp_count(col("redacted"), lit(ipRe)) > 0 ||
        regexp_count(col("redacted"), lit(phoneRe)) > 0)
    assert(leftover.count() == 0, "PII pattern survived redaction")
    assert(out.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<IP>") ||
      !col("redacted").contains("<PHONE>")).count() == 0)
    out.unpersist()
  }

  test("q226: manifest partitions the corpus; split is a pure function of doc_id") {
    val out = q("q226_split_manifest").cache()
    val totalDocs = graft.Tables.documents(spark, sf).count()
    val agg = out.agg(sum("n_docs"), sum("sum_chars")).collect()(0)
    assert(agg.getLong(0) == totalDocs, "split manifest lost/duplicated docs")
    val charSum = graft.Tables.documents(spark, sf)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    assert(agg.getLong(1) == charSum)
    val splits = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // 90/5/5 hash buckets: train must dominate (loose bound — the
    // sf0.001 corpus is small, so allow wide sampling noise).
    val byt = out.groupBy("split").agg(sum("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byt.getOrElse("train", 0L).toDouble / totalDocs > 0.6,
      s"train share ${byt.getOrElse("train", 0L)}/$totalDocs below 0.6")
    // Pure function of doc_id: a second run is row-identical.
    val again = q("q226_split_manifest")
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("q227: shared counts equal rare-fingerprint set intersections, scores valid") {
    val out = q("q227_winnow_pairs").cache()
    assert(out.count() > 0)
    assert(out.filter(col("doc_a") >= col("doc_b") || col("shared") < 2 ||
      col("score") <= 0 || col("score") > 1).count() == 0)
    // Recompute the rare-fp sets independently and check every emitted
    // pair's shared count and Jaccard score against set arithmetic.
    val fps = TextOps.winnowingFingerprints(
      graft.Tables.documents(spark, sf), "doc_id", "text", k = 4, w = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dfc = fps.groupBy(_._2).view.mapValues(_.length).toMap
    val rare = fps.filter(p => dfc(p._2) <= 64)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (rare(a), rare(b))
      val inter = (sa & sb).size
      assert(r.getLong(2) == inter, s"pair ($a,$b) shared ${r.getLong(2)} != $inter")
      val jac = inter.toDouble / (sa.size + sb.size - inter)
      assert(math.abs(r.getDouble(3) - jac) < 1e-5)
    }
    out.unpersist()
  }

  test("q224: sampled eval = q223's definition on exactly the hash-predicate subset") {
    val out = q("q224_lsh_eval_sampled").collect()(0)
    val (nc, nt, tp) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(tp <= nc && tp <= nt)
    assert(out.getDouble(3) >= 0 && out.getDouble(3) <= 1)
    assert(out.getDouble(4) >= 0 && out.getDouble(4) <= 1)
    // The sample is the multiplicative-hash predicate, nothing else:
    // re-derive the kept doc set and check the candidate tier on it
    // yields exactly n_candidates pairs.
    import graft.text.Dedup
    val sdocs = graft.Tables.documents(spark, sf)
      .filter(graft.Hashing.hash32(col("doc_id")) < lit(2147483648L))
    val cand = Dedup.minhashLshPairs(sdocs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 4).count()
    assert(cand == nc, s"sampled candidate count $cand != reported $nc")
  }

  test("q231: temperature weights re-derive from raw counts; boost direction correct") {
    val out = q("q231_source_temperature").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out.nonEmpty)
    // Independent re-derivation: whitespace token counts per source,
    // quantized sqrt weights, order-free integer sums.
    val counts = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r =>
        r.getString(1).split("\\s+").count(_.nonEmpty).toLong).sum).toMap
    val totN = counts.values.sum
    val sq = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong).toMap
    val totS = sq.values.sum
    counts.foreach { case (src, n) =>
      val (gotN, p, qv, boost) = out(src)
      assert(gotN == n, s"$src tokens $gotN != $n")
      assert(math.abs(p - n.toDouble / totN) < 1e-5)
      assert(math.abs(qv - sq(src).toDouble / totS) < 1e-5)
      assert(math.abs(boost - (sq(src).toDouble / totS) / (n.toDouble / totN)) < 1e-4)
      // α = 1/2 tempering: boost crosses 1 exactly at n* = (N/Σ√n)² —
      // smaller sources up-weighted, larger damped.
      val nStar = math.pow(totN.toDouble / totS * 1e6, 2)
      if (n < nStar * 0.999) assert(boost > 1.0, s"$src n=$n nStar=$nStar")
      if (n > nStar * 1.001) assert(boost < 1.0, s"$src n=$n nStar=$nStar")
    }
    // boost is strictly decreasing in source size.
    val byN = out.values.toSeq.sortBy(_._1)
    byN.sliding(2).foreach {
      case Seq((n1, _, _, b1), (n2, _, _, b2)) =>
        if (n1 < n2) assert(b1 >= b2 - 1e-9, s"boost not decreasing: $n1/$b1 vs $n2/$b2")
      case _ =>
    }
    // Tempered shares still sum to ~1.
    val qsum = out.values.map(_._3).sum
    assert(math.abs(qsum - 1.0) < 1e-4, s"sum(q) = $qsum")
  }

  test("q232: effective-token accounting agrees with q125's survivor set") {
    val out = q("q232_effective_tokens").cache()
    val kept = q("q125_dedup_apply").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").count(_.nonEmpty).toLong))
    val bySrc = docs.groupBy(_._2)
    out.collect().foreach { r =>
      val (src, nd, nt, kd, kt, ratio) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      val rows = bySrc(src)
      assert(nd == rows.length && nt == rows.map(_._3).sum)
      val keptRows = rows.filter(x => kept(x._1))
      assert(kd == keptRows.length, s"$src kept_docs $kd != ${keptRows.length}")
      assert(kt == keptRows.map(_._3).sum)
      assert(kt <= nt && kd <= nd)
      assert(math.abs(ratio - kt.toDouble / nt) < 1e-5)
    }
    out.unpersist()
  }

  test("q233: mix schedule re-derives from raw counts; budget and cap laws hold") {
    val out = q("q233_mix_schedule").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getLong(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)
    val counts = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r =>
        r.getString(1).split("\\s+").count(_.nonEmpty).toLong).sum).toMap
    val totN = counts.values.sum
    val sq = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong).toMap
    val totS = sq.values.sum
    counts.foreach { case (src, n) =>
      val (gotN, target, epochs, capped, eff, epochsEff) = out(src)
      assert(gotN == n)
      val expTarget =
        math.floor(3.0 * totN.toDouble * (sq(src).toDouble / totS)).toLong
      assert(target == expTarget, s"$src target $target != $expTarget")
      assert(math.abs(epochs - target.toDouble / n) < 1e-5)
      assert(capped == (if (target > 4L * n) 1 else 0))
      assert(eff == math.min(target, 4L * n))
      assert(math.abs(epochsEff - eff.toDouble / n) < 1e-5)
      assert(epochsEff <= 4.0 + 1e-9, s"$src epochs_eff $epochsEff > cap")
      assert(eff <= target)
    }
    // The per-source floors lose < 1 token each: Σ target ∈ (T - #src, T].
    val t = 3L * totN
    val sumTarget = out.values.map(_._2).sum
    assert(sumTarget <= t && sumTarget > t - out.size,
      s"sum(target) $sumTarget vs budget $t")
    // Tempering + a uniform budget can only cap SMALL sources (boost > 1
    // is the up-weighted side): every capped source must be smaller than
    // every uncapped one.
    val cappedMax = out.values.filter(_._4 == 1).map(_._1)
    val uncappedMin = out.values.filter(_._4 == 0).map(_._1)
    if (cappedMax.nonEmpty && uncappedMin.nonEmpty)
      assert(cappedMax.max < uncappedMin.min)
  }

  test("q230: batched BPE trajectory equals an independent driver simulation") {
    val out = q("q230_bpe_batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(out.nonEmpty)
    // Structural batch invariants straight off the output: contiguous bk
    // from 1 per round, counts non-increasing with bk, and no two
    // accepted pairs in one round interfering (shared symbol or a
    // symbol a higher merge creates).
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.size.toLong))
      assert(sorted.map(_._5) == sorted.map(_._5).sorted.reverse)
      for (i <- sorted.indices; j <- 0 until i) {
        val (p, q) = (sorted(i), sorted(j))
        val clash = q._3 == p._3 || q._3 == p._4 || q._4 == p._3 ||
          q._4 == p._4 || (q._3 + q._4) == p._3 || (q._3 + q._4) == p._4
        assert(!clash, s"round ${p._1}: batch members $q / $p interfere")
      }
    }
    // Full-trajectory ground truth: simulate the batched trainer in
    // plain Scala from the raw corpus (whitespace tokens, full-match
    // alphanumeric filter — TextOps.tokens semantics; pair counts over
    // ALL adjacent positions; leftmost non-overlapping merge passes in
    // bk order — `replace` semantics).
    val freq = graft.Tables.documents(spark, sf).select("text").collect()
      .iterator.flatMap(_.getString(0).split("\\s+"))
      .filter(w => w.nonEmpty && w.forall(_.isLetterOrDigit) &&
        w.forall(c => c.toInt < 128))
      .foldLeft(Map.empty[String, Long])((m, w) => m.updated(w, m.getOrElse(w, 0L) + 1))
    var enc: Map[Vector[String], Long] = freq.map { case (w, f) =>
      w.map(_.toString).toVector -> f
    }
    def mergeOnce(s: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    val sim = scala.collection.mutable.ArrayBuffer[(Long, Long, String, String, Long)]()
    var round = 0L
    var done = false
    while (round < 32 && !done) {
      round += 1
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      enc.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val cand = counts.toSeq.map { case ((l, r), c) => (l, r, c) }
          .sortBy(t => (-t._3, t._1, t._2)).take(64)
        val acc = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        for (i <- cand.indices if acc.size < 16) {
          val (l, r, c) = cand(i)
          val clash = cand.take(i).exists { case (ql, qr, _) =>
            ql == l || ql == r || qr == l || qr == r ||
              (ql + qr) == l || (ql + qr) == r
          }
          if (!clash) acc += ((l, r, c))
        }
        acc.zipWithIndex.foreach { case ((l, r, c), j) =>
          sim += ((round, (j + 1).toLong, l, r, c))
        }
        acc.foreach { case (l, r, _) =>
          enc = enc.toSeq.map { case (s, f) => mergeOnce(s, l, r) -> f }
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        }
      }
    }
    assert(out == sim.toSeq,
      s"trajectory mismatch: engine ${out.size} rows vs sim ${sim.size}")
    // Exhaustion: on this corpus the trainer reaches full merge closure
    // (every word type a single symbol) before the 32-round capacity.
    assert(enc.keys.forall(_.length == 1), "simulation did not reach closure")
  }

  test("q229: budget sample = count-derived threshold; coincides with q224 at N=500") {
    val out = q("q229_dedup_eval_budget").collect()(0)
    val (nd, nc, nt, tp) =
      (out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
    assert(tp <= nc && tp <= nt)
    assert(out.getDouble(4) >= 0 && out.getDouble(4) <= 1)
    assert(out.getDouble(5) >= 0 && out.getDouble(5) <= 1)
    // The sample is exactly the count-derived hash threshold: re-derive
    // the kept set driver-side and compare the audit count.
    val ids = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val n = ids.length.toLong
    val thr = math.floor(250.0 * 4294967296.0 / n.toDouble)
    val kept = ids.count(id => graft.Hashing.jvmHash32(id) < thr)
    assert(nd.toInt == kept, s"n_docs $nd != re-derived kept-set size $kept")
    // Budget property: expected kept ≈ 250 (uniform hash; loose band).
    assert(nd >= 125 && nd <= 400, s"n_docs $nd far from budget 250")
    // Continuity: at N = 500 the threshold floor(250·2^32/500) = 2^31 is
    // exactly q224's rate-1/2 cut, so both evals see the same sample.
    if (n == 500L) {
      val q224row = q("q224_lsh_eval_sampled").collect()(0)
      assert(nc == q224row.getLong(0) && nt == q224row.getLong(1) &&
        tp == q224row.getLong(2))
    }
  }

  test("q228: leakage report partitions q52's pairs; labels match the q226 split") {
    val out = q("q228_split_leakage").cache()
    val totalPairs = q("q52_minhash_pairs").count()
    assert(out.agg(sum("n_pairs")).collect()(0).getLong(0) == totalPairs,
      "split-pair counts must partition the candidate-pair set")
    val splits = Set("train", "val", "test")
    out.collect().foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      assert(splits(lo) && splits(hi) && lo <= hi)
      assert(r.getInt(3) == (if (lo != hi) 1 else 0))
    }
    // Label ground truth: every pair's splits come from the same hash
    // formula q226 assigns docs with.
    def splitOf(id: Long): String = {
      val b = math.floor(graft.Hashing.jvmHash32(id) / 42949672.96)
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val pairs = q("q52_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.view.mapValues(_.length.toLong).toMap
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    out.unpersist()
  }

  test("q234: snake sharding — exact assignment, count balance, token balance") {
    val out = q("q234_shard_manifest").cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == n, "manifest must cover every doc once")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._3 >= 0 && r._3 < 16))
    // Rank-level ground truth: the snake fold recomputed locally from
    // the (n_tokens DESC, doc_id) order.
    val expected = rows.sortBy(r => (-r._2, r._1)).zipWithIndex.map {
      case ((id, _, _), rk) =>
        val pos = rk % 16
        id -> (if ((rk / 16) % 2 == 0) pos.toLong else 15L - pos)
    }.toMap
    rows.foreach { case (id, _, shard) =>
      assert(shard == expected(id), s"doc $id: shard $shard != ${expected(id)}")
    }
    // Balance laws: doc counts differ by <= 1 across shards; token
    // totals differ by at most 2x the largest document (the folded
    // round-robin bound — each pass pair gives every shard one long and
    // one short pick).
    val byShard = rows.groupBy(_._3).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum)).toMap
    assert(byShard.size == 16 || n < 16)
    val counts = byShard.values.map(_._1)
    assert(counts.max - counts.min <= 1)
    val toks = byShard.values.map(_._2)
    val maxDoc = rows.map(_._2).max
    assert(toks.max - toks.min <= 2 * maxDoc,
      s"token imbalance ${toks.max - toks.min} > 2 * max doc $maxDoc")
    out.unpersist()
  }

  test("q235: histogram mass equals the corpus; sizes >= 2 agree with q107") {
    val out = q("q235_dup_prevalence").cache()
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == n,
      "every document must sit at exactly one duplication level")
    out.collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getLong(0) >= 1 && r.getLong(1) >= 1)
    }
    // Levels >= 2 must be exactly q107's cluster-size distribution.
    val fromQ107 = q("q107_dedup_clusters")
      .groupBy("cluster").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.collect().filter(_.getLong(0) >= 2)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == fromQ107)
    out.unpersist()
  }

  test("q236: fixed-budget query set; hits bounded by k; recall consistent") {
    val out = q("q236_ann_recall").cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Expected ~64 queries of 500 vectors; the hash sample's spread is
    // binomial — accept a generous band.
    assert(rows.length >= 30 && rows.length <= 110,
      s"query budget drifted: ${rows.length} queries")
    rows.foreach { case (_, hits, rec) =>
      assert(hits >= 0 && hits <= 10)
      assert(math.abs(rec - hits / 10.0) < 1e-9)
    }
    // The LSH tier must find SOMETHING — all-zero recall means the
    // bucket join or the truth tier is broken, not that recall is low.
    assert(rows.map(_._2).sum > 0, "LSH recall identically zero")
    out.unpersist()
  }

  test("q237: pos set = q52 candidates ∩ q42 truth; hard negatives under the bar") {
    val out = q("q237_contrastive_pairs").cache()
    val rows = out.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getString(3)))
    rows.foreach { case (_, j, label) =>
      if (label == "pos") assert(j >= 0.5)
      else { assert(label == "hard_neg"); assert(j < 0.2) }
    }
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate pairs")
    val pos = rows.filter(_._3 == "pos").map(_._1).toSet
    val cand = q("q52_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = q("q42_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos == (cand intersect truth),
      "positives must be exactly the candidate ∩ near-dup-truth set")
    assert(rows.map(_._1).toSet.subsetOf(cand), "every pair must be a candidate")
    out.unpersist()
  }

  test("q238: every epoch replays q234's shard content in a different, gapless order") {
    val out = q("q238_epoch_order").cache()
    val manifest = q("q234_shard_manifest").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == manifest.size * 4)
    rows.foreach { case (_, shard, doc, _) =>
      assert(manifest(doc) == shard, s"doc $doc moved shard between queries")
    }
    // ord is 1..n contiguous within each (epoch, shard).
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq)
    }
    // Epochs shuffle: epoch 0 and epoch 1 must order at least one shard
    // differently (identical orders would mean the salt is dead).
    val byEpoch = rows.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._2, r._4)).map(_._3).toSeq).toMap
    assert(byEpoch(0L) != byEpoch(1L), "epoch salt changes nothing")
    out.unpersist()
  }

  test("q239: banded-tier accounting — totals match q232, keepers match a local union-find over q237's pos set") {
    val out = q("q239_effective_tokens_banded").cache()
    val viaSimhash = q("q232_effective_tokens").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.collect().foreach { r =>
      val (docs, toks) = viaSimhash(r.getString(0))
      assert(r.getLong(1) == docs && r.getLong(2) == toks,
        "before-columns must agree across tiers (same corpus)")
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(2))
    }
    // Keeper ground truth: union-find over q237's VERIFIED positives —
    // the drift-proof link between the accounting and the mining tier.
    val pairs = q("q237_contrastive_pairs").collect()
      .filter(_.getString(3) == "pos")
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expectedKept = docs.filter { case (id, _) =>
      !clustered(id) || find(id) == id
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val gotKept = out.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(gotKept == expectedKept,
      s"keeper counts diverge from the union-find ground truth")
    out.unpersist()
  }

  test("q240: banded histogram mass equals the corpus; sizes match the q237-pos union-find") {
    val out = q("q240_dup_prevalence_banded").cache()
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == n)
    // Cluster sizes from a union-find over q237's verified positives.
    val pairs = q("q237_contrastive_pairs").collect()
      .filter(_.getString(3) == "pos")
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = members.groupBy(find).view.mapValues(_.length.toLong)
      .values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = out.collect().filter(_.getLong(0) >= 2)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      "cluster-size histogram diverges from the union-find ground truth")
    out.unpersist()
  }

  test("q245: verdict law holds from the output's own integers; pins to q239") {
    val out = q("q245_source_blocklist").cache()
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == n)
    // The 0/1 verdict must re-derive from the row's own integers plus
    // the corpus totals — blocked ⟺ ppm(dup rate) > ppm(2 × mean).
    val rows = out.collect()
    val totDocs = rows.map(_.getLong(1)).sum
    val totDup = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      val (nd, nt, dup, blocked, kd, kt) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      val expect =
        if (dup * 1000000L / nd > 2L * totDup * 1000000L / totDocs) 1L else 0L
      assert(blocked == expect, s"source ${r.getString(0)} verdict")
      assert((kd, kt) == (if (blocked == 1L) (0L, 0L) else (nd, nt)),
        "kept columns must collapse to 0 exactly for blocked sources")
    }
    // Same loser tier as q239: dup_members = n_docs − kept_docs there.
    val q239 = q("q239_effective_tokens_banded")
      .select(col("source"), (col("n_docs") - col("kept_docs")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(3) == q239(r.getString(0)),
      s"source ${r.getString(0)} dup_members diverges from q239's losers"))
    out.unpersist()
  }

  test("q246: stitch candidates are real seams and the argmin is exact") {
    val out = q("q246_boundary_stitch").cache()
    val docs = graft.Tables.documents(spark, sf)
    assert(out.count() <= docs.count())
    // Recompute the boundary keys independently (plain Scala, not the
    // query's plan) and check every output row: boundary IS doc_id's
    // 3-token suffix, cont_id's 3-token prefix matches it, and cont_id
    // is the SMALLEST matching candidate with n_cand the exact count.
    val toks = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty)
    }.toMap
    val pre = toks.collect { case (id, w) if w.length >= 6 =>
      id -> w.take(3).mkString(" ") }
    val preCount = pre.groupBy(_._2).view.mapValues(_.size).toMap
    out.collect().foreach { r =>
      val (id, boundary, cont, nCand) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val w = toks(id)
      assert(w.length >= 6 && w.takeRight(3).mkString(" ") == boundary)
      val cands = pre.collect {
        case (cid, p) if p == boundary && cid != id && preCount(p) <= 64 => cid
      }
      assert(cands.nonEmpty && cands.min == cont && cands.size == nCand,
        s"doc $id: expected min=${cands.min} n=${cands.size}, got $cont/$nCand")
    }
    assert(out.filter(col("n_cand") < 1 || col("n_cand") > 64 ||
      col("cont_id") === col("doc_id")).count() == 0)
    out.unpersist()
  }

  test("q247: gram counts match a plain-Scala recount; verdict law exact") {
    val out = q("q247_repetition_signals").cache()
    val docs = graft.Tables.documents(spark, sf)
    assert(out.count() == docs.count(), "one signal row per document")
    val texts = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    def grams(w: Seq[String], n: Int): Seq[String] =
      if (w.length < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
    out.collect().foreach { r =>
      val (id, nt, top2, n2, dup3, n3, fl) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      val w = texts(id)
      assert(nt == w.length)
      val g2 = grams(w, 2); val g3 = grams(w, 3)
      val expTop2 =
        if (g2.isEmpty) 0L else g2.groupBy(identity).values.map(_.size).max.toLong
      assert((top2, n2) == (expTop2, g2.length.toLong), s"doc $id 2-gram stats")
      assert((dup3, n3) == ((g3.length - g3.distinct.length).toLong,
        g3.length.toLong), s"doc $id 3-gram stats")
      // Gopher bar shape, integer cross-multiply — and on this clean
      // synthetic corpus the filter must correctly pass everything
      // (top-2-gram share ≈ 4%, dup-3-gram share ≈ 0.1% measured).
      assert(fl == (if (top2 * 5 > n2 || dup3 * 10 > n3 * 3) 1L else 0L))
    }
    // The verdict law itself must be able to fire: a pathological word
    // stream trips both bars under the same arithmetic.
    val bad = Seq.fill(40)("spam spam").mkString(" ").split(" ").toSeq
    val b2 = grams(bad, 2); val b3 = grams(bad, 3)
    val badTop = b2.groupBy(identity).values.map(_.size).max.toLong
    assert(badTop * 5 > b2.length && (b3.length - b3.distinct.length) * 10 >
      b3.length * 3, "the bars must flag a degenerate repeated stream")
    out.unpersist()
  }

  test("q248: one verdict per batch doc; single-hop law re-derived in Scala") {
    val out = q("q248_incremental_dedup").cache()
    // Sides from the same split hash; pairs from the shared banded tier.
    // The CLASSIFICATION (what q248 adds) is re-derived in plain Scala.
    val batch = graft.Tables.documents(spark, sf)
      .select(col("doc_id"))
      .filter(floor(graft.Hashing.hash32(col("doc_id")) /
        lit(42949672.96)) < 25)
      .collect().map(_.getLong(0)).toSet
    assert(out.count() == batch.size, "exactly one verdict row per batch doc")
    val pairs = graft.PipelineQueries.bandedVerifiedPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val partners = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val corpusMatch = batch.iterator.flatMap { x =>
      val cp = partners.getOrElse(x, Seq.empty).filterNot(batch)
      if (cp.isEmpty) None else Some(x -> cp.min)
    }.toMap
    val batchMatch = batch.iterator.flatMap { x =>
      val bp = partners.getOrElse(x, Seq.empty)
        .filter(p => batch(p) && p < x && !corpusMatch.contains(p))
      if (bp.isEmpty) None else Some(x -> bp.min)
    }.toMap
    out.collect().foreach { r =>
      val (id, verdict, m) = (r.getLong(0), r.getString(1), r.getLong(2))
      val expect = corpusMatch.get(id).map(("dup_vs_corpus", _))
        .orElse(batchMatch.get(id).map(("dup_in_batch", _)))
        .getOrElse(("accept", -1L))
      assert((verdict, m) == expect, s"doc $id: got ($verdict,$m), want $expect")
    }
    // Rejecting a batch doc must leave a surviving representative:
    // every dup_in_batch match target is itself an accepted batch doc.
    out.filter(col("verdict") === "dup_in_batch").collect().foreach { r =>
      val t = r.getLong(2)
      assert(batch(t) && !corpusMatch.contains(t),
        s"dup_in_batch target $t must be a surviving batch doc")
    }
    out.unpersist()
  }

  test("q249: median/MAD/outliers match a plain-Scala recompute per source") {
    val out = q("q249_length_outliers").cache()
    val bySource = graft.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    // Exact rank medians in scaled integers: med_x2 = lower+upper middle
    // of len, mad_x4 = lower+upper middle of |2·len − med_x2|.
    def midSum(xs: IndexedSeq[Long]): Long = {
      val n = xs.length
      xs((n + 1) / 2 - 1) + xs((n + 2) / 2 - 1)
    }
    out.collect().foreach { r =>
      val (src, nd, m2, mad4, nOut) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val xs = bySource(src)
      assert(nd == xs.length)
      assert(m2 == midSum(xs), s"$src median (x2)")
      val d2s = xs.map(x => math.abs(2 * x - m2)).sorted
      assert(mad4 == midSum(d2s), s"$src MAD (x4)")
      assert(nOut == d2s.count(d2 => 2 * d2 > 3 * mad4), s"$src outliers")
    }
    assert(out.count() ==
      graft.Tables.documents(spark, sf).select("source").distinct().count())
    // Even-count law (the corpus only exercises odd 25-doc sources):
    // for [1,2,3,10] median = 2.5 → med_x2 = 5; devs (x2) = [3,1,1,15]
    // → sorted [1,1,3,15], mad_x4 = 1+3 = 4 (MAD = 1); outlier test
    // 2·d2 > 3·mad_x4 flags only the 10 (2·15=30 > 12).
    val even = IndexedSeq(1L, 2L, 3L, 10L)
    val m2e = midSum(even)
    assert(m2e == 5L)
    val d2e = even.map(x => math.abs(2 * x - m2e)).sorted
    assert(midSum(d2e) == 4L && d2e.count(d => 2 * d > 3 * 4L) == 1)
    out.unpersist()
  }

  test("q252: classes partition the corpus; marginals pin to both tiers") {
    import graft.text.Dedup
    val out = q("q252_inflight_dedup_eval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.keySet.subsetOf(Set("both_keep", "both_drop",
      "stream_only_drop", "verified_only_drop")))
    assert(out.values.map(_._1).sum == nDocs, "classes partition the corpus")
    def cls(c: String): Long = out.get(c).map(_._1).getOrElse(0L)
    // Stream-dropped marginal = distinct larger sides of banded pairs.
    val streamDropped = Dedup.minhashLshPairs(
        graft.Tables.documents(spark, sf), "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4)
      .select("id_b").distinct().count()
    assert(cls("stream_only_drop") + cls("both_drop") == streamDropped)
    // Verified-dropped marginal = the banded-verified component losers.
    val losers = Dedup.connectedComponents(
        graft.PipelineQueries.bandedVerifiedPairs(spark, sf))
      .filter(col("id") =!= col("cluster")).count()
    assert(cls("verified_only_drop") + cls("both_drop") == losers)
  }

  test("q253: pair mass is preserved and locality matches the shard map") {
    val out = q("q253_shard_dedup_locality").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = graft.PipelineQueries.bandedVerifiedPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.values.sum == pairs.length, "every verified pair labeled once")
    val shard = graft.text.Packing.snakeShards(
        graft.Tables.documents(spark, sf), "doc_id",
        size(graft.text.TextOps.tokens(col("text"))), numShards = 16)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val within = pairs.count { case (a, b) => shard(a) == shard(b) }
    assert(out.getOrElse("within", 0L) == within)
    assert(out.getOrElse("across", 0L) == pairs.length - within)
  }

  test("q254: exact KS statistic matches a plain-Scala CDF walk") {
    val r = q("q254_ks_drift").collect()
    assert(r.length == 1)
    val (n1, n2, ksNum, ksAt) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // Independent recompute: same hash split, integer CDF cross-multiply.
    val rows = graft.Tables.documents(spark, sf)
      .select(col("n_chars").cast("long").as("v"),
        when(floor(graft.Hashing.hash32(col("doc_id")) /
          lit(42949672.96)) < 25, 1L).otherwise(0L).as("b"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val (b1, b2) = rows.partition(_._2 == 1L)
    assert((n1, n2) == (b1.length.toLong, b2.length.toLong))
    val vs = rows.map(_._1).distinct.sorted
    val stats = vs.map { v =>
      val c1 = b1.count(_._1 <= v).toLong
      val c2 = b2.count(_._1 <= v).toLong
      (v, math.abs(c1 * n2 - c2 * n1))
    }
    val mx = stats.map(_._2).max
    assert(ksNum == mx, s"ks_num $ksNum != recomputed $mx")
    assert(ksAt == stats.filter(_._2 == mx).map(_._1).min,
      "ks_at must be the smallest length attaining the max")
    // A deterministic hash split of one corpus shows no drift at the
    // α=0.05 two-sample bar: D < 1.358·sqrt((n1+n2)/(n1·n2)).
    val d = ksNum.toDouble / (n1.toDouble * n2)
    assert(d < 1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2)),
      s"hash split should not register as drift (D=$d)")
  }

  test("q255: full grid incl. zero cells; integer chi2 matches a recount") {
    val out = q("q255_composition_chi2").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val obs = graft.Tables.documents(spark, sf)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = obs.keys.map(_._1).toSeq.distinct
    val srcs = obs.keys.map(_._2).toSeq.distinct
    assert(out.size == langs.size * srcs.size, "output must be the FULL grid")
    val rTot = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cTot = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum
    for (l <- langs; s2 <- srcs) {
      val o = obs.getOrElse((l, s2), 0L)
      val (r, c) = (rTot(l), cTot(s2))
      val dev = o * n - r * c
      val expect = (o, (r * c * 1000L) / n, dev * dev * 1000000L / (n * r * c))
      assert(out((l, s2)) == expect, s"cell ($l,$s2)")
    }
    assert(out.values.map(_._1).sum == n, "grid observed mass = corpus")
    // χ² near its dof under independence — the synthetic mix is random,
    // so the statistic must not explode (10× dof is a generous ceiling).
    val chi2 = out.values.map(_._3).sum / 1e6
    val dof = (langs.size - 1) * (srcs.size - 1)
    assert(chi2 < 10.0 * dof, s"chi2=$chi2 vs dof=$dof")
  }

  test("q261: release manifest sums to q239's accounting per source and q226's split manifest") {
    val out = q("q261_release_manifest").cache()
    // Dedup accounting: summing over splits must reproduce q239 exactly
    // (same loser tier by shared code; this pins the composition).
    val perSource = out.groupBy("source")
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t"),
        sum("kept_docs").as("kd"), sum("kept_tokens").as("kt"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    q("q239_effective_tokens_banded").collect().foreach { r =>
      assert(perSource(r.getString(0)) ==
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
        s"source ${r.getString(0)} accounting diverges from q239")
    }
    // Split assignment: pre-dedup (source, split) doc counts must equal
    // q226's manifest (same hash expression by construction).
    val viaQ226 = q("q226_split_manifest").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.collect().foreach { r =>
      assert(viaQ226((r.getString(0), r.getString(1))) == r.getLong(2),
        s"(${r.getString(0)}, ${r.getString(1)}) n_docs diverges from q226")
    }
    out.unpersist()
  }

  test("q261: leakage law — verified pairs never straddle survivors, leak mass is even") {
    val out = q("q261_release_manifest").cache()
    // Each cross-split surviving candidate pair is endpoint-attributed
    // twice, so the global leak mass is even.
    val leakTotal = out.agg(sum("leak_pairs")).collect()(0).getLong(0)
    assert(leakTotal % 2 == 0, s"endpoint-attributed leak mass $leakTotal is odd")
    // The by-construction claim in the doc-comment: the VERIFIED tier
    // between survivors is empty (same-cluster docs never co-survive).
    // Jaccard-tier survivors re-derive from a union-find over q237's
    // verified pos set (the same drift-proof link q239's spec uses).
    val pos = q("q237_contrastive_pairs").collect()
      .filter(_.getString(3) == "pos").map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pos.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = pos.flatMap(p => Seq(p._1, p._2)).toSet
    val surviving = (id: Long) => !clustered(id) || find(id) == id
    pos.foreach { case (a, b) =>
      assert(!(surviving(a) && surviving(b)),
        s"verified pair ($a, $b) has both endpoints surviving — dedup broken")
    }
    out.unpersist()
  }

  test("q270: keep-best election laws — gain iff the policies differ, members bound the winner") {
    val out = q("q270_dedup_keep_best").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.foreach { case (cluster, n, bestDoc, _, keptFirst, gain) =>
      // Clusters come from verified PAIRS, so every cluster has ≥ 2
      // members, and the cluster id is its min member — the winner can
      // never precede it.
      assert(n >= 2, s"cluster $cluster has $n member(s)")
      assert(bestDoc >= cluster, s"cluster $cluster elected $bestDoc < min id")
      // Ties elect the lowest id (= the cluster/min member), so the two
      // policies differ EXACTLY when strictly positive quality is left
      // behind by keep-first.
      assert(gain >= 0.0, s"cluster $cluster: negative quality gain $gain")
      // One-directional: keep-first ⇒ zero gain (the converse can fail
      // only through 6-dp rounding of a sub-micro integer delta).
      assert(keptFirst != 1L || gain == 0.0,
        s"cluster $cluster: kept_first but gain=$gain")
      assert((keptFirst == 1L) == (bestDoc == cluster))
    }
  }

  test("q273: the two variants score the same val set and dedup can only shrink train coverage") {
    val out = q("q273_dedup_lm_eval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).sorted.toSeq == Seq("dedup", "full"))
    val dd = out.find(_._1 == "dedup").get
    val fl = out.find(_._1 == "full").get
    // Identical evaluation set: the variants differ ONLY in training
    // corpus, so any xent delta is attributable to dedup.
    assert(dd._3 == fl._3, "variants scored different val bigram counts")
    assert(dd._2 <= fl._2, "dedup grew the train corpus")
    // The deduped train's bigram set is a subset of the full train's,
    // so its unseen mass can only be >= the full variant's.
    assert(dd._4 >= fl._4, "dedup reduced unseen bigrams — subset law broken")
    assert(dd._5 > 0.0 && fl._5 > 0.0)
  }

  test("q280: Hill tail estimator — k grid, recompute from the q240 histogram, null only when degenerate") {
    val out = q("q280_dup_tail_hill").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.map(_._1).toSeq == Seq(5L, 10L, 20L, 50L), "k grid changed")
    // Independent recompute from a DIFFERENT registered query: q240's
    // banded-tier histogram is the full cluster-size multiset (incl.
    // singletons), so the whole Hill table must be derivable from it.
    val hist = q("q240_dup_prevalence_banded").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sizes = hist.sortBy(-_._1).flatMap { case (sz, n) =>
      Seq.fill(math.min(n, 60L).toInt)(sz) // 60 ≥ k_max+1 caps the expansion
    }
    val n = hist.map(_._2).sum
    out.foreach { case (kReq, kEff, nOut, sk1, q, alpha) =>
      assert(nOut == n, s"k=$kReq: n_clusters $nOut != histogram total $n")
      assert(kEff == math.min(kReq, n - 1))
      val expSk1 = if (kEff < sizes.length) sizes(kEff.toInt) else 1L
      assert(sk1 == expSk1, s"k=$kReq: tail size $sk1 != histogram $expSk1")
      val expQ = (0 until math.min(kEff, sizes.length.toLong).toInt).map { i =>
        math.floor(math.log(sizes(i).toDouble / expSk1) * 1e6 + 0.5).toLong
      }.sum
      assert(q == expQ, s"k=$kReq: hill sum $q != recompute $expQ")
      alpha match {
        case Some(a) =>
          assert(q > 0)
          assert(approx(a, math.floor(kEff.toDouble * 1e6 / q * 1e6 + 0.5) / 1e6, 1e-9))
          assert(a > 0.0)
        case None => assert(q == 0L, s"k=$kReq: alpha null but sum $q > 0")
      }
    }
  }

  test("q283: dirtiness bands partition the candidate corpus and agree with q110's verdicts") {
    val rows = q("q283_contamination_bands").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bands = Set("ungauged", "clean", "dirty_low", "dirty_high")
    assert(rows.map(_._2).toSet.subsetOf(bands), "unknown band label")
    // The bands PARTITION the non-benchmark corpus: doc and token mass
    // both reconcile exactly against a direct recount.
    val cand = graft.Tables.documents(spark, sf)
      .filter(col("source") =!= "src0")
    val nDocs = cand.count()
    val nTok = cand.select(sum(size(graft.text.TextOps.tokens(col("text")))
      .cast("long"))).collect().head.getLong(0)
    assert(rows.map(_._3).sum == nDocs, "band doc counts don't partition")
    assert(rows.map(_._4).sum == nTok, "band token counts don't partition")
    // Cross-query pin: q110 (same n = 8, same benchmark) says which docs
    // are contaminated at all; its verdict counts must equal the band
    // rollup's clean/dirty split.
    val q110 = q("q110_contamination").collect()
      .map(r => r.getBoolean(2))
    val contaminated = q110.count(identity).toLong
    val dirty = rows.filter(r => r._2 == "dirty_low" || r._2 == "dirty_high")
      .map(_._3).sum
    val cleanish = rows.filter(r => r._2 == "clean" || r._2 == "ungauged")
      .map(_._3).sum
    assert(dirty == contaminated, s"dirty bands $dirty != q110 contaminated $contaminated")
    assert(cleanish == q110.length - contaminated)
  }

  test("q274: Spearman is bounded, consistent with its own integers, and covers every source") {
    val out = q("q274_len_quality_bias").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nSources = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(out.length == nSources, "a source is missing from the bias audit")
    out.foreach { case (src, n, d2, rho) =>
      // Σd² at perfect anticorrelation is (n³ − n)/3 — the upper bound.
      assert(d2 >= 0 && d2 <= (n * n * n - n) / 3, s"$src: d2_sum out of range")
      assert(rho >= -1.0 && rho <= 1.0, s"$src: rho $rho out of [-1, 1]")
      val expect = 1.0 - 6.0 * d2.toDouble / (n.toDouble * (n.toDouble * n - 1))
      assert(approx(rho, math.floor(expect * 1e6 + 0.5) / 1e6, 1e-9),
        s"$src: rho $rho inconsistent with d2_sum")
    }
  }
}

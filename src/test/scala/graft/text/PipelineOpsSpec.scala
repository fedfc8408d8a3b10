package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sim.Pq

/** Round-5 pipeline operators: repetition metrics, contamination,
  * chunk dedup, stratified sampling, product quantization.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed gram masses") {
    // doc 1: "a b a b a b" — top 2-gram "a b" occurs 3×, len 3, text len 11.
    // 3-grams: "a b a" ×2, "b a b" ×2 → dup mass (2·5 + 2·5) / 11.
    // doc 2: all-distinct words — dup mass 0, top 2-gram count 1.
    val docs = Seq((1L, "a b a b a b"), (2L, "w x y z")).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out(0).getAs[Long]("n_chars") == 11L)
    assert(approx(out(0).getAs[Double]("top2_frac"), 9.0 / 11, 1e-6))
    assert(approx(out(0).getAs[Double]("dup_frac"), 20.0 / 11, 1e-6))
    assert(approx(out(1).getAs[Double]("top2_frac"), 3.0 / 7, 1e-6))
    assert(out(1).getAs[Double]("dup_frac") == 0.0)
  }

  test("benchmarkOverlap: shared n-grams counted once, bench docs excluded") {
    val docs = Seq(
      (1L, "q w e r t y u i o p", "bench"), // benchmark doc
      (2L, "q w e r t y u i o p", "cand"), // exact copy: 3 distinct 8-grams shared
      (3L, "z z z z z z z z z z", "cand"), // no overlap; 1 distinct 8-gram
      (4L, "a b", "cand")) // too short for an 8-gram
      .toDF("doc_id", "text", "source")
    val out = Contamination.benchmarkOverlap(docs, "doc_id", "text",
      col("source") === "bench", n = 8).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    assert(out(0).getAs[Long]("n_shared") == 3L && out(0).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Long]("n_shared") == 0L && !out(1).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Long]("n_shared") == 0L)
  }

  test("chunkDupStats: cross-doc chunks flagged, intra-doc repeats not") {
    val ten = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    val other = "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"
    val docs = Seq(
      (1L, s"$ten $other"), // 2 chunks; first shared with doc 2
      (2L, s"$ten x1 x2"), // 1 chunk (tail dropped); shared with doc 1
      (3L, s"$ten $ten")) // same chunk twice — but only docs 1/2 make it cross-doc
      .toDF("doc_id", "text")
    val out = Contamination.chunkDupStats(docs, "doc_id", "text", 10)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_chunks") == 2L)
    assert(approx(out(0).getAs[Double]("dup_chunk_frac"), 0.5, 1e-6))
    assert(approx(out(1).getAs[Double]("dup_chunk_frac"), 1.0, 1e-6))
    // doc 3's repeated chunk IS cross-doc here (docs 1/2 share it), so 1.0;
    // the intra-doc-only case needs a chunk unique to doc 3:
    assert(approx(out(2).getAs[Double]("dup_chunk_frac"), 1.0, 1e-6))
    val solo = Contamination.chunkDupStats(
      Seq((9L, s"$other $other")).toDF("doc_id", "text"), "doc_id", "text", 10)
      .collect()
    // both chunks identical but no OTHER doc has them → not duplicates
    assert(solo(0).getAs[Double]("dup_chunk_frac") == 0.0)
  }

  test("balancedSample: expected per-stratum size ≈ smallest stratum") {
    val rows = (1 to 900).map(i => (i.toLong, if (i <= 600) "big" else "small"))
    val df = rows.toDF("doc_id", "lang")
    val out = Sampling.balancedSample(df, "doc_id", "lang", "t")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // thresholds: small keeps all (rate 1.0); big keeps ~300/600
    assert(out("small") == 300L)
    assert(math.abs(out("big") - 300L) < 80)
    // determinism: same salt → same sample
    val again = Sampling.balancedSample(df, "doc_id", "lang", "t").count()
    assert(again == out.values.sum)
  }

  test("bm25TopK: hand-computed single-term score; termless docs unranked") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = Relevance.bm25TopK(docs, "doc_id", "text", Seq("x"), topK = 5)
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("doc_id") == 1L)
    // N=2, df=1, tf=2, dl=3, avdl=5/2
    val expected = math.log(1.0 + (2 - 1 + 0.5) / 1.5) * (2 * (1.2 + 1.0)) /
      (2 + 1.2 * (1.0 - 0.75 + 0.75 * 3.0 / 2.5))
    assert(approx(out(0).getAs[Double]("score"), expected, 1e-6))
  }

  test("kNN-classify majority vote: ties break to the smaller label") {
    // 4 corpus rows at distance ~0 from the query: labels 2,2,7,7 and a
    // far label-9 row; k=4 → 2-vs-2 tie → pred 2.
    val corpus = Seq(
      (10L, 2, Seq(1.0, 0.0)), (11L, 2, Seq(1.0, 0.001)),
      (12L, 7, Seq(1.0, -0.001)), (13L, 7, Seq(0.999, 0.0)),
      (14L, 9, Seq(-1.0, 0.0))).toDF("vec_id", "label", "embedding")
    val q = Seq((1L, Seq(1.0, 0.0))).toDF("query_id", "query_vec")
    val knn = graft.ohlcv.Search.knnJoin(corpus, q, "vec_id", "embedding",
      "query_id", "query_vec", k = 4, metricName = "cosine_dist")
    val votes = knn.groupBy("query_id", "label").agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("label").asc)
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).collect()
    assert(pred.length == 1 && pred(0).getAs[Int]("label") == 2)
  }

  test("PQ: encode picks the nearest codeword; ADC orders by codeword distance") {
    // 4-dim vectors, m=2 subspaces of dim 2. Codebook from 2 vectors.
    val cbv = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(5.0, 5.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val cb = Pq.codebook(cbv, "vec_id", "embedding", m = 2, subDim = 2)
    assert(cb.count() == 4)
    val corpus = Seq(
      (10L, Seq(0.1, 0.1, 9.0, 9.0)), // codes (0, 0)
      (11L, Seq(4.0, 4.0, 1.0, 1.0))) // codes (1, 1)
      .toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, 2, 2)
      .orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(codes.toSeq == Seq((10L, 0, 0), (10L, 1, 0), (11L, 0, 1), (11L, 1, 1)))
    // query at (0,0,10,10): ADC(10) = 0 exactly (its codewords ARE the query);
    // ADC(11) = ‖(0,0)-(5,5)‖² + ‖(10,10)-(0,0)‖² = 50 + 200.
    val q = Seq(Tuple1(Seq(0.0, 0.0, 10.0, 10.0))).toDF("embedding")
    val top = Pq.adcTopK(Pq.encode(corpus, "vec_id", "embedding", cb, 2, 2),
      "vec_id", cb, q, "embedding", 2, 2, k = 2).orderBy("rank").collect()
    assert(top(0).getAs[Long]("vec_id") == 10L && top(0).getAs[Double]("adc") == 0.0)
    assert(top(1).getAs[Long]("vec_id") == 11L && top(1).getAs[Double]("adc") == 250.0)
  }

  test("exactSubstrSpans: duplicated L-grams merge into maximal spans") {
    // L=4. Docs 1 and 2 are identical → every position duplicated →
    // one full-width span each. Doc 3 embeds the shared "abcdefgh"
    // at offset 2 → positions 2..6 duplicated → span [2, 10).
    // Doc 4 shares nothing → no spans.
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abcdefgh"),
      (3L, "xxabcdefghyy"), (4L, "qrstuvwz"))
      .toDF("doc_id", "text")
    val spans = graft.PipelineQueries.exactSubstrSpans(docs, 4)
      .orderBy("doc_id", "span_start")
      .select("doc_id", "span_start", "span_end", "n_positions")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 0L, 8L, 5L), (2L, 0L, 8L, 5L), (3L, 2L, 10L, 5L)))
  }

  test("exactSubstrSpansHashKey: identical spans to the raw-gram plan") {
    // The xxhash64-keyed variant must reproduce the raw-gram spans
    // exactly (collision verification makes it semantics-preserving).
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abcdefgh"),
      (3L, "xxabcdefghyy"), (4L, "qrstuvwz"),
      (5L, "the cat sat on the mat, the cat sat again"),
      (6L, "a cat sat on the mat yesterday evening"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("doc_id", "span_start")
      .select("doc_id", "span_id", "span_start", "span_end", "n_positions")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    for (l <- Seq(3, 4, 6)) {
      val raw = rows(graft.PipelineQueries.exactSubstrSpans(docs, l))
      val hashed = rows(graft.PipelineQueries.exactSubstrSpansHashKey(docs, l))
      assert(hashed == raw, s"L=$l: hash-keyed spans diverge")
      assert(raw.nonEmpty)
    }
  }

  test("exactSubstrApply: span excision — full doc, interior span, untouched doc") {
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abcdefgh"),
      (3L, "xxabcdefghyy"), (4L, "qrstuvwz"))
      .toDF("doc_id", "text")
    val out = graft.PipelineQueries.exactSubstrApply(docs, 4)
      .orderBy("doc_id")
      .select("doc_id", "orig_len", "kept_len", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 8L, 0L, 1L), (2L, 8L, 0L, 1L),
      (3L, 12L, 4L, 1L), (4L, 8L, 8L, 0L)))
    // The cleaned doc 3 must hash like the literal "xxyy".
    val h3 = graft.PipelineQueries.exactSubstrApply(docs, 4)
      .filter(col("doc_id") === 3L).select("h").as[Long].head()
    val expected = spark.range(1).select(
      TextOps.md5Hash60(lit("xxyy"))).as[Long].head()
    assert(h3 == expected)
  }
}

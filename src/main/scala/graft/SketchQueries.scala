package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.Rounding.{pround, sqlRound}
import graft.VectorTextQueries.{sqlHash60, sqlShingles, sqlToks}
import graft.text.TextOps

/** Round-11 sketch / compression additions to the training-data
  * pipeline: corpus-level overlap estimation via K-Minimum-Values
  * sketches (Beyer, Haas, Reinwald, Sismanis, Gemulla — SIGMOD 2007;
  * Bar-Yossef et al. 2002) and an int8 scalar-quantization distortion
  * audit for the embedding store (the SQ8 codec every production ANN
  * index offers alongside the PQ tier q111/q191 already cover).
  *
  * Both are bounded-output aggregations: the KMV sketch is K values per
  * source regardless of corpus size, and the quantization audit returns
  * one row per label. 100 TB posture in each query's doc.
  */
object SketchQueries {

  /** Sketch size for q241 — 64 keeps the Jaccard estimator's standard
    * error ≈ 1/√64 ≈ 12.5% while the per-source state stays 64 longs.
    */
  private val KmvK = 64

  /** 2^60 as a double — md5Hash60's value range, the KMV estimator's
    * normalization constant. Exactly representable (power of two).
    */
  private val HashRange = 1152921504606846976L

  private val sketches: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // q241: pairwise corpus overlap between sources via KMV sketches.
    //
    // Each source's distinct word-3-shingle set is summarized by its K
    // smallest md5Hash60 values (a K-Minimum-Values sketch). The k-th
    // smallest hash of the UNION of two sketches bounds every retained
    // value below BOTH sources' k-th minima, so sketch membership is an
    // exact set-membership test there (Beyer et al. 2007, §3.2):
    //   Ĵ(A,B) = |KMV_k(A∪B) ∩ A ∩ B| / k,
    //   D̂(S)  = (k−1)·2^60 / h_(k)   (exact count when |S| < k).
    //
    // 100 TB shape: the only corpus-sized work is the distinct over
    // (source, shingle-hash) — the same mass as the minhash signature
    // tier's distinct. The rank filter rn ≤ K compiles to a
    // WindowGroupLimit with a PARTIAL limit before the shuffle, so each
    // map task forwards at most K rows per source; everything after the
    // rank is sketch-sized (K longs per source, a catalog-sized
    // self-join). Sketch state is mergeable, so an incremental corpus
    // maintains it without rescans — the property that makes KMV the
    // standard overlap monitor for continuously ingested corpora.
    // ------------------------------------------------------------------
    Q("q241_kmv_overlap",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .select(col("source"), explode(array_distinct(
            TextOps.wordShingles(col("text"), 3))).as("__s"))
          .select(col("source"), TextOps.md5Hash60(col("__s")).as("h"))
          .distinct()
        val w = Window.partitionBy("source").orderBy("h")
        val sk = sh.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= KmvK)
          .groupBy("source")
          .agg(sort_array(collect_list(col("h"))).as("kmv"),
            count(lit(1)).as("kk"))
        def est(kmv: org.apache.spark.sql.Column, kk: org.apache.spark.sql.Column) =
          when(kk < KmvK, kk.cast("double"))
            .otherwise(lit((KmvK - 1).toDouble) * lit(HashRange).cast("double") /
              element_at(kmv, KmvK).cast("double"))
        val a = sk.select(col("source").as("source_a"), col("kmv").as("kmv_a"),
          col("kk").as("kk_a"))
        val b = sk.select(col("source").as("source_b"), col("kmv").as("kmv_b"),
          col("kk").as("kk_b"))
        a.join(b, col("source_a") < col("source_b"))
          .withColumn("u",
            slice(array_sort(array_distinct(concat(col("kmv_a"), col("kmv_b")))),
              1, KmvK))
          .withColumn("ku", size(col("u")).cast("long"))
          .withColumn("inter_k", size(filter(col("u"), x =>
            array_contains(col("kmv_a"), x) &&
              array_contains(col("kmv_b"), x))).cast("long"))
          .select(col("source_a"), col("source_b"), col("ku"), col("inter_k"),
            pround(col("inter_k").cast("double") / col("ku").cast("double"), 6)
              .as("jaccard_est"),
            pround(est(col("kmv_a"), col("kk_a")), 4).as("est_distinct_a"),
            pround(est(col("kmv_b"), col("kk_b")), 4).as("est_distinct_b"))
          .orderBy("source_a", "source_b")
      },
      Some {
        val est = (kmv: String, kk: String) =>
          s"""CASE WHEN $kk < $KmvK THEN CAST($kk AS DOUBLE)
             |    ELSE ${KmvK - 1}.0 * CAST($HashRange AS DOUBLE)
             |      / CAST($kmv[$KmvK] AS DOUBLE) END""".stripMargin
        s"""WITH toks AS (SELECT doc_id, source, $sqlToks AS toks FROM documents),
           |shd AS (SELECT DISTINCT source, ${sqlHash60("s0")} AS h FROM (
           |  SELECT source, unnest(list_distinct(${sqlShingles(3)})) AS s0
           |  FROM toks WHERE len(toks) >= 3)),
           |rk AS (SELECT source, h,
           |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           |  FROM shd),
           |sk AS (SELECT source, list_sort(list(h)) AS kmv,
           |    CAST(count(*) AS BIGINT) AS kk
           |  FROM rk WHERE rn <= $KmvK GROUP BY source),
           |pr AS (SELECT a.source AS source_a, b.source AS source_b,
           |    a.kmv AS kmv_a, b.kmv AS kmv_b, a.kk AS kk_a, b.kk AS kk_b,
           |    (list_sort(list_distinct(list_concat(a.kmv, b.kmv))))[1:$KmvK] AS u
           |  FROM sk a JOIN sk b ON a.source < b.source),
           |m AS (SELECT source_a, source_b, kmv_a, kmv_b, kk_a, kk_b,
           |    CAST(len(u) AS BIGINT) AS ku,
           |    CAST(len(list_filter(u, x -> list_contains(kmv_a, x)
           |      AND list_contains(kmv_b, x))) AS BIGINT) AS inter_k
           |  FROM pr)
           |SELECT source_a, source_b, ku, inter_k,
           |  ${sqlRound("CAST(inter_k AS DOUBLE) / CAST(ku AS DOUBLE)", 6)} AS jaccard_est,
           |  ${sqlRound(est("kmv_a", "kk_a"), 4)} AS est_distinct_a,
           |  ${sqlRound(est("kmv_b", "kk_b"), 4)} AS est_distinct_b
           |FROM m ORDER BY source_a, source_b""".stripMargin
      }),

    // ------------------------------------------------------------------
    // q242: int8 scalar-quantization distortion audit for the embedding
    // store (SQ8: per-dimension min/max train pass, then
    //   code = clamp(⌊(v − lo)/(hi − lo) · 256⌋, 0, 255),
    //   v′   = lo + (code + ½)(hi − lo)/256
    // — the uniform-grid codec with midpoint reconstruction). Reports
    // per-label vector counts, mean per-dimension squared error, and the
    // worst vector's MSE — the go/no-go numbers for shipping a 4×
    // smaller embedding corpus.
    //
    // Parity: squared errors are nano-quantized to exact BIGINTs at
    // 1e-12 resolution before any reordered aggregation (the q213/q185
    // trick), so sums are order-free and engine-identical; the two
    // output doubles are derived from those integer sums and pround'd.
    //
    // 100 TB shape: one pass for per-dimension min/max (a dim-sized
    // partial-aggregated frame, broadcast back), one map-side pass for
    // codes + errors, one hash aggregation per (vec, label) feeding a
    // label-sized rollup — no shuffle carries more than the exploded
    // corpus once, and min/max is the ONLY training state (mergeable,
    // incremental-friendly, unlike PQ's k-means codebooks in q111).
    // ------------------------------------------------------------------
    Q("q242_sq8_quantize",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dpos", "v")))
        val rng = e.groupBy("dpos").agg(min("v").as("lo"), max("v").as("hi"))
        e.join(broadcast(rng), "dpos")
          .withColumn("rangev", col("hi") - col("lo"))
          .withColumn("code", when(col("rangev") > 0,
            least(lit(255.0),
              floor((col("v") - col("lo")) / col("rangev") * lit(256.0))))
            .otherwise(lit(0.0)))
          .withColumn("recon",
            col("lo") + (col("code") + lit(0.5)) * col("rangev") / lit(256.0))
          .withColumn("err", col("v") - col("recon"))
          .withColumn("qse",
            floor(col("err") * col("err") * lit(1e12) + lit(0.5)).cast("long"))
          .groupBy("vec_id", "label")
          .agg(sum("qse").as("sse_q"), count(lit(1)).as("nd"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            pround(sum(col("sse_q")).cast("double") /
              sum(col("nd")).cast("double") / lit(1e12), 6).as("mean_mse"),
            pround(max(col("sse_q")).cast("double") /
              max(col("nd")).cast("double") / lit(1e12), 6).as("max_mse"))
          .orderBy("label")
      },
      Some(s"""WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev
              |  FROM embeddings),
              |-- Lockstep unnest pair: dpos follows each vector's TRUE
              |-- length (posexplode parity) — not a grid built from one
              |-- arbitrary row, which would silently diverge on a ragged
              |-- embedding store instead of failing loudly.
              |x AS (SELECT vec_id, label,
              |    unnest(range(len(ev))) AS dpos, unnest(ev) AS v
              |  FROM emb),
              |rng AS (SELECT dpos, min(v) AS lo, max(v) AS hi
              |  FROM x GROUP BY dpos),
              |q AS (SELECT x.vec_id, x.label, x.v, rng.lo,
              |    rng.hi - rng.lo AS rangev,
              |    CASE WHEN rng.hi - rng.lo > 0
              |      THEN least(255.0, floor((x.v - rng.lo) / (rng.hi - rng.lo) * 256.0))
              |      ELSE 0.0 END AS code
              |  FROM x JOIN rng USING (dpos)),
              |se AS (SELECT vec_id, label,
              |    (v - (lo + (code + 0.5) * rangev / 256.0)) AS err
              |  FROM q),
              |pv AS (SELECT vec_id, label,
              |    CAST(sum(CAST(floor(err * err * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS sse_q,
              |    CAST(count(*) AS BIGINT) AS nd
              |  FROM se GROUP BY 1, 2)
              |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
              |  ${sqlRound("CAST(sum(sse_q) AS DOUBLE) / CAST(sum(nd) AS DOUBLE) / 1e12", 6)} AS mean_mse,
              |  ${sqlRound("CAST(max(sse_q) AS DOUBLE) / CAST(max(nd) AS DOUBLE) / 1e12", 6)} AS max_mse
              |FROM pv GROUP BY label ORDER BY label""".stripMargin))
  )

  // --------------------------------------------------------------------
  // Dedup-tier calibration + apply: q243 cross-tabulates the two
  // near-dup signals (exact n-gram Jaccard vs simhash hamming) on the
  // SAME candidate set, q244 materializes the loser→canonical remap a
  // release actually ships.
  // --------------------------------------------------------------------
  private val tiers: Seq[Q] = Seq(
    // q243: tier-calibration grid. For every banded candidate pair
    // (q52's minhash band join — the measured-linear proposer), bucket
    // its exact 3-shingle Jaccard into deciles and its 60-bit simhash
    // hamming distance into width-4 bins, and count pairs per cell. The
    // grid is the pair-granular version of what diffing q232 vs q239
    // shows in aggregate: which hamming bar (q49's ≤ 6) corresponds to
    // which Jaccard bar (q42's ≥ 0.5) ON THIS CORPUS — i.e. the
    // evidence for choosing either tier's threshold.
    //
    // Parity: both bucketings are INTEGER arithmetic (10·ni // union,
    // bit_count(xor) // 4) — no float crosses an engine boundary.
    // 100 TB shape: candidates come from the banded proposer (linear,
    // SCALING.md round-11 sweep); fingerprints are per-doc codegen'd
    // map work (SimHashSig kernel); the grid itself is ≤ 10 × 16 cells.
    Q("q243_tier_calibration",
      (s, d) => {
        import graft.text.Dedup
        val fps = Dedup.simhashAgg(Tables.documents(s, d), "doc_id",
          TextOps.wordShingles(col("text"), 3), 60)
        PipelineQueries.bandedCandidateOverlap(s, d)
          .join(fps.select(col("doc_id").as("id_a"), col("simhash").as("fp_a")), "id_a")
          .join(fps.select(col("doc_id").as("id_b"), col("simhash").as("fp_b")), "id_b")
          .select(
            expr("least(9L, (10L * n_inter) div (n_a + n_b - n_inter))")
              .as("jacc_decile"),
            expr("bit_count(fp_a ^ fp_b) div 4").cast("long").as("hamming_bin"))
          .groupBy("jacc_decile", "hamming_bin")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("jacc_decile", "hamming_bin")
      },
      Some {
        val fpsSub = VectorTextQueries.simhashSql(60)
        s"""WITH ${PipelineQueries.bandedCandidateSqlCtes},
           |fps AS ($fpsSub),
           |cj AS (SELECT c.id_a, c.id_b, coalesce(i.ni, 0) AS ni,
           |    x.n AS na, y.n AS nb
           |  FROM cand c
           |  LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
           |  JOIN sz x ON c.id_a = x.doc_id JOIN sz y ON c.id_b = y.doc_id),
           |g AS (SELECT least(9, (10 * ni) // (na + nb - ni)) AS jacc_decile,
           |    (bit_count(xor(a.simhash, b.simhash)) // 4) AS hamming_bin
           |  FROM cj JOIN fps a ON cj.id_a = a.doc_id
           |    JOIN fps b ON cj.id_b = b.doc_id)
           |SELECT CAST(jacc_decile AS BIGINT) AS jacc_decile,
           |  CAST(hamming_bin AS BIGINT) AS hamming_bin,
           |  CAST(count(*) AS BIGINT) AS n_pairs
           |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // q244: the loser→canonical remap table the dedup APPLY step ships
    // for provenance. Canonical member per banded-verified cluster is
    // the LONGEST document (n_chars desc, doc_id asc tie-break — the
    // keep-the-longest heuristic, deterministic); every non-canonical
    // member gets one row mapping it to its survivor. Differs from
    // q125/q239's min-id keeper rule exactly where a release needs it
    // to: the surviving text is the most complete copy, and the remap
    // table (not just the survivor set) is what downstream provenance /
    // reference-rewriting consumes.
    //
    // 100 TB shape: clusters come from the banded tier (linear); the
    // rank window partitions by cluster — bounded by the largest dup
    // cluster, never corpus-sized; the canonical join is an equi-join
    // on cluster id over cluster-count rows.
    Q("q244_canonical_remap",
      (s, d) => {
        import graft.text.Dedup
        val comp = Dedup.connectedComponents(
          PipelineQueries.bandedVerifiedPairs(s, d))
        val m = comp.join(Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("n_chars")), "id")
        val w = Window.partitionBy("cluster")
          .orderBy(col("n_chars").desc, col("id").asc)
        val ranked = m.withColumn("rn", row_number().over(w))
        val canon = ranked.filter(col("rn") === 1)
          .select(col("cluster"), col("id").as("canonical_id"))
        ranked.filter(col("rn") > 1).join(canon, "cluster")
          .select(col("id").as("doc_id"), col("canonical_id"))
          .orderBy("doc_id")
      },
      Some {
        s"""WITH RECURSIVE ${PipelineQueries.bandedVerifiedSqlCtes},
           |m AS (SELECT c.doc_id, c.cluster, d.n_chars
           |  FROM comp c JOIN documents d USING (doc_id)),
           |r AS (SELECT doc_id, cluster,
           |    row_number() OVER (PARTITION BY cluster
           |      ORDER BY n_chars DESC, doc_id ASC) AS rn
           |  FROM m),
           |canon AS (SELECT cluster, doc_id AS canonical_id FROM r WHERE rn = 1)
           |SELECT r.doc_id, c2.canonical_id
           |FROM r JOIN canon c2 USING (cluster)
           |WHERE r.rn > 1 ORDER BY r.doc_id""".stripMargin
      }))

  // --------------------------------------------------------------------
  // Bounded-memory frequency sketches with exact re-verify.
  // --------------------------------------------------------------------
  private val frequency: Seq[Q] = Seq(
    // Heavy hitters over the corpus token stream: tokens with frequency
    // > N/30, found sketch-first — per-partition Misra–Gries(29)
    // candidates (≤ 29 counters per partition, union ⊇ the true heavy
    // hitters by pigeonhole; see HeavyHitters.scala), then an EXACT
    // count of candidate tokens only, filtered by the integer bar
    // cnt·30 > N. The candidate set varies with partitioning (MG is
    // order-sensitive) but any superset produces the same exact output,
    // so the query is deterministic and the DuckDB oracle is the plain
    // full groupBy. 100 TB lever: the shuffle after the candidate
    // broadcast-prune carries ≤ m·partitions distinct keys (map-side
    // combined), not a corpus-dependent vocabulary.
    Q("q250_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val m = 29
        val toks = Tables.documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
        val cand = graft.text.HeavyHitters
          .misraGriesCandidates(toks.as[String], m)
        val tot = toks.agg(count(lit(1)).as("n"))
        toks.join(broadcast(cand), "w")
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(tot))
          .filter(col("cnt") * lit(m + 1).cast("long") > col("n"))
          .select(col("w"), col("cnt"))
          .orderBy("w")
      },
      Some(s"""WITH w AS (SELECT unnest($sqlToks) AS w FROM documents),
             |c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
             |  FROM w GROUP BY w),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w)
             |SELECT w, cnt FROM c CROSS JOIN t
             |WHERE cnt * 30 > n ORDER BY w""".stripMargin)))

  def all: Seq[Q] = sketches ++ tiers ++ frequency
}

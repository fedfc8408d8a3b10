package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.text.Dedup
import org.apache.spark.sql.graft.PerceptualHashExpressions

/** Multimodal near-dup detection (round-15: the dedup stack was
  * text-only; a training-data pipeline dedups images too). Fingerprints
  * are the 60-bit perceptual hashes from
  * [[org.apache.spark.sql.graft.PerceptualHashKernel]] (dHash/aHash,
  * public knowledge) computed over the image payload column — the same
  * text-bytes-as-grayscale-grid latent q138's resize and q108's frame
  * sampler read, behind the same ASCII guard that keeps the byte and
  * codepoint views identical for the oracle.
  *
  * 100 TB shape: the fingerprint is ONE codegen'd projection per row —
  * no shuffle, no UDF; pair generation reuses the existing pigeonhole
  * banding ([[Dedup.simhashNearDupPairs]]: explode ×(maxHamming+1) +
  * one equi-join on the band key + output-sensitive verify), which is
  * LOSSLESS for the hamming bar by the pigeonhole argument — so the
  * DuckDB oracle can be the brute-force all-pairs definition and the
  * oracle gate itself re-proves losslessness at every scale factor.
  */
object MediaQueries {

  /** The image-payload frame: ASCII docs (byte == codepoint) with at
    * least one full 8-byte grid row, payload = the raw bytes.
    */
  private def imageDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) >= 8 && col("text").rlike("^[\\x00-\\x7F]*$"))
      .withColumn("payload", col("text").cast("binary"))

  /** Shared DuckDB CTE: per-doc codepoint list + grid height. */
  private val sqlCodes =
    """codes AS (SELECT doc_id,
      |    [unicode(c) FOR c IN string_split(text, '')] AS cs,
      |    len(text) // 8 AS h
      |  FROM documents
      |  WHERE len(text) >= 8 AND regexp_matches(text, '^[\x00-\x7f]*$'))""".stripMargin

  /** DuckDB mirror of PerceptualHashKernel.dhash60 (1-indexed lists). */
  private val sqlDhash =
    """CAST(list_sum([CASE WHEN
      |      cs[((i // 6) * h // 11) * 8 + ((i % 6) * 8 // 6) + 1] >
      |      cs[(((i // 6) + 1) * h // 11) * 8 + ((i % 6) * 8 // 6) + 1]
      |    THEN (1::BIGINT << i) ELSE 0::BIGINT END
      |    FOR i IN range(0, 60)]) AS BIGINT)""".stripMargin

  private val imagePhash: Seq[Q] = Seq(
    // Near-dup image PAIRS at hamming ≤ 6 over the dHash fingerprint.
    // Plan: codegen fingerprint projection → pigeonhole bands (7 bands
    // of 9/8 bits over 60 bits — lossless for hamming ≤ 6) → band
    // equi-join → exact bit_count verify. Never all-pairs; candidate
    // mass is output-sensitive exactly like q256. The oracle is the
    // brute-force definition, so a pigeonhole recall loss would fail
    // the gate, not hide.
    Q("q285_image_phash_pairs",
      (s, d) => {
        val fps = imageDocs(s, d)
          .select(col("doc_id"),
            PerceptualHashExpressions.dhash60(col("payload")).as("phash"))
          .filter(col("phash").isNotNull)
        Dedup.simhashNearDupPairs(fps, "doc_id", "phash",
            maxHamming = 6, bits = 60)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $sqlCodes,
             |fp AS (SELECT doc_id, $sqlDhash AS fp FROM codes)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
             |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.fp, b.fp)) <= 6
             |ORDER BY id_a, id_b""".stripMargin)),

    // Per-image fingerprint audit: both hash families side by side.
    // One scan, one codegen projection, zero shuffles — the table a
    // downstream dedup/retrieval system would persist as its index.
    Q("q286_image_phash_fp",
      (s, d) =>
        imageDocs(s, d)
          .select(col("doc_id"), col("source"),
            PerceptualHashExpressions.dhash60(col("payload")).as("dhash60"),
            PerceptualHashExpressions.ahash60(col("payload")).as("ahash60"))
          .filter(col("dhash60").isNotNull)
          .orderBy("doc_id"),
      Some(s"""WITH $sqlCodes,
             |sm AS (SELECT doc_id, cs, h,
             |    list_sum([cs[((i // 6) * h // 10) * 8 + ((i % 6) * 8 // 6) + 1]
             |      FOR i IN range(0, 60)]) AS s
             |  FROM codes)
             |SELECT sm.doc_id, d.source, $sqlDhash AS dhash60,
             |  CAST(list_sum([CASE WHEN
             |      60 * cs[((i // 6) * h // 10) * 8 + ((i % 6) * 8 // 6) + 1] > s
             |    THEN (1::BIGINT << i) ELSE 0::BIGINT END
             |    FOR i IN range(0, 60)]) AS BIGINT) AS ahash60
             |FROM sm JOIN documents d ON d.doc_id = sm.doc_id
             |ORDER BY sm.doc_id""".stripMargin)))

  val all: Seq[Q] = imagePhash
}

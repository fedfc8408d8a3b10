package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions.arraySqDiff

/** Product quantization (Jégou, Douze & Schmid 2011, public knowledge):
  * vectors are split into `m` contiguous subvectors; each subvector is
  * quantized to its nearest codeword in a per-subspace codebook; queries
  * score compressed vectors by Asymmetric Distance Computation (ADC) —
  * the sum over subspaces of the exact distance from the query subvector
  * to the corpus vector's CODEWORD.
  *
  * The 100 TB story: PQ codes are `m` small ints per vector (here 4 bytes
  * versus 256 bytes of floats — a 64× compression), so the candidate scan
  * reads codes only; ADC per subspace is a join against the codebook
  * (nlist·m rows — broadcast), never against raw vectors. Codebooks in
  * production come from k-means on a sample; the operator takes any
  * codebook DataFrame, so training is pluggable.
  */
object Pq {

  /** Per-subspace codebook from explicit codeword vectors: each input row
    * (id, vector) contributes its `sub`-th subvector as codeword `id` of
    * subspace `sub`. Output: (sub, code, subvec[subDim]).
    */
  def codebook(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    vectors
      .select(col(idCol).cast("int").as("code"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(col("sub"), col("code"),
        slice(col("__v"), col("sub") * subDim + 1, lit(subDim)).as("subvec"))

  /** Encode: nearest codeword (squared L2, ties to the lowest code) per
    * (vector, subspace). Output: (idCol, sub, code) — the PQ code table.
    * The codebook is broadcast; the corpus explodes to m rows per vector
    * and aggregates straight back, so the corpus shuffles only (id, sub,
    * code) triples.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int, subDim: Int): DataFrame = {
    val sub = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(col(idCol), col("sub"),
        slice(col("__v"), col("sub") * subDim + 1, lit(subDim)).as("__sv"))
    val scored = sub.join(broadcast(cb), Seq("sub"))
      .withColumn("__d2", arraySqDiff(col("__sv"), col("subvec")))
    val w = Window.partitionBy(col(idCol), col("sub"))
      .orderBy(col("__d2").asc, col("code").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("sub"), col("code"))
  }

  /** ADC top-k: approximate distance of every encoded corpus vector to
    * ONE query vector = Σ_sub ‖q_sub − codeword(code)‖². The per-subspace
    * partial distances come from joining codes to the (broadcast)
    * codebook scored against the query; the per-vector sum folds the m
    * partials in ascending-`sub` order (sequential fp order → bit-stable
    * and oracle-mirrorable, where a shuffle-order groupBy sum is not).
    *
    * Output: (rank, idCol, adc) — top `k` by (adc, id).
    */
  def adcTopK(codes: DataFrame, idCol: String, cb: DataFrame,
      query: DataFrame, queryVecCol: String, m: Int, subDim: Int,
      k: Int): DataFrame = {
    val qsub = query
      .select(col(queryVecCol).cast("array<double>").as("__q"))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(col("sub"),
        slice(col("__q"), col("sub") * subDim + 1, lit(subDim)).as("__qv"))
    // Distance table: m × ncodes rows, scored once against the query.
    val lut = cb.join(broadcast(qsub), Seq("sub"))
      .select(col("sub"), col("code"),
        arraySqDiff(col("__qv"), col("subvec")).as("__d2"))
    val adc = codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(idCol)
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("__d2")))),
          s => s.getField("__d2")),
        lit(0.0), (acc, x) => acc + x).as("adc"))
    // Distributed top-k (TakeOrderedAndProject: per-partition partial
    // top-k, single-driver merge of k·partitions rows) — a global
    // row_number window here would funnel EVERY corpus vector through one
    // partition. The rank window then runs over just k rows.
    val top = adc.orderBy(col("adc").asc, col(idCol).asc).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("adc").asc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("adc"))
  }
}

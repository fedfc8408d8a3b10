package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction primitives (Sennrich et al.
  * 2016, public knowledge): the corpus-wide adjacent-symbol pair count
  * whose argmax is one BPE merge step.
  *
  * Shape at 100 TB: the pair domain is tiny (≤ |alphabet|²), so the
  * map-side partial aggregation collapses each task's output to at most
  * that many rows before the shuffle — the exchange moves kilobytes per
  * task regardless of corpus size, and the top-k is a
  * `TakeOrderedAndProject`, never a global sort.
  */
object Bpe {

  /** Adjacent character-pair counts within words, over the whole corpus.
    * Output: (pair, n), one row per distinct pair.
    */
  def pairCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextOps.tokens(textCol)).as("__w"))
      .filter(length(col("__w")) >= 2)
      // SQL substring(s, i, 2) with a column start index — stays inside
      // whole-stage codegen (no UDF).
      .select(explode(expr(
        "transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))

  /** The k most frequent pairs — BPE's merge candidates — with a total
    * (n DESC, pair ASC) order so the result is deterministic under ties.
    */
  def topPairs(docs: DataFrame, textCol: Column, k: Int): DataFrame =
    pairCounts(docs, textCol).orderBy(desc("n"), asc("pair")).limit(k)
}

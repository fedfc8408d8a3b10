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
}

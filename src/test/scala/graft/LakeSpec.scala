package graft

import org.apache.spark.sql.functions._

/** Plan + losslessness checks for the lake/mining batch (q142–q157). */
class LakeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned write + day predicate prunes at partition level") {
    val base = java.nio.file.Files.createTempDirectory("graft_lakespec").toString
    val out = base + "/events_by_day"
    val e = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    e.write.partitionBy("day").mode("overwrite").parquet(out)
    val firstDay = e.agg(min(col("day"))).head.getString(0)
    val pruned = spark.read.parquet(out).filter(col("day") === firstDay)
    val plan = pruned.queryExecution.executedPlan.toString
    // The day predicate must bind to partition metadata, not row data.
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains(s"day"), plan)
    // Pruned scan reads strictly fewer files than the full table has days.
    val nDays = e.select("day").distinct().count()
    assert(nDays > 1)
    val full = spark.read.parquet(out)
    assert(pruned.count() < full.count())
    assert(pruned.count() ==
      e.filter(col("day") === firstDay).count())
  }

  test("symspell delete-1 join finds exactly the brute-force lev<=1 pairs") {
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .distinct()
    val clean = vocab.filter(length(col("tok")) >= 3)
    val noisy = vocab.filter(length(col("tok")) >= 4)
      .select(expr("substring(tok, 2, length(tok))").as("noisy")).distinct()
    // Brute force: all noisy×clean pairs, exact levenshtein.
    import spark.implicits._
    val brute = noisy.crossJoin(clean)
      .filter(levenshtein(col("noisy"), col("tok")) <= 1)
      .select(col("noisy"), col("tok")).as[(String, String)]
      .collect().toSet
    val sym = Queries.byName("q152_symspell_join")(spark, sf)
      .as[(String, String)].collect().toSet
    assert(sym == brute, s"symspell=${sym.size} brute=${brute.size}")
    assert(brute.nonEmpty)
  }

  test("q251: streaming admit set equals the batch band-min rule exactly") {
    import graft.text.Dedup
    val accepted = Queries.byName("q251_stream_neardup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // Batch ground truth from the SAME banding (q52's builder): a doc is
    // admitted iff it never appears as the larger side of a banded pair.
    val rejected = Dedup.minhashLshPairs(
        graft.Tables.documents(spark, sf), "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted == (all -- rejected),
      s"accepted=${accepted.size}, expected=${(all -- rejected).size}")
    // The globally smallest doc can never collide with a smaller one.
    assert(accepted.contains(all.min))
    assert(rejected.forall(all), "band pairs only reference corpus docs")
  }
}

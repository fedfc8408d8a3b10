package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions
import graft.SparkSpec

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("ArrayDot equals the HOF dot product, including length mismatch") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 2.0), Seq(10.0, 10.0, 99.0)), // extra elements ignored
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val out = df.select(
      GraftExpressions.arrayDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(out(0).getDouble(0) == 32.0 && out(0).getDouble(1) == 32.0)
    assert(out(1).getDouble(0) == 30.0)
    assert(out(2).getDouble(0) == 0.0)
  }

  test("ArrayDot: null array yields null; works through SQL registration") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(GraftExpressions.arrayDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    GraftExpressions.register(spark)
    df.createOrReplaceTempView("ad_t")
    val viaSql = spark.sql("SELECT graft_dot(a, a) FROM ad_t").head().getDouble(0)
    assert(viaSql == 5.0)
  }

  test("ArrayDot participates in whole-stage codegen") {
    val df = spark.range(8).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), col("id").cast("double")).as("b"))
    val q = df.select(GraftExpressions.arrayDot(col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(q.agg(sum("d")).head().getDouble(0) == (0 until 8).map(i => 3.0 * i + 2.0 * i).sum)
  }

  test("WinnowFingerprints equals the SQL-expression formulation, ASCII and multi-byte") {
    import org.apache.spark.sql.graft.WinnowExpressions
    val k = 4; val w = 5
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaa",            // degenerate: one distinct gram
      "short",                      // g = 2 < w -> empty
      "abc",                        // no gram at all
      "héllo wörld — ünïcode ünïcode ünïcode padding tail", // multi-byte path
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val native = df.select(col("id"),
        explode(WinnowExpressions.winnowFingerprints(col("t"), k, w)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Reference formulation: per-position md5Hash60 grams, sliding min
    // via a window, distinct — the shape the DuckDB oracle mirrors.
    import org.apache.spark.sql.expressions.Window
    def upTo(n: org.apache.spark.sql.Column) =
      slice(sequence(lit(1), greatest(n, lit(1))), lit(1), greatest(n, lit(0)))
    val frame = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    val ref = df
      .select(col("id"), col("t"),
        explode(upTo(length(col("t")) - (k - 1))).as("pos"))
      .select(col("id"), col("pos"),
        graft.text.TextOps.md5Hash60(col("t").substr(col("pos"), lit(k))).as("h"))
      .withColumn("m", min("h").over(frame))
      .withColumn("c", count(lit(1)).over(frame))
      .filter(col("c") === w)
      .select(col("id"), col("m")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == ref)
    assert(!native.exists(_._1 >= 2L) || native.exists(_._1 == 4L)) // multi-byte doc fingerprinted
    assert(!native.exists(p => p._1 == 2L || p._1 == 3L || p._1 == 5L)) // short/empty docs empty
  }

  test("WinnowFingerprints stays inside whole-stage codegen") {
    import org.apache.spark.sql.graft.WinnowExpressions
    val df = spark.range(4).select(concat(lit("abcdefghij"),
      col("id").cast("string")).as("t"))
    val q = df.select(WinnowExpressions.winnowFingerprints(col("t"), 4, 5).as("f"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_winnow_fps"), plan)
    assert(q.select(explode(col("f"))).count() > 0)
    // SQL registration: literal k/w arguments plan the same expression.
    GraftExpressions.register(spark)
    df.createOrReplaceTempView("wf_t")
    val viaSql = spark.sql("SELECT graft_winnow_fps(t, 4, 5) AS f FROM wf_t")
    assert(viaSql.select(explode(col("f"))).count() ==
      q.select(explode(col("f"))).count())
  }

  test("MinHashSig equals the explode+groupBy aggregation formulation") {
    import org.apache.spark.sql.graft.MinHashExpressions
    import graft.text.{Dedup, TextOps}
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val coeffs = Dedup.minhashCoeffs(12, 7L)
    val native = docs.select(col("doc_id"),
        MinHashExpressions.minhashSig(col("text"), 3, coeffs).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val aggs = (0 until 12).map { i =>
      min(Dedup.universalHash(col("__h"), coeffs(i))).as(s"h$i")
    }
    val ref = docs.select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 3)).as("__s"))
      .withColumn("__h", TextOps.md5Hash60(col("__s")))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 12).map(r.getLong(_)).toVector).toMap
    assert(native == ref)
    // whitespace-variant and too-short docs behave like the groupBy shape
    val edge = Seq((1L, "a  b\tc\nd"), (2L, "one two"), (3L, ""))
      .toDF("doc_id", "text")
    val e = edge.select(col("doc_id"),
      MinHashExpressions.minhashSig(col("text"), 3, coeffs).as("sig"))
    assert(e.filter(col("sig").isNotNull).count() == 1) // only doc 1 has >= 3 tokens
  }

  test("SimHashSig stays inside whole-stage codegen; empty shingles yield null") {
    import org.apache.spark.sql.graft.SimHashExpressions
    // range-based input so ConvertToLocalRelation can't fold the
    // projection into a LocalTableScan at plan time
    val df = spark.range(2).select(col("id"),
      when(col("id") === 0,
        array(lit("a b c"), lit("b c d"), lit("c d e")))
        .otherwise(array().cast("array<string>")).as("sh"))
    val q = df.select(col("id"),
      SimHashExpressions.simhashSig(col("sh"), 32).as("fp"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_simhash") &&
      plan.contains("*(1) Project"), plan)
    val rows = q.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(0L).isDefined && rows(1L).isEmpty)
    // parity with the HOF formulation on the same shingles
    val hof = df.filter(size(col("sh")) > 0).select(col("id"),
      graft.text.Dedup.simhash(col("sh"), 32).as("fp")).head()
    assert(rows(0L).contains(hof.getLong(1)))
  }

  test("SimHashSig: null shingle elements contribute -1 per bit, no NPE") {
    import org.apache.spark.sql.graft.SimHashExpressions
    // ADVICE r10 #2: the kernel accepts ArrayType(StringType,
    // containsNull=true), so a public caller can pass null elements; the
    // replaced explode+groupBy formulation counted a null hash as -1 on
    // every bit position rather than crashing.
    val df = spark.range(3).select(col("id"),
      when(col("id") === 0, array(lit("a b c"), lit("a b c"),
          lit(null).cast("string")))
        .when(col("id") === 1, array(lit(null).cast("string")))
        .otherwise(array(lit("a b c"))).as("sh"))
    val rows = df.select(col("id"),
        SimHashExpressions.simhashSig(col("sh"), 32).as("fp"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // [s, s, null]: counts are 2(±1)−1, same sign as ±1 → equals sig([s]).
    assert(rows(0L) == rows(2L) && rows(0L).isDefined)
    // [null]: every count −1 → every bit 0.
    assert(rows(1L).contains(0L))
  }

  test("graft_winnow_fps SQL: long literals accepted, non-literals rejected") {
    import org.apache.spark.sql.AnalysisException
    GraftExpressions.register(spark)
    spark.range(2).select(concat(lit("abcdefghij"),
        col("id").cast("string")).as("t"), col("id"))
      .createOrReplaceTempView("wf_lit_t")
    // A BIGINT literal (4L) used to die with an opaque
    // ClassCastException at plan-build time (ADVICE r10 #3).
    val viaLong = spark.sql(
      "SELECT graft_winnow_fps(t, 4L, 5L) AS f FROM wf_lit_t")
    assert(viaLong.select(explode(col("f"))).count() > 0)
    // A column argument gets a named AnalysisException, not a CCE/NPE.
    val ex = intercept[AnalysisException] {
      spark.sql("SELECT graft_winnow_fps(t, id, 5) FROM wf_lit_t").collect()
    }
    assert(ex.getMessage.contains("integer literal"), ex.getMessage)
  }

  test("Hashing.hash32: engine/JVM parity, in-range over the full id range") {
    // ADVICE r10 #1: the prime-folded form must not overflow signed
    // 64-bit even at Long.MaxValue, and Spark must agree with the
    // spec-side JVM re-derivation everywhere.
    val ids = Seq(0L, 1L, 2L, 1073741788L, 1073741789L, 3470000000L,
      1L << 40, Long.MaxValue)
    val got = ids.toDF("id")
      .select(col("id"), graft.Hashing.hash32(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val h = graft.Hashing.jvmHash32(id)
      assert(got(id) == h && h >= 0L && h < 4294967296L, s"id=$id h=$h")
    }
  }

  test("MinHashSig stays inside whole-stage codegen") {
    import org.apache.spark.sql.graft.MinHashExpressions
    val coeffs = graft.text.Dedup.minhashCoeffs(12, 7L)
    val df = spark.range(4).select(concat(lit("alpha beta gamma delta "),
      col("id").cast("string")).as("t"))
    val q = df.select(MinHashExpressions.minhashSig(col("t"), 3, coeffs).as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_minhash_sig"), plan)
    assert(q.filter(col("s").isNotNull).count() == 4)
  }
}

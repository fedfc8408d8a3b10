package graft.ohlcv

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArtifactSpec extends SparkSpec {
  import spark.implicits._

  test("projection matrix round-trips through the parquet artifact (S5)") {
    val m = Encode.randomProjectionMatrix(8, 3, 99L)
    val path = Files.createTempDirectory("graft_artifact").toString + "/proj"
    Encode.saveMatrix(spark, m, path)
    val back = Encode.loadMatrix(spark, path)
    assert(back.length == 3 && back.head.length == 8)
    assert(back.flatten.toSeq == m.flatten.toSeq)
    // loaded matrix drives the encoder identically
    val df = Seq(Tuple1((1 to 8).map(_.toDouble))).toDF("v")
    val a = df.select(Encode.linearProject(col("v"), m)).as[Seq[Double]].head()
    val b = df.select(Encode.linearProject(col("v"), back)).as[Seq[Double]].head()
    assert(a == b)
  }

  test("selectNumeric keeps numeric + protected columns only (P5)") {
    val df = Seq((1L, "x", 2.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "name", "score", "ts")
    val out = TimeSeriesOps.selectNumeric(df, protect = Seq("ts"))
    assert(out.columns.toSet == Set("id", "score", "ts"))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev-only: per-phase wall breakdown of the q260 phrase-BPE loop —
  * pool job (pair agg + TakeOrdered collect) vs driver acceptance vs
  * state apply — to attribute the trainer's round floor to a NAMED
  * stage instead of guessing.
  */
object DevBpePhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    import spark.implicits._
    var cur = Tables.documents(spark, sfDir)
      .select(concat(lit(";"),
        array_join(filter(transform(graft.text.TextOps.tokens(col("text")),
          w => regexp_replace(w, "[^A-Za-z0-9]", "")),
          x => length(x) > 0), ";;"),
        lit(";")).as("enc"))
      .filter(col("enc") =!= ";;")
      .groupBy("enc").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    var tPool = 0.0; var tAcc = 0.0; var tApply = 0.0
    var rounds = 0; var tot = 0
    def sec[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    while (rounds < 96 && tot < 1024) {
      rounds += 1
      val (pool, t1) = sec {
        cur.select(col("freq"),
          split(expr("trim(BOTH ';' FROM enc)"), ";;").as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(ss) - 1), " +
              "i -> named_struct('l', element_at(ss, i), " +
              "'r', element_at(ss, i + 1)))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1024)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      }
      tPool += t1
      val (accepted, t2) = sec { PipelineQueries.phraseBpeAccept(pool, 8) }
      tAcc += t2
      if (accepted.isEmpty) { rounds = 97 }
      else {
        val mergeMap = accepted.map { case (l, r, _, _) => (l, r) -> (l + r) }.toMap
        val bc = spark.sparkContext.broadcast(mergeMap)
        val (next, t3) = sec {
          cur.select(col("enc"), col("freq")).as[(String, Long)]
            .mapPartitions { it =>
              val m = bc.value
              it.map { case (enc, freq) =>
                val syms = enc.substring(1, enc.length - 1).split(";;")
                val sb = new StringBuilder(enc.length + 2)
                var i = 0
                while (i < syms.length) {
                  val merged = if (i + 1 < syms.length) m.get((syms(i), syms(i + 1))) else None
                  merged match {
                    case Some(lr) => sb.append(';').append(lr).append(';'); i += 2
                    case None => sb.append(';').append(syms(i)).append(';'); i += 1
                  }
                }
                (sb.toString, freq)
              }
            }.toDF("enc", "freq").localCheckpoint(false)
        }
        tApply += t3
        cur = next
        tot += accepted.size
      }
    }
    println(f"== rounds=$rounds tot=$tot pool=$tPool%.1f accept=$tAcc%.1f apply=$tApply%.1f")
    spark.stop()
  }
}

package graft
object DevLeakProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q279_dsir_select", "q280_dup_tail_hill",
        "q281_neyman_split", "q282_data_constrained_plan",
        "q283_contamination_bands", "q284_tau_mixture_audit",
        // round-15 family
        "q285_image_phash_pairs", "q286_image_phash_fp",
        "q287_quality_classifier", "q288_quality_clf_agreement",
        "q289_stream_quality_gate",
        // round-16 family
        "q293_release_manifest_multimodal", "q294_video_phash_pairs",
        "q295_stream_dsir_gate", "q296_dedup_policy_audit")
    names.foreach { n =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(n)(spark, dir).count()
      // localCheckpoint blocks are reclaimed by the ContextCleaner once
      // the result is dereferenced (the documented Dedup/nbDocScores
      // pattern) — give the cleaner a GC cycle so the probe measures
      // TRUE CacheManager leaks, not cleaner latency (round-15: q280's
      // CC labels and q288's NB checkpoint flagged spuriously).
      System.gc()
      Thread.sleep(1000)
      val after = spark.sparkContext.getPersistentRDDs.keySet
      println(s"== $n leaked=${(after -- before).size}")
    }
    spark.stop()
  }
}

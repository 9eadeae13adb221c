package graft.tools

/** Steady-state query timer: runs each named query three times in one
  * session and prints all three wall times (first pays codegen; the tail
  * shows cache/persist steady state — and, on this host, the noise band).
  * Usage: runMain graft.tools.TimeNew [sfDir] [queryName...]
  */
object TimeNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_doc_minhash_pairs", "q_doc_dup_clusters", "q_doc_cluster_dedup",
        "q_embed_ivf_probe", "q_embed_ivf_topk")
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s ${times.map(t => f"$t%.2f").mkString("  ")}")
    }
    spark.stop()
  }
}

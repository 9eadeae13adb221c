package graft.tools

/** Ad-hoc query timer: `runMain graft.tools.TimeQ [sfDir] [q1 q2 ...]` —
  * two reps per query (cold + warm) so codegen/footer-cache effects are
  * visible separately from steady-state cost on this noisy shared host.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder(master = "local[32]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(s, d).count()
        println(f"[timeq] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    s.stop()
  }
}

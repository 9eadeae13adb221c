package graft.tools
import graft.{Bench, GraftSession}
import graft.pipeline.{Pipeline, PipelineRunner}

/** One profiled canonical-pipeline run (SPARK_GRAFT_PROFILE phase timings). */
object RunProfile {
  def main(args: Array[String]): Unit = {
    val input = "/root/repo/data/bench/transcripts_8000000"
    val out = "/dev/shm/graft_prof_out"
    val s = GraftSession.builder(master = "local[32]")
      .config("spark.local.dir", "/dev/shm/graft_spark_local")
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      Bench.deleteRec(out)
      val t0 = System.nanoTime()
      val r = PipelineRunner.run(s, Pipeline.Canonical, input, out, groupSize = 1000)
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=${r.rowsIn}")
    }
    s.stop()
  }
}

package graft.tools

import graft.{Bench, GraftSession}
import graft.pipeline.{Pipeline, PipelineRunner}

/** One warmed, phase-profiled pipeline run per requested parallelism —
  * `SPARK_GRAFT_PROFILE=1 sbt "runMain graft.tools.ProfileRun 8 32"`.
  */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.toSeq else Seq("8", "32")
    val input = s"/root/repo/data/bench/transcripts_${Bench.BenchTurns}"
    Bench.ensureBenchTable(input)
    levels.foreach { n =>
      val s = GraftSession.builder(master = s"local[$n]")
        .config("spark.local.dir", "/dev/shm/graft_spark_local")
        .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        Bench.deleteRec("/dev/shm/graft_profile_out")
        PipelineRunner.run(s, Pipeline.Canonical, input, "/dev/shm/graft_profile_out",
          groupSize = 1000) // warmup
        Bench.deleteRec("/dev/shm/graft_profile_out")
        System.err.println(s"[profile] ===== local[$n] timed run =====")
        val t0 = System.nanoTime()
        val r = PipelineRunner.run(s, Pipeline.Canonical, input,
          "/dev/shm/graft_profile_out", groupSize = 1000)
        System.err.println(
          f"[profile] local[$n] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s, rows ${r.rowsIn}")
      } finally s.stop()
    }
  }
}

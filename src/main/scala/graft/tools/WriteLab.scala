package graft.tools

import org.apache.spark.sql.DataFrame

import graft.{Bench, GraftSession}
import graft.pipeline.Pipeline

/** Write-phase experiment matrix: the canonical pipeline spends ~3/4 of its
  * bench wall in the single-pass route-partitioned parquet write
  * (RunProfile), so codec / dictionary / row-group / layout choices are the
  * dominant throughput lever. Each variant runs the SAME tagged stream
  * (transform is pipelined into the write tasks) best-of-N on tmpfs;
  * results feed the BASELINE.md codec table and the Bench defaults.
  */
object WriteLab {

  case class Variant(name: String, opts: Map[String, String] = Map.empty,
                     confs: Map[String, String] = Map.empty,
                     sortCols: Seq[String] = Nil)

  def main(args: Array[String]): Unit = {
    val turns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "8000000").toLong
    val input = s"/root/repo/data/bench/transcripts_$turns"
    val out = "/dev/shm/graft_writelab_out"
    val reps = sys.env.getOrElse("SPARK_GRAFT_LAB_REPS", "3").toInt
    Bench.ensureBenchTable(input)

    val s = GraftSession.builder(master = "local[32]")
      .config("spark.local.dir", "/dev/shm/graft_spark_local")
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val transform = Pipeline.compile(Pipeline.Canonical, s)
    val base = s.read.option("basePath", input).parquet(input)

    // round 1 (broad matrix, 3 reps) found: dictionary encoding is the
    // bottleneck — dict-off ~2.7-2.9 s vs dict-on ~3.4-3.5 s stable-state,
    // for only +0.02 GB (the high-cardinality text/conv_id columns build
    // dictionaries that overflow and fall back, pure overhead). lz4 edged
    // snappy. Round 2 (below) confirms under more reps and tries PER-COLUMN
    // dictionary control: enums (role/tool/severity_text/team...) keep
    // dictionaries, text/conv_id drop them.
    val noDictCols = Seq("text", "conv_id", "ts", "attrs_json")
    val selective = noDictCols.map(c =>
      s"parquet.enable.dictionary#$c" -> "false").toMap
    // round 3 tiebreak: zstd-1 halves the output size at equal-or-better
    // speed than lz4 — decide dictionaries under zstd and confirm the final
    // choice against the round-2 leaders.
    val zstd1sel = selective + ("compression" -> "zstd")
    val zstd1conf = Map("parquet.compression.codec.zstd.level" -> "1")
    // round 5: does a compression-friendly row order inside each write task
    // (grouping same-template texts) buy more than the sort costs?
    val variants = Seq(
      Variant("zstd1_seldict (ship)", opts = zstd1sel, confs = zstd1conf),
      Variant("zstd1_seldict_sortconv", opts = zstd1sel, confs = zstd1conf,
        sortCols = Seq("conv_id", "turn_idx")),
      Variant("zstd1_seldict_sortrole", opts = zstd1sel, confs = zstd1conf,
        sortCols = Seq("role", "tool")),
      Variant("zstd1_seldict (ship B)", opts = zstd1sel, confs = zstd1conf),
      Variant("zstd1_seldict_sortconvB", opts = zstd1sel, confs = zstd1conf,
        sortCols = Seq("conv_id", "turn_idx"))
    )

    def dirBytes(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(dirBytes).sum else f.length()

    println(f"${"variant"}%-22s ${"best_s"}%8s ${"all_s"}%-22s ${"gb"}%6s ${"mturn/s"}%8s")
    variants.foreach { v =>
      val tagged0: DataFrame = transform(base)
      val tagged =
        if (v.sortCols.nonEmpty)
          tagged0.sortWithinPartitions(v.sortCols.head, v.sortCols.tail: _*)
        else tagged0
      val times = (1 to reps).map { _ =>
        Bench.deleteRec(out)
        v.confs.foreach { case (k, c) => s.conf.set(k, c) }
        val t0 = System.nanoTime()
        var w = tagged.write.mode("overwrite")
          .option("maxRecordsPerFile", 5000000L)
        v.opts.foreach { case (k, o) => w = w.option(k, o) }
        w.partitionBy("route", "year", "month", "day", "hour")
          .parquet(s"$out/sinks")
        val secs = (System.nanoTime() - t0) / 1e9
        v.confs.keys.foreach(k => s.conf.unset(k))
        secs
      }
      val best = times.min
      val gb = dirBytes(new java.io.File(out)) / 1e9
      println(f"${v.name}%-22s $best%8.2f ${times.map(t => f"$t%.2f").mkString(",")}%-22s $gb%6.2f ${turns / best / 1e6}%8.2f")
    }
    s.stop()
  }
}

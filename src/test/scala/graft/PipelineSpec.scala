package graft

import org.apache.spark.sql.functions._
import graft.model.Transcripts
import graft.pipeline.{Manifest, Pipeline, PipelineRunner}

class PipelineSpec extends SparkTestBase {
  import Pipeline._

  test("validation: unknown operator is a plan-time error") {
    val bad = Canonical.copy(operators = Seq(OperatorSpec("no_such_op")))
    assert(validate(bad).left.exists(_.exists(_.contains("unknown operator"))))
  }

  test("validation: missing required parameter is rejected (CheckParameters parity)") {
    val bad = Canonical.copy(operators = Seq(OperatorSpec("filter")))
    assert(validate(bad).left.exists(_.exists(_.contains("missing required"))))
  }

  test("validation: sink bound to undefined route is rejected (routereceiver.go:46)") {
    val bad = Canonical.copy(sinks = Seq("sink_nowhere"))
    assert(validate(bad).left.exists(_.exists(_.contains("undefined route"))))
  }

  test("validation: defaults applied (ApplyDefaults parity)") {
    val spec = Canonical.copy(operators = Seq(
      OperatorSpec("sample", Map("drop_ratio" -> "0.0"))))
    val v = validate(spec).toOption.get
    assert(v.operators.head.params("condition") == "true")
  }

  test("compiled pipeline == hand-built plan on the same input") {
    val t = Transcripts.fromEvents(spark, sfDir)
    val compiled = Pipeline.compile(Canonical, spark)(t)
    val hand = graft.enrich.EnrichOps.lookupEnrich(spark,
      graft.route.Router.tagged(t))
    val a = compiled.groupBy(col("route")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = hand.groupBy(col("route")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}

/** Checkpointed resume: a killed run must not re-route committed partitions
  * (blobconsume/checkpoint.go:49-68 parity) and re-runs must not double-write.
  */
class ResumeSpec extends SparkTestBase {

  test("resume skips committed partitions and never double-writes") {
    val base = java.nio.file.Files.createTempDirectory("resume").toString
    val input = s"$base/in"
    val out = s"$base/out"
    Transcripts.writePartitioned(
      Transcripts.generate(spark, nTurns = 20000, nConvs = 50), input)

    val parts = PipelineRunner.discoverPartitions(spark, input)
    assert(parts.size > 1, s"need multiple hour partitions, got ${parts.size}")

    // full run → baseline counts
    val full = PipelineRunner.run(spark, Pipeline.Canonical, input, out)
    assert(full.partitionsProcessed == parts.size)
    val fullCounts = full.sinkCounts

    // simulate a kill: wipe outputs, pre-commit HALF the partitions
    Bench.deleteRec(out)
    val manifest = new Manifest(s"$out/_manifest")
    val (done, todo) = parts.splitAt(parts.size / 2)
    done.foreach { p =>
      manifest.commit(manifest.PartitionEntry(
        p.replaceAll("[^A-Za-z0-9=_-]", "_"), "committed", 0L, Map.empty, Seq(p), 0L))
    }

    val resumed = PipelineRunner.run(spark, Pipeline.Canonical, input, out)
    assert(resumed.partitionsSkipped == done.size)
    assert(resumed.partitionsProcessed == todo.size)

    // idempotence: a second resume does nothing
    val again = PipelineRunner.run(spark, Pipeline.Canonical, input, out)
    assert(again.partitionsProcessed == 0)
    assert(again.partitionsSkipped == parts.size)

    // the resumed run wrote only the todo partitions' rows (no double-write):
    // sink totals over todo partitions must equal full-run totals minus the
    // committed partitions' share
    val sinkRows = Pipeline.Canonical.sinks.map { s =>
      val dir = new java.io.File(s"$out/$s")
      s -> (if (dir.exists())
        spark.read.option("basePath", s"$out/$s").parquet(s"$out/$s").count()
      else 0L)
    }.toMap
    assert(sinkRows.values.sum == resumed.rowsIn)
    assert(resumed.rowsIn < fullCounts.values.sum)
    Bench.deleteRec(base)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.model.Transcripts
import graft.pipeline.{Manifest, Pipeline, PipelineRunner, RandomFailure}

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

  test("transform (OTTL), lookup_csv and batch operator types compile and run") {
    import graft.enrich.EnrichOps
    val csv = EnrichOps.lookupFixture("pipeline_lookup.csv", "role,team,cost_center",
      EnrichOps.RoleLookup)
    val spec = Canonical.copy(operators = Seq(
      OperatorSpec("severity_tag"), // route predicates need severity_number
      OperatorSpec("transform", Map(
        "statements" -> "set(env, 'prod') where role == 'assistant'")),
      OperatorSpec("lookup_csv", Map("csv" -> csv, "field" -> "role")),
      OperatorSpec("batch")))
    val out = Pipeline.compile(spec, spark)(Transcripts.fromEvents(spark, sfDir))
    val rows = out.filter(col("role").isin("assistant", "user"))
      .select(col("role"), col("env"), col("team")).distinct().collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("assistant") == ("prod", "ml"))
    assert(rows("user") == (null, "external"))
  }

  test("batchprocessor cap: no written file exceeds the spec's max_records") {
    val base = java.nio.file.Files.createTempDirectory("batchcap").toString
    Transcripts.writePartitioned(
      Transcripts.generate(spark, nTurns = 6000, nConvs = 20), base + "/in")
    // the cap comes from the PIPELINE SPEC's batch operator, not a run() flag
    val spec = Canonical.copy(operators = Canonical.operators :+
      OperatorSpec("batch", Map("max_records" -> "500")))
    PipelineRunner.run(spark, spec, base + "/in", base + "/out")
    val files = spark.read.option("basePath", base + "/out/sinks")
      .parquet(base + "/out/sinks")
      .select(input_file_name().as("f")).groupBy(col("f")).count()
      .select(col("count")).collect().map(_.getLong(0))
    assert(files.nonEmpty && files.max <= 500L,
      s"file over cap: ${files.max}")
    assert(files.length > 6000 / 500, "cap must split large partitions")
    Bench.deleteRec(base)
  }

  test("textual config parses, validates, and compiles (EP1 parity)") {
    val spec = graft.pipeline.PipelineConfig.load(
      """# canonical pipeline
        |pipeline: canonical_from_text
        |operator: severity_tag
        |operator: lookup_enrich
        |operator: sample drop_ratio=0.0
        |route: sink_errors severity_number >= 17
        |route: sink_tools tool != ''
        |route: sink_default true
        |sink: sink_errors
        |sink: sink_tools
        |sink: sink_default
        |""".stripMargin)
    assert(spec.name == "canonical_from_text")
    assert(spec.operators(2).params("condition") == "true") // default applied
    // compiles to the same routed counts as the programmatic canonical spec
    val t = graft.model.Transcripts.fromEvents(spark, sfDir)
    val fromText = Pipeline.compile(spec, spark)(t)
      .groupBy(col("route")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val programmatic = Pipeline.compile(Canonical, spark)(t)
      .groupBy(col("route")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromText == programmatic)
    // bad configs fail at plan time
    intercept[IllegalArgumentException] {
      graft.pipeline.PipelineConfig.load("operator: bogus\nroute: r true\nsink: r")
    }
  }

  test("time-range scans prune to the requested hour partitions (rehydration parity)") {
    val base = java.nio.file.Files.createTempDirectory("prune").toString
    graft.model.Transcripts.writePartitioned(
      graft.model.Transcripts.generate(spark, nTurns = 10000, nConvs = 20), base)
    val pruned = spark.read.parquet(base)
      .filter(col("year") === 2024 && col("month") === 1 &&
        col("day") === 1 && col("hour") === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(hour#"),
      "hour filter must be a partition filter, not a data filter")
    // pruned scan reads strictly fewer files than the full scan
    val totalParts = graft.pipeline.PipelineRunner.discoverPartitions(spark, base).size
    assert(totalParts > 1)
    assert(pruned.count() > 0)
    Bench.deleteRec(base)
  }

  test("observe tap counts rows without an extra job") {
    val t = graft.model.Transcripts.fromEvents(spark, sfDir)
    val tapped = graft.agg.AggOps.withThroughputTap(t)
    val n = tapped.collect().length.toLong // action on THIS plan, not a new count() plan
    val m = tapped.queryExecution.observedMetrics("throughput")
    assert(m.getAs[Long]("log_count") == n)
    assert(m.getAs[Long]("log_raw_bytes") > 0)
  }

  test("persist and partitioned fan-out strategies produce identical sink counts") {
    val base = java.nio.file.Files.createTempDirectory("strat").toString
    graft.model.Transcripts.writePartitioned(
      graft.model.Transcripts.generate(spark, nTurns = 8000, nConvs = 20), s"$base/in")
    val a = graft.pipeline.PipelineRunner.run(spark, Pipeline.Canonical,
      s"$base/in", s"$base/outA", strategy = "partitioned")
    val b = graft.pipeline.PipelineRunner.run(spark, Pipeline.Canonical,
      s"$base/in", s"$base/outB", strategy = "persist")
    assert(a.sinkCounts == b.sinkCounts)
    assert(a.rowsIn == 8000)
    Bench.deleteRec(base)
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
      val path = PipelineRunner.sinkPath(out, s)
      val dir = new java.io.File(path)
      s -> (if (dir.exists())
        spark.read.option("basePath", path).parquet(path).count()
      else 0L)
    }.toMap
    assert(sinkRows.values.sum == resumed.rowsIn)
    assert(resumed.rowsIn < fullCounts.values.sum)
    Bench.deleteRec(base)
  }

  test("random failure: config validation, deterministic schedule, retry re-draws") {
    intercept[IllegalArgumentException](RandomFailure(failureRate = 1.5))
    intercept[IllegalArgumentException](RandomFailure(errorMessage = ""))
    val rf = RandomFailure(0.25, seed = "graft")
    // frequency ≈ rate over many batch ids (hash-uniform; loose band)
    val hits = (1 to 2000).count(i => rf.draw(s"b$i") < 0.25)
    assert(hits > 380 && hits < 620, s"got $hits")
    // deterministic per (batch, attempt); retries RE-DRAW
    assert(rf.draw("b1", 0) == rf.draw("b1", 0))
    assert((1 to 20).exists(a => (rf.draw("b1", a) < 0.25) != (rf.draw("b1", 0) < 0.25)))
    // rate 0 never throws; rate 1 always does
    RandomFailure(0.0).check("x")
    intercept[RuntimeException](RandomFailure(1.0).check("x"))
    // the Scala draw and the q_random_failure threshold compare agree
    // (2^58 is 0.25 × 2^60 exactly, so double and long compares coincide)
    (1 to 100).foreach { i =>
      val id = s"2024-01-01-$i"
      assert((rf.draw(id, 0) < 0.25) ==
        (RandomFailure.hash60(s"graft|$id|0") < 288230376151711744L))
    }
  }

  test("random failure: retries through the manifest plane complete the run, no double-writes") {
    val base = java.nio.file.Files.createTempDirectory("rfail").toString
    val input = s"$base/in"
    Transcripts.writePartitioned(
      Transcripts.generate(spark, nTurns = 20000, nConvs = 50), input)
    // baseline without injection
    val full = PipelineRunner.run(spark, Pipeline.Canonical, input, s"$base/ref",
      groupSize = 2)
    // injected: each attempt fails at the first unlucky group; committed
    // groups survive, the retry resumes past them and re-draws
    val rf = RandomFailure(0.5, seed = "retry-test")
    var attempt = 0
    var done: Option[PipelineRunner.RunReport] = None
    var failures = 0
    while (done.isEmpty && attempt < 60) {
      try done = Some(PipelineRunner.run(spark, Pipeline.Canonical, input,
        s"$base/out", groupSize = 2, failure = Some(rf), attempt = attempt))
      catch {
        case e: RuntimeException if e.getMessage == "random failure" =>
          failures += 1; attempt += 1
      }
    }
    assert(done.nonEmpty, s"never completed after $attempt attempts")
    assert(failures > 0, "fixture must exercise at least one injected failure")
    val refRows = Pipeline.Canonical.sinks.map(s =>
      spark.read.parquet(PipelineRunner.sinkPath(s"$base/ref", s)).count()).sum
    val outRows = Pipeline.Canonical.sinks.map(s =>
      spark.read.parquet(PipelineRunner.sinkPath(s"$base/out", s)).count()).sum
    assert(outRows == refRows) // exactly-once across all failed attempts
    Bench.deleteRec(base)
  }

  test("mid-group crash: stale partial sink files of an UNCOMMITTED partition are replaced, not duplicated") {
    // the complement of the resume test above: there the outputs were wiped
    // before pre-committing; here a kill strikes AFTER the sink write but
    // BEFORE the manifest commit, so the uncommitted partition's sink files
    // (plus an injected extra "partial" part file) are still on disk when
    // the rerun arrives — dynamic partition overwrite must REPLACE those
    // leaf dirs, never append to them
    val base = java.nio.file.Files.createTempDirectory("crash").toString
    val input = s"$base/in"
    val out = s"$base/out"
    Transcripts.writePartitioned(
      Transcripts.generate(spark, nTurns = 20000, nConvs = 50), input)
    val parts = PipelineRunner.discoverPartitions(spark, input)
    assert(parts.size > 1)

    val full = PipelineRunner.run(spark, Pipeline.Canonical, input, out)
    def sinkCountsOnDisk(): Map[String, Long] =
      spark.read.option("basePath", s"$out/sinks").parquet(s"$out/sinks")
        .groupBy(col("route")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val baseline = sinkCountsOnDisk()
    assert(baseline.values.sum == full.sinkCounts.values.sum)

    // uncommit ONE partition (manifest only — sink files stay on disk)
    val victim = parts.last
    val manifest = new Manifest(s"$out/_manifest")
    manifest.clear()
    parts.init.foreach { p =>
      manifest.commit(manifest.PartitionEntry(
        p.replaceAll("[^A-Za-z0-9=_-]", "_"), "committed", 0L, Map.empty,
        Seq(p), 0L))
    }
    // inject a partial extra part file into each of the victim's leaf dirs
    // (a killed writer's orphaned output): a COPY of a real part file, so
    // if the rerun fails to replace the dir the duplicate rows are counted
    val sinksRoot = java.nio.file.Paths.get(s"$out/sinks")
    val walk = java.nio.file.Files.walk(sinksRoot)
    val leaves = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    try walk.forEach { p =>
      if (p.toString.endsWith(".parquet") && p.toString.contains(victim))
        leaves += p
    } finally walk.close()
    assert(leaves.nonEmpty, s"no sink files under $victim")
    leaves.foreach { p =>
      java.nio.file.Files.copy(p,
        p.getParent.resolve("part-99999-orphan.c000.parquet"))
    }
    val inflated = sinkCountsOnDisk()
    assert(inflated.values.sum > baseline.values.sum) // injection is visible

    // rerun: only the victim is todo; its leaf dirs must come back EXACT
    val resumed = PipelineRunner.run(spark, Pipeline.Canonical, input, out)
    assert(resumed.partitionsProcessed == 1 &&
      resumed.partitionsSkipped == parts.size - 1)
    assert(sinkCountsOnDisk() == baseline,
      "rerun did not replace the uncommitted partition's stale sink files")
    Bench.deleteRec(base)
  }

  test("snapshot payload budget: per-record window is bucket-partitioned (no global sort)") {
    import spark.implicits._
    val rows = (0 until 100).map(i =>
      (s"c$i", i, "user", "search hit " + ("x" * 40), "", s"2024-01-10 ${10 + i % 10}:00:${i % 60}"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "s")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val out = graft.plugins.Snapshot.search(rows, "search",
      "2024-01-09 00:00:00", maxPayloadBytes = 1000)
    // parity: equals the naive global running-sum prefix
    val naive = rows.sort("ts", "conv_id", "turn_idx").collect()
      .scanLeft(0L)((acc, r) => acc + r.getAs[String]("text").getBytes("UTF-8").length)
      .tail.zip(rows.sort("ts", "conv_id", "turn_idx").collect())
      .takeWhile(_._1 <= 1000).map(_._2.getAs[String]("conv_id")).toSet
    assert(out.collect().map(_.getAs[String]("conv_id")).toSet == naive)
    // plan shape: every per-record window partitions by the bucket key —
    // the only SinglePartition exchange feeds the tiny per-bucket aggregate
    val plan = out.queryExecution.executedPlan.toString
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty)
    val perRecord = windowSpecs.filter(_.contains("conv_id"))
    assert(perRecord.nonEmpty && perRecord.forall(_.contains("__b")),
      s"per-record window not bucket-partitioned:\n$plan")
  }

  test("manifest snapshot log: lineage sequence + as-of time travel") {
    val base = java.nio.file.Files.createTempDirectory("snap").toString
    val m = new Manifest(base)
    Seq("p1", "p2", "p3").foreach { p =>
      m.commit(m.PartitionEntry(p, "committed", 1L, Map("out" -> 1L), Seq(p), 0L))
    }
    assert(m.currentSnapshot() == 3L)
    assert(m.committedPartitionsAsOf(1L) == Set("p1"))
    assert(m.committedPartitionsAsOf(2L) == Set("p1", "p2"))
    assert(m.committedPartitionsAsOf(m.currentSnapshot()) == Set("p1", "p2", "p3"))
    // as-of matches the live view at head
    assert(m.committedPartitionsAsOf(3L).map(_.replaceAll("[^A-Za-z0-9=_-]", "_"))
      == m.committedPartitions())
    // clear() resets the snapshot lineage WITH the partition state
    m.clear()
    assert(m.currentSnapshot() == 0L && m.committedPartitions().isEmpty)
    m.commit(m.PartitionEntry("p9", "committed", 1L, Map("out" -> 1L), Seq("p9"), 0L))
    assert(m.currentSnapshot() == 1L)
    assert(m.committedPartitionsAsOf(1L) == Set("p9"))
    Bench.deleteRec(base)
  }

  test("manifest heals a commit/snapshot split: partition committed, lineage missing") {
    val base = java.nio.file.Files.createTempDirectory("snapheal").toString
    val m = new Manifest(base)
    m.commit(m.PartitionEntry("p1", "committed", 1L, Map("out" -> 1L), Seq("f1"), 0L))
    m.commit(m.PartitionEntry("p2", "committed", 2L, Map("out" -> 2L), Seq("f2"), 0L))
    // simulate a kill between the partition write and appendSnapshot():
    // delete p2's lineage entry, keep its partition file
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$base/_snapshots/2.json"))
    // a fresh Manifest reconciles: p2 re-enters the lineage
    val m2 = new Manifest(base)
    assert(m2.committedPartitionsAsOf(m2.currentSnapshot()) == Set("p1", "p2"))
    assert(m2.currentSnapshot() == 2L) // healed entry fills the lineage head
    // idempotent: constructing again appends nothing
    val m3 = new Manifest(base)
    assert(m3.currentSnapshot() == 2L)
    Bench.deleteRec(base)
  }

  test("paged search: a different spec against the same storeDir rebuilds, no stale reuse") {
    import graft.pipeline.PagedSearch
    val base = java.nio.file.Files.createTempDirectory("pagedfp").toString
    val t = Transcripts.generate(spark, nTurns = 500, nConvs = 5)
    val specA = PagedSearch.SearchSpec("e", "2024-01-01T00:00", "2024-12-31T00:00",
      eventBatchSize = 100)
    val rA = PagedSearch.run(spark, t, specA, s"$base/store", s"$base/outA",
      new Manifest(s"$base/_mA"))
    // same storeDir, different query: must export ITS OWN results
    val specB = specA.copy(query = "no_such_substring_zzz")
    val rB = PagedSearch.run(spark, t, specB, s"$base/store", s"$base/outB",
      new Manifest(s"$base/_mB"))
    assert(rA.rowsExported > 0 && rB == PagedSearch.RunResult(0, 0, 0),
      s"stale store reused across specs: $rA vs $rB")
    Bench.deleteRec(base)
  }

  test("paged search: zero-match search returns an empty result, not an abort") {
    import graft.pipeline.PagedSearch
    val base = java.nio.file.Files.createTempDirectory("paged0").toString
    val t = Transcripts.generate(spark, nTurns = 100, nConvs = 5)
    val spec = PagedSearch.SearchSpec("no_such_substring_zzz",
      "2024-01-01T00:00", "2024-12-31T00:00", eventBatchSize = 10)
    val r = PagedSearch.run(spark, t, spec, s"$base/store", s"$base/out",
      new Manifest(s"$base/_manifest"))
    assert(r == PagedSearch.RunResult(0, 0, 0))
    Bench.deleteRec(base)
  }

  test("paged search offsets: per-record window is bucket-partitioned (no global sort)") {
    import graft.pipeline.PagedSearch
    val t = Transcripts.generate(spark, nTurns = 1000, nConvs = 10)
    val spec = PagedSearch.SearchSpec("e", "2024-01-01T00:00", "2024-12-31T00:00",
      eventBatchSize = 100)
    val plan = PagedSearch.pagedResults(t, spec).queryExecution.executedPlan.toString
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    // the per-record offset window orders by (ts, conv_id, turn_idx); the
    // fixture generator's own window (conv_id, gen_id) is exempt
    val perRecord = windowSpecs.filter(w => w.contains("conv_id") && w.contains("ts"))
    assert(perRecord.nonEmpty && perRecord.forall(_.contains("__b")),
      s"offset window not bucket-partitioned:\n$plan")
  }

  test("paged search: kill mid-run, resume skips completed pages, no double export") {
    import graft.pipeline.PagedSearch
    val base = java.nio.file.Files.createTempDirectory("paged").toString
    val t = Transcripts.generate(spark, nTurns = 5000, nConvs = 20)
    val spec = PagedSearch.SearchSpec("e", "2024-01-01T00:00", "2024-12-31T00:00",
      eventBatchSize = 200)
    val manifest = new Manifest(s"$base/_manifest")

    // kill after 2 exported pages
    val boom = intercept[RuntimeException] {
      PagedSearch.run(spark, t, spec, s"$base/store", s"$base/out", manifest,
        failAfterPages = 2)
    }
    assert(boom.getMessage.contains("injected failure"))
    assert(manifest.committedPartitions().size == 2)
    val afterKill = spark.read.parquet(s"$base/out").count()

    // resume: completed pages skip, the rest export exactly once
    val resumed = PagedSearch.run(spark, t, spec, s"$base/store", s"$base/out", manifest)
    assert(resumed.pagesSkipped == 2)
    val total = spark.read.parquet(s"$base/out")
    val expected = PagedSearch.pagedResults(t, spec)
    assert(total.count() == expected.count() && total.count() > afterKill)
    // no page exported twice
    assert(total.groupBy("page").count().collect()
      .forall(_.getLong(1) <= spec.eventBatchSize))
    // offsets are a dense 0..n-1 sequence in (ts, conv, turn) order
    val offs = total.select("__offset").collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == (0L until offs.length).toSeq)
    Bench.deleteRec(base)
  }
}

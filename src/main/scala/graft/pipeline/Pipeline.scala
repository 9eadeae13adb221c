package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.EnrichOps
import graft.model.Transcripts
import graft.route.Router

/** Pipeline spec + compiler: the engine's analogue of the collector's
  * config → component graph lifecycle (SURVEY §3 EP1/EP2).
  *
  * A spec is validated at plan time — unknown operators, missing required
  * params, and undefined routes are plan-time errors, exactly as the
  * reference rejects configs in Validate() (logcountprocessor/config.go:55-73)
  * and undefined routes in routereceiver (receiver.go:46). Plugin-parameter
  * defaulting mirrors pluginreceiver's ApplyDefaults/CheckParameters
  * (receiver/pluginreceiver/plugin.go:85-101, 146-266).
  */
object Pipeline {

  // ---------------------------------------------------------------------
  // Spec model (the YAML-ish job config, as typed case classes)
  // ---------------------------------------------------------------------
  case class ParamSpec(name: String, required: Boolean = false,
                       default: Option[String] = None,
                       supported: Option[Seq[String]] = None)

  case class OperatorSpec(opType: String, params: Map[String, String] = Map.empty)

  case class RouteSpec(name: String, predicateSql: String)

  case class PipelineSpec(name: String,
                          operators: Seq[OperatorSpec],
                          routes: Seq[RouteSpec],
                          sinks: Seq[String])

  /** Registry of operator types and their parameter schemas — the factory
    * set a build manifest would declare (manifests/observIQ/manifest.yaml).
    */
  val OperatorParams: Map[String, Seq[ParamSpec]] = Map(
    "severity_tag" -> Seq.empty,
    "lookup_enrich" -> Seq.empty,
    "mask" -> Seq(ParamSpec("rules", default = Some("all"))),
    "filter" -> Seq(ParamSpec("drop_where", required = true)),
    "sample" -> Seq(
      ParamSpec("drop_ratio", required = true),
      ParamSpec("condition", default = Some("true"))),
    "add" -> Seq(ParamSpec("field", required = true), ParamSpec("value", required = true)),
    "retain" -> Seq(ParamSpec("fields", required = true)),
    // transformprocessor: OTTL statement list, ';'-separated
    "transform" -> Seq(ParamSpec("statements", required = true)),
    // lookupprocessor: CSV file source (header-driven), context + field
    "lookup_csv" -> Seq(
      ParamSpec("csv", required = true),
      ParamSpec("context", default = Some("attributes"),
        supported = Some(Seq("body", "attributes", "resource.attributes"))),
      ParamSpec("field", required = true)),
    // batchprocessor: output batch sizing (send_batch_size analogue —
    // maxRecordsPerFile caps file size; coalesce bounds task counts)
    "batch" -> Seq(ParamSpec("max_records", default = Some("5000000"))))

  /** CheckParameters parity: unknown op, missing required, unsupported value
    * are all plan-time validation errors; defaults are applied here.
    */
  def validate(spec: PipelineSpec): Either[Seq[String], PipelineSpec] = {
    val errs = scala.collection.mutable.ListBuffer[String]()
    val withDefaults = spec.operators.map { op =>
      OperatorParams.get(op.opType) match {
        case None =>
          errs += s"unknown operator type '${op.opType}'"
          op
        case Some(params) =>
          params.foreach { p =>
            if (p.required && !op.params.contains(p.name))
              errs += s"${op.opType}: missing required parameter '${p.name}'"
            p.supported.foreach { sup =>
              op.params.get(p.name).filterNot(sup.contains).foreach { v =>
                errs += s"${op.opType}: unsupported value '$v' for '${p.name}'"
              }
            }
          }
          val defaults = params.collect {
            case p if p.default.isDefined && !op.params.contains(p.name) =>
              p.name -> p.default.get
          }
          op.copy(params = op.params ++ defaults)
      }
    }
    if (spec.routes.isEmpty) errs += "pipeline requires at least one route"
    val routeNames = spec.routes.map(_.name).toSet
    spec.sinks.filterNot(routeNames.contains).foreach { s =>
      errs += s"sink '$s' bound to undefined route" // routereceiver.go:46 parity
    }
    if (errs.nonEmpty) Left(errs.toList) else Right(spec.copy(operators = withDefaults))
  }

  /** Compile the validated spec into a DataFrame transform. Operators fold
    * left→right exactly like the collector's consumer chain; the result is
    * ONE Catalyst plan (the interpreter hops of the reference disappear into
    * whole-stage codegen).
    */
  def compile(spec: PipelineSpec, spark: SparkSession): DataFrame => DataFrame = {
    validate(spec) match {
      case Left(errs) =>
        throw new IllegalArgumentException(
          s"invalid pipeline '${spec.name}': ${errs.mkString("; ")}")
      case Right(v) =>
        (input: DataFrame) => {
          val afterOps = v.operators.foldLeft(input) { (df, op) =>
            op.opType match {
              case "severity_tag" =>
                df.withColumn("severity_number", Router.rowSeverity())
              case "lookup_enrich" => EnrichOps.lookupEnrich(spark, df)
              case "mask" => df.withColumn("text", EnrichOps.maskString(col("text")))
              case "filter" => // false-on-error contract lives in filterOp
                graft.parse.ParseOps.filterOp(df, expr(op.params("drop_where")))
              case "sample" =>
                graft.agg.AggOps.sample(df, expr(op.params("condition")),
                  op.params("drop_ratio").toDouble)
              case "add" => df.withColumn(op.params("field"), expr(op.params("value")))
              case "retain" => df.select(op.params("fields").split(",")
                .toIndexedSeq.map(f => col(f.trim)): _*)
              case "transform" =>
                graft.expr.Ottl(graft.expr.Ottl.splitStatements(
                  op.params("statements")), df.columns.toSet)(df)
              case "lookup_csv" =>
                EnrichOps.lookupCsv(spark, df, EnrichOps.LookupSpec(
                  op.params("csv"), op.params("context"), op.params("field")))
              case "batch" => df // sizing applied at the sink (maxRecordsPerFile)
            }
          }
          val routeCol = v.routes.init.foldRight(lit(v.routes.last.name): Column) {
            (r, acc) => when(expr(r.predicateSql), r.name).otherwise(acc)
          }
          afterOps.withColumn("route", routeCol)
        }
    }
  }

  /** The canonical benchmark pipeline: severity-tag → lookup-enrich →
    * 3-way route (FIXTURES.md §3).
    */
  val Canonical: PipelineSpec = PipelineSpec(
    name = "canonical",
    operators = Seq(
      OperatorSpec("severity_tag"),
      OperatorSpec("lookup_enrich")),
    routes = Seq(
      RouteSpec("sink_errors", "severity_number >= 17"),
      RouteSpec("sink_tools", "tool != ''"),
      RouteSpec("sink_default", "true")),
    sinks = Seq("sink_errors", "sink_tools", "sink_default"))
}

/** The spark-submit batch job: partition-wise parse → enrich → route →
  * fan-out → aggregate over the hour-partitioned transcripts table, with
  * per-partition manifest commits and resume.
  *
  * Scale design (10^12 turns): partitions are processed in bounded groups —
  * each group is ONE partition-pruned scan and ONE persisted fan-out (the
  * input is never re-read per sink), and each hour partition commits to the
  * manifest independently, so a killed run loses at most the in-flight
  * group and re-runs idempotently (dynamic partition overwrite).
  */
object PipelineRunner {

  case class RunReport(partitionsProcessed: Int, partitionsSkipped: Int,
                       rowsIn: Long, sinkCounts: Map[String, Long],
                       rowsOut: Long = -1L) {
    def rowsWritten: Long = if (rowsOut >= 0) rowsOut else sinkCounts.values.sum
  }

  /** Discover hour partitions of a `year=/month=/day=/hour=` table. */
  def discoverPartitions(spark: SparkSession, inputPath: String): Seq[String] = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def ls(p: HPath): Seq[HPath] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq
    for {
      y <- ls(new HPath(inputPath)) if y.getName.startsWith("year=")
      m <- ls(y); d <- ls(m); h <- ls(d)
    } yield s"${y.getName}/${m.getName}/${d.getName}/${h.getName}"
  }

  /** Path of a sink's table: a `route=<name>` partition of the single
    * fan-out output — each route directory IS that sink's table.
    */
  def sinkPath(outRoot: String, sink: String): String =
    s"$outRoot/sinks/route=$sink"

  /** Measured fan-out writer defaults (tools/WriteLab, 8M-turn matrix,
    * best-of-N on tmpfs): zstd level 1 + dictionary encoding disabled on
    * the high-cardinality columns cut write wall ~22% AND output bytes
    * ~45% vs snappy-with-dictionaries. Dictionaries on text/conv_id/ts
    * overflow and fall back — pure encode overhead — while the enum
    * columns (role/tool/severity_text/...) keep theirs for the size win.
    * At cluster scale the byte reduction compounds: the written bytes are
    * re-read by every downstream consumer.
    */
  val WriterOptions: Map[String, String] = Map(
    "compression" -> "zstd",
    "parquet.compression.codec.zstd.level" -> "1") ++
    Seq("text", "conv_id", "ts", "attrs_json")
      .map(c => s"parquet.enable.dictionary#$c" -> "false")

  /** @param strategy `"partitioned"` (default): ONE write of the tagged
    *   stream partitioned by (route, year, month, day, hour) — a single
    *   compute pass, flat memory, the only shape that survives 10^12 turns
    *   (no multi-TB cache). `"persist"`: cache the tagged parent and run one
    *   filtered write per sink — lower write fan-out per task, but the cache
    *   materialization costs memory bandwidth and capacity.
    */
  def run(spark: SparkSession, spec: Pipeline.PipelineSpec,
          inputPath: String, outRoot: String,
          groupSize: Int = 24, strategy: String = "partitioned",
          maxRecordsPerFile: Long = 5000000L,
          failure: Option[RandomFailure] = None, attempt: Int = 0): RunReport = {
    // batchprocessor send_batch_size analogue (manifest.yaml:86): output
    // batches are bounded by capping records per written file
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val manifest = new Manifest(s"$outRoot/_manifest")
    val transform = Pipeline.compile(spec, spark)
    // a `batch` operator in the SPEC overrides the caller's default cap
    // (send_batch_size is pipeline config, not a runner flag)
    val recordCap = spec.operators.find(_.opType == "batch")
      .flatMap(_.params.get("max_records")).map(_.toLong)
      .getOrElse(maxRecordsPerFile)
    val all = discoverPartitions(spark, inputPath)
    val committed = manifest.committedPartitions()
    val todo = all.filterNot(p => committed.contains(sanitize(p)))
    var rowsIn = 0L
    var rowsOut = 0L
    val sinkTotals = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)

    val profile = sys.env.contains("SPARK_GRAFT_PROFILE")
    def phase[T](name: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      if (profile) System.err.println(
        f"[profile] $name: ${(System.nanoTime() - t) / 1e9}%.2f s")
      r
    }

    todo.grouped(groupSize).foreach { group =>
      // randomfailureprocessor injection point: per consume call (= per
      // batch group here), BEFORE any work — a failed draw aborts the run
      // with committed state intact, and the caller's retry re-draws
      failure.foreach(_.check(group.mkString(","), attempt))
      val t0 = System.nanoTime()
      // one pruned scan for the whole group
      val paths = group.map(p => s"$inputPath/$p")
      val input = phase("read+list")(spark.read
        .option("basePath", inputPath)
        .parquet(paths: _*))
      // true input volume per partition (filter/sample ops may drop rows
      // downstream, so rows_in ≠ rows written): a zero-column count grouped
      // on the partition columns — parquet decodes no data pages for it
      val inCounts: Map[String, Long] = phase("count-in")(
        input.groupBy(col("year"), col("month"), col("day"), col("hour"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => (s"year=${r.get(0)}/month=${r.get(1)}/day=${r.get(2)}/hour=${r.get(3)}",
            r.getLong(4))).toMap)
      val tagged = phase("plan")(transform(input))

      val perSinkPart: Map[String, Map[String, Long]] =
        if (strategy == "persist") {
          val cached = tagged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val counts = countsBySinkPartition(cached)
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            import scala.concurrent.ExecutionContext.Implicits.global
            val writes = spec.sinks.map { sink => Future {
              cached.filter(col("route") === sink)
                .write.mode("overwrite")
                .option("maxRecordsPerFile", recordCap)
                .options(WriterOptions)
                .partitionBy("year", "month", "day", "hour")
                .parquet(sinkPath(outRoot, sink))
            }}
            writes.foreach(Await.result(_, Duration.Inf))
            counts
          } finally cached.unpersist()
        } else {
          // single pass: route is the leading output partition column —
          // every row lands in its sink table in the same job that parsed it
          // (batchprocessor size caps via maxRecordsPerFile, manifest.yaml:86).
          // Tested and REJECTED (WriteLab r5): sortWithinPartitions(conv_id,
          // turn_idx) before the write looked −10% on isolated write wall
          // but is noise-neutral end-to-end over 2×2 alternating bench runs
          // (sorted 2.51/2.84M tps vs unsorted 2.73/2.37M) — the per-task
          // sort CPU eats the writer-side gain, so the simpler plan ships
          phase("write")(tagged.write.mode("overwrite")
            .option("maxRecordsPerFile", recordCap)
            .options(WriterOptions)
            .partitionBy("route", "year", "month", "day", "hour")
            .parquet(s"$outRoot/sinks"))
          // manifest metrics: count the WRITTEN rows — a column-less scan over
          // the fresh output (footer-bound, cheap) that also double-checks the
          // write landed
          phase("count")(countsBySinkPartition(spark.read
            .option("basePath", s"$outRoot/sinks")
            .parquet(group.flatMap(p => spec.sinks.map(s =>
              s"${sinkPath(outRoot, s)}/$p")).filter(pathExists(spark, _)): _*)))
        }

      val wallMs = (System.nanoTime() - t0) / 1000000
      group.foreach { p =>
        val sinkCounts = spec.sinks.map { s =>
          s -> perSinkPart.getOrElse(s, Map.empty).getOrElse(p, 0L)
        }.toMap
        val pIn = inCounts.getOrElse(p, 0L)
        val pOut = sinkCounts.values.sum
        rowsIn += pIn
        rowsOut += pOut
        sinkCounts.foreach { case (k, v) => sinkTotals(k) += v }
        manifest.commit(manifest.PartitionEntry(
          sanitize(p), "committed", pIn, sinkCounts,
          Seq(s"$inputPath/$p"), wallMs, rowsOut = pOut))
      }
    }
    RunReport(todo.size, committed.size, rowsIn, sinkTotals.toMap, rowsOut)
  }

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    FileSystem.get(spark.sparkContext.hadoopConfiguration).exists(new HPath(p))
  }

  /** route → (year=/month=/day=/hour= key → row count). */
  private def countsBySinkPartition(df: org.apache.spark.sql.DataFrame)
      : Map[String, Map[String, Long]] = {
    val counts = df.groupBy(col("route"), col("year"), col("month"),
        col("day"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0),
        s"year=${r.get(1)}/month=${r.get(2)}/day=${r.get(3)}/hour=${r.get(4)}",
        r.getLong(5)))
    counts.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(r => r._2 -> r._3).toMap
    }
  }

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9=_-]", "_")
}

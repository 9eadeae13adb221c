package graft.route

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.ParseOps

/** The route plane: deterministic multi-way fan-out (SURVEY.md §2D).
  *
  * Models the routingconnector (manifests/observIQ/manifest.yaml:232) and the
  * routereceiver's named in-process mailboxes
  * (receiver/routereceiver/receiver.go:29-47, 118-145): ordered route
  * predicates with first-match-wins semantics, each matched row written to
  * that route's sink table.
  *
  * Physical design for 100 TB: the route tag is computed ONCE per row in the
  * same codegen stage as the parse; the tagged parent is persisted (or staged
  * to a checkpoint table) and each sink write is a partition-pruned filter
  * over it — the input is scanned once, not once per sink (the reference
  * pushes each batch to all routes in one pass; naive per-sink Spark jobs
  * would rescan the source N times).
  */
object Router {

  case class Route(name: String, predicate: Column)

  /** FIXTURES.md §3 route config, first-match semantics:
    * severity >= ERROR → sink_errors; tool != '' → sink_tools; else default.
    */
  def defaultRoutes(severityNumber: Column, tool: Column): Seq[Route] = Seq(
    Route("sink_errors", severityNumber >= ParseOps.SevError),
    Route("sink_tools", tool =!= ""),
    Route("sink_default", lit(true)))

  /** First-match route tag as a single `when` chain — one pass, codegen'd. */
  def routeTag(routes: Seq[Route]): Column =
    routes.init.foldRight(lit(routes.last.name): Column) { (r, acc) =>
      when(r.predicate, r.name).otherwise(acc)
    }

  /** Severity for ANY transcript row, derived from its payload scenario
    * (status class for access/json/csv/kv/syslog lines; default INFO).
    * This is the whole-pipeline severity resolution used by routing.
    */
  def rowSeverity(): Column = {
    val nginxStatus = regexp_extract(col("text"), """" (\d{3}) """, 1)
    val jsonLevel = get_json_object(col("text"), "$.level")
    val csvLevel = element_at(split(col("text"), ","), 2)
    val kvLevel = regexp_extract(col("text"), """level=(\w+)""", 1)
    val syslogSev = regexp_extract(col("text"), """^<(\d+)>""", 1).cast("int") % 8
    when(ParseOps.isNginx,
        ParseOps.severityFromStatus(nginxStatus.cast("int")))
      .when(ParseOps.isJson, ParseOps.severityFromLevel(jsonLevel))
      .when(ParseOps.isCsv, ParseOps.severityFromLevel(csvLevel))
      .when(ParseOps.isKv, ParseOps.severityFromLevel(kvLevel))
      .when(ParseOps.isSyslog,
        when(syslogSev <= 3, ParseOps.SevError)
          .when(syslogSev === 4, ParseOps.SevWarn)
          .otherwise(ParseOps.SevInfo))
      .otherwise(ParseOps.SevInfo)
  }

  /** Tag every transcript row with its severity + first-match route. */
  def tagged(t: DataFrame): DataFrame = {
    val sev = rowSeverity()
    val withSev = t.withColumn("severity_number", sev)
      .withColumn("severity_text", ParseOps.severityText(col("severity_number")))
    withSev.withColumn("route",
      routeTag(defaultRoutes(col("severity_number"), col("tool"))))
  }

  /** Single-pass multi-sink fan-out: persist the tagged parent once, then one
    * filtered write per sink. Returns sink name → row count written.
    */
  def fanOut(spark: SparkSession, t: DataFrame, outDir: String): Map[String, Long] = {
    import org.apache.spark.storage.StorageLevel
    val parent = tagged(t).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val routes = defaultRoutes(col("severity_number"), col("tool")).map(_.name)
      routes.map { name =>
        // count via observe on the write itself — no re-scan of the output
        val obs = new org.apache.spark.sql.Observation(s"fanout_$name")
        val rows = parent.filter(col("route") === name)
          .observe(obs, count(lit(1)).as("n"))
        rows.write.mode("overwrite").parquet(s"$outDir/$name")
        name -> obs.get("n").asInstanceOf[Long]
      }.toMap
    } finally parent.unpersist()
  }

  // -------------------------------------------------------------------
  // snowflakeexporter sink schema parity
  // (exporter/snowflakeexporter/exporter_logs.go:31-51, 151-186)
  // -------------------------------------------------------------------
  /** Project routed rows into the reference's own relational log schema —
    * the canonical sink-table DDL. Body = raw text (Body().AsString(),
    * exporter_logs.go:177); attributes JSON-canonical as the exporter's
    * ConvertAttributesToString does.
    */
  def sinkSchema(t: DataFrame): DataFrame =
    tagged(t).select(
      col("ts").as("Timestamp"),
      col("ts").as("ObservedTimestamp"),
      col("severity_number").cast("string").as("SeverityNumber"),
      col("severity_text").as("SeverityText"),
      col("text").as("Body"),
      concat(lit("{\"conv_id\":\""), col("conv_id"),
        lit("\",\"role\":\""), col("role"),
        lit("\",\"tool\":\""), col("tool"),
        lit("\",\"turn_idx\":"), col("turn_idx"), lit("}")).as("Attributes"),
      lit(0).as("DroppedAttributesCount"),
      lit(0).as("Flags"),
      lit("").as("TraceID"),
      lit("").as("SpanID"),
      col("route").as("Route"),
      col("conv_id"), col("turn_idx"))

  // -------------------------------------------------------------------
  // chronicleexporter grouped writes — dynamic routing key log_type from
  // attributes, grouped by (logType, namespace)
  // (exporter/chronicleexporter/marshal.go:226-268, 466-485)
  // -------------------------------------------------------------------
  def chronicleGroups(t: DataFrame): DataFrame =
    t.select(
        coalesce(when(col("tool") =!= "", col("tool")), lit("default_type")).as("log_type"),
        col("role").as("namespace"),
        col("text"))
      .groupBy(col("log_type"), col("namespace"))
      .agg(count(lit(1)).as("n"), sum(octet_length(col("text"))).as("bytes"))

  // -------------------------------------------------------------------
  // googlecloudexporter host wrapper — add host resource attr when absent
  // (exporter/googlecloudexporter/exporter.go:79-90 appendLogHost)
  // -------------------------------------------------------------------
  def appendHost(t: DataFrame, default: String): DataFrame =
    t.withColumn("host", coalesce(
      when(col("role") === "tool", concat(lit("tool-"), col("tool"))),
      lit(default)))
}

package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.ParseOps

/** The enrich plane (SURVEY.md §2B): lookup joins, PII masking, empty-value
  * removal, resource-attribute transposition, OCSF standardization.
  */
object EnrichOps {

  // -------------------------------------------------------------------
  // lookupprocessor — CSV-keyed enrichment via broadcast hash join
  // (processor/lookupprocessor/processor.go:293-312, csv.go:88-114)
  // -------------------------------------------------------------------
  /** The reference reloads a small CSV into a map and merges the matched
    * row's columns into the record's attributes; key-not-found is a silent
    * no-op (csv.go:79-84). At 100 TB the only sane physical plan is a
    * broadcast hash join on the dimension — never a shuffle of the fact side.
    */
  case class LookupTable(keyCol: String, rows: Seq[Map[String, String]])

  /** FIXTURES.md §2 lookup fixtures. */
  val RoleLookup: Seq[(String, String, String)] = Seq(
    ("user", "external", "cc-000"),
    ("assistant", "ml", "cc-100"),
    ("system", "platform", "cc-200"),
    ("tool", "integrations", "cc-300"))

  val ToolLookup: Seq[(String, String, String)] = Seq(
    ("search", "acme", "gold"),
    ("code_exec", "acme", "gold"),
    ("browser", "other", "bronze"))

  def roleLookupDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    RoleLookup.toDF("role", "team", "cost_center")
  }

  def toolLookupDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ToolLookup.toDF("tool", "vendor", "tier")
  }

  /** Enrich transcripts with both lookups. Left joins: unmatched keys keep
    * null enrichment columns (the reference leaves the record untouched).
    * Both dims are broadcast — zero shuffle of the transcript side.
    */
  def lookupEnrich(spark: SparkSession, t: DataFrame): DataFrame =
    t.join(broadcast(roleLookupDf(spark)), Seq("role"), "left")
      .join(broadcast(toolLookupDf(spark)), Seq("tool"), "left")

  // -------------------------------------------------------------------
  // maskprocessor — default PII rules applied sequentially to every string
  // (processor/maskprocessor/processor.go:36-42 default rules; :198-212
  // maskString applies all rules in order; :252-260 token "[masked_<rule>]")
  // -------------------------------------------------------------------
  /** The reference's default rules verbatim (processor.go:36-42) — anchored
    * `\b` word boundaries, separator-formatted credit cards (4111-1111-1111-
    * 1111), space/dash SSNs, OCR-tolerant phone digits. Rule order is fixed
    * here (Go map iteration is unordered; a deterministic engine needs a
    * stable order): ssn before phone/credit_card so the 3-2-4 grouping wins.
    * Patterns are literals so codegen compiles each regex once per plan.
    */
  val MaskRules: Seq[(String, String)] = Seq(
    "email" -> """\b[a-z0-9._%\+\-—|]+@[a-z0-9.\-—|]+\.[a-z|]{2,6}\b""",
    "ssn" -> """\b\d{3}[- ]\d{2}[- ]\d{4}\b""",
    "credit_card" -> """\b(?:(?:(?:\d{4}[- ]?){3}\d{4}|\d{15,16}))\b""",
    "phone" -> """\b((\+|\b)[1l][\-\. ])?\(?\b[\dOlZSB]{3,5}([\-\. ]|\) ?)[\dOlZSB]{3}[\-\. ][\dOlZSB]{4}\b""",
    "ipv4" -> """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b""")

  def maskString(c: Column): Column =
    MaskRules.foldLeft(c) { case (acc, (name, pattern)) =>
      regexp_replace(acc, pattern, s"[masked_$name]")
    }

  def mask(t: DataFrame): DataFrame =
    t.filter(ParseOps.isMultiline)
      .select(col("conv_id"), col("turn_idx"), maskString(col("text")).as("masked"))

  /** Field exclusion (maskprocessor processor.go:174-178): listed dotted
    * paths are left unmasked. Schema-directed: exclusion is a plan-time
    * choice of which columns get the masking projection at all.
    */
  def maskColumns(df: DataFrame, exclude: Set[String]): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name)
    stringCols.filterNot(exclude.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, maskString(col(c)))
    }
  }

  // -------------------------------------------------------------------
  // removeemptyvaluesprocessor — drop null / "" / configured sentinel values
  // (processor/removeemptyvaluesprocessor/processor.go:170-221, 243-251)
  // -------------------------------------------------------------------
  /** The reference recursively removes empty strings, nulls, empty maps and
    * configured sentinels (case-insensitive "-", "null"). Relationally this
    * is a higher-order filter over map/array columns — here over the parsed
    * kv pairs of each record plus deliberately-empty fixture entries.
    */
  val EmptySentinels: Seq[String] = Seq("", "-", "null")

  def isEmptyValue(v: Column): Column =
    v.isNull || lower(v).isin(EmptySentinels: _*)

  /** Map-typed variant: clean a MapType attribute column with higher-order
    * `map_filter`, honoring prefix-scoped excludes (the reference's dotted
    * exclude paths trimmed to the map's prefix, processor.go:225-239).
    */
  def cleanAttrMap(m: Column, excludeKeys: Set[String] = Set.empty): Column = {
    val keep = map_filter(m, (k, v) =>
      excludeKeys.foldLeft(!isEmptyValue(v)) { (acc, ex) => acc || k === ex })
    keep
  }

  def removeEmptyValues(t: DataFrame): DataFrame = {
    val kv = ParseOps.parseKv(t)
    // rebuild an attribute list with injected empties, then clean it
    val entries = array(
      struct(lit("level").as("k"), col("level").as("v")),
      struct(lit("component").as("k"), col("component").as("v")),
      struct(lit("note").as("k"), lit("").as("v")),
      struct(lit("fallback").as("k"), lit("-").as("v")),
      struct(lit("opt").as("k"), lit("null").as("v")))
    val cleaned = filter(entries, e => !isEmptyValue(e.getField("v")))
    kv.select(col("conv_id"), col("turn_idx"),
      array_join(transform(cleaned,
        e => concat(e.getField("k"), lit("="), e.getField("v"))), ",").as("attrs"))
  }

  // -------------------------------------------------------------------
  // resourceattributetransposerprocessor — copy resource attr → record attr
  // if absent (processor_logs.go:51-77)
  // -------------------------------------------------------------------
  /** Resource attributes are denormalized onto our rows, so the transposer is
    * a pure `coalesce` projection: take the record-level value when present,
    * else the resource-level one.
    */
  def transpose(t: DataFrame): DataFrame = {
    // resource attr derived from the conversation (constant per resource
    // group, as in expr/record.go:80-101 ConvertToResourceGroups)
    val resourceHost = concat(lit("host-"), substring_index(col("conv_id"), "-", 1))
    val recordHost = when(col("role") === "tool", concat(lit("tool-"), col("tool")))
    t.select(col("conv_id"), col("turn_idx"),
      coalesce(recordHost, resourceHost).as("host"))
  }

  // -------------------------------------------------------------------
  // ocsfstandardizationprocessor — ordered event mappings, first match wins,
  // class/category/type uid computation, type coercion
  // (processor.go:27-46, 139-213; type_uid = class*100+activity, :233-235;
  // category_uid = class_uid/1000, :53-54; non-matching records dropped :215)
  // -------------------------------------------------------------------
  def ocsfStandardize(t: DataFrame): DataFrame = {
    val j = ParseOps.parseJson(t)
    // mapping 1: http activity (class 4002) for error-level events
    // mapping 2: api activity (class 6003) for requests with latency >= 1000
    // first matching mapping wins; others dropped (processor.go:215)
    val m1 = col("level") === "error"
    val m2 = col("latency_ms") >= 1000
    val classUid = when(m1, 4002).when(m2, 6003)
    val activityId = when(col("status") >= 500, 2).otherwise(1)
    j.filter(m1 || m2)
      .select(col("conv_id"), col("turn_idx"),
        classUid.as("class_uid"),
        (classUid / 1000).cast("int").as("category_uid"),
        activityId.as("activity_id"),
        (classUid * 100 + activityId).as("type_uid"),
        // OCSF timestamp coercion: epoch millis int64 (type_coerce.go:130-152)
        col("status").cast("long").as("status_code"),
        lit("1.1.0").as("metadata_version"))
  }

  // -------------------------------------------------------------------
  // OCSF type coercion helpers (type_coerce.go:25-42): cast-or-original
  // -------------------------------------------------------------------
  /** "leave unparseable values as-is" semantics (type_coerce.go: strings that
    * fail to parse are returned unchanged) → guarded cast + coalesce. */
  def coerceLongOrOriginal(c: Column): Column =
    coalesce(when(c.rlike("^-?\\d+$"), c.cast("long").cast("string")), c)
}

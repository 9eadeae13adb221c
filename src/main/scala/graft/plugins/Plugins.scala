package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.RegexExtractStruct
import graft.parse.ParseOps

/** Plugin layer: a plugin = a validated-params → Dataset transform compiler
  * (EP2 parity: receiver/pluginreceiver/plugin.go Render/ApplyDefaults/
  * CheckParameters → rendered operator DAG; no textual templating needed in
  * Scala — composition is native, SURVEY §3 EP2).
  */
object Plugins {

  case class PluginParam(name: String, default: Option[String],
                         supported: Seq[String] = Seq.empty)

  abstract class Plugin(val name: String, val params: Seq[PluginParam]) {
    /** CheckParameters parity (plugin.go:146-266). */
    def validate(given: Map[String, String]): Map[String, String] = {
      given.keys.foreach { k =>
        require(params.exists(_.name == k), s"$name: unknown parameter '$k'")
      }
      params.foreach { p =>
        given.get(p.name).foreach { v =>
          require(p.supported.isEmpty || p.supported.contains(v),
            s"$name: unsupported value '$v' for '${p.name}'")
        }
        require(given.contains(p.name) || p.default.isDefined,
          s"$name: missing required parameter '${p.name}'")
      }
      params.map(p => p.name -> given.getOrElse(p.name, p.default.get)).toMap
    }

    def apply(spark: SparkSession, given: Map[String, String] = Map.empty)
             (input: DataFrame): DataFrame =
      build(spark, validate(given))(input)

    protected def build(spark: SparkSession, p: Map[String, String])
                       : DataFrame => DataFrame
  }

  /** The nginx plugin (plugins/nginx_logs.yaml): regex-parse the access log,
    * embedded time + severity parsing, `log_type` add, low-data-mode retain.
    * `data_flow: low` drops INFO-class records (the plugin's filter at
    * nginx_logs.yaml:132-141 keeps only warn+ in low mode).
    */
  object NginxPlugin extends Plugin("nginx", Seq(
    PluginParam("data_flow", Some("high"), Seq("high", "low")),
    PluginParam("log_type", Some("nginx")))) {

    protected def build(spark: SparkSession, p: Map[String, String]) = { input =>
      val parsed = input.filter(ParseOps.isNginx)
        .withColumn("g", RegexExtractStruct.of(col("text"),
          ParseOps.NginxPattern, ParseOps.NginxFields))
        .select(
          col("conv_id"), col("turn_idx"), col("tool"),
          col("g.remote_addr").as("remote_addr"),
          col("g.method").as("method"),
          col("g.path").as("path"),
          col("g.status").cast(IntegerType).as("status"),
          col("g.body_bytes_sent").cast(LongType).as("body_bytes_sent"),
          to_timestamp(substring_index(col("g.time_local"), " ", 1),
            "dd/MMM/yyyy:HH:mm:ss").as("event_ts"),
          lit(p("log_type")).as("log_type"))
        .withColumn("severity_number",
          ParseOps.severityFromStatus(col("status")))
        .withColumn("severity_text",
          ParseOps.severityText(col("severity_number")))
      if (p("data_flow") == "low")
        parsed.filter(col("severity_number") >= ParseOps.SevWarn)
      else parsed
    }
  }

  val registry: Map[String, Plugin] = Seq(NginxPlugin).map(p => p.name -> p).toMap
}

/** snapshotprocessor ad-hoc search (SURVEY §2B): substring query over body +
  * attrs (case-sensitive contains, filter.go:23-78) with a minimum observed
  * timestamp bound (strictly after, filter_logs.go:107-109).
  */
object Snapshot {
  def search(t: DataFrame, query: String, minTs: String): DataFrame =
    t.filter(col("ts") > lit(minTs).cast("timestamp_ntz"))
      .filter(col("text").contains(query) || col("role").contains(query) ||
        col("tool").contains(query) || col("conv_id").contains(query))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("text"), col("ts"))
}

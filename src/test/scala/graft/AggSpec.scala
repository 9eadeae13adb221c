package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.agg.AggOps
import graft.model.Transcripts

class AggSpec extends SparkTestBase {
  import spark.implicits._

  lazy val t = Transcripts.fromEvents(spark, sfDir).cache()

  test("metricstats: integer avg uses integer division (avg_statistic.go:61-66)") {
    val rows = Seq(
      ("c1", 0, "{\"level\":\"info\",\"status\":200,\"path\":\"/x\",\"latency_ms\":3,\"msg\":\"m\"}", "", Timestamp.valueOf("2024-01-01 00:01:00")),
      ("c1", 1, "{\"level\":\"info\",\"status\":200,\"path\":\"/x\",\"latency_ms\":4,\"msg\":\"m\"}", "", Timestamp.valueOf("2024-01-01 00:02:00")))
      .toDF("conv_id", "turn_idx", "text", "tool", "ts")
      .withColumn("role", lit("user"))
    val s = AggOps.metricStats(rows).collect().head
    assert(s.getAs[Long]("stat_avg_int") == 3L) // (3+4)/2 = 3 int, not 3.5
    assert(s.getAs[Double]("stat_avg_double") == 3.5)
  }

  test("metricstats: first/last follow arrival order (ts, conv, turn)") {
    val rows = Seq(
      ("c2", 1, "{\"level\":\"warn\",\"status\":400,\"path\":\"/x\",\"latency_ms\":50,\"msg\":\"m\"}", "", Timestamp.valueOf("2024-01-01 00:05:00")),
      ("c1", 0, "{\"level\":\"warn\",\"status\":400,\"path\":\"/x\",\"latency_ms\":10,\"msg\":\"m\"}", "", Timestamp.valueOf("2024-01-01 00:01:00")),
      ("c3", 2, "{\"level\":\"warn\",\"status\":400,\"path\":\"/x\",\"latency_ms\":99,\"msg\":\"m\"}", "", Timestamp.valueOf("2024-01-01 00:09:00")))
      .toDF("conv_id", "turn_idx", "text", "tool", "ts")
      .withColumn("role", lit("user"))
    val s = AggOps.metricStats(rows).collect().head
    assert(s.getAs[Long]("stat_first") == 10L)
    assert(s.getAs[Long]("stat_last") == 99L)
  }

  test("sampling fast paths: ratio 0 keeps all, ratio 1 drops all matching") {
    val n = t.count()
    assert(AggOps.sample(t, lit(true), 0.0).count() == n)
    assert(AggOps.sample(t, col("role") === "user", 1.0)
      .filter(col("role") === "user").count() == 0)
    // seeded middle path is deterministic across runs
    val a = AggOps.sample(t, lit(true), 0.5, seed = 7).count()
    val b = AggOps.sample(t, lit(true), 0.5, seed = 7).count()
    assert(a == b && a > 0 && a < n)
  }

  test("salted two-phase aggregation equals plain groupBy count") {
    val salted = AggOps.saltedCountByConv(t).as[(String, Long)].collect().toMap
    val plain = t.groupBy(col("conv_id")).count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("typed Aggregator stats == expression-built metricStats") {
    import graft.agg.MetricStatsAgg
    val dp = AggOps.metricExtract(t)
    val viaAggregator = dp
      .groupBy(AggOps.windowStart(col("ts"), "1 hour").as("window_start"), col("level"))
      .agg(MetricStatsAgg.metricStats(col("value_int"),
        unix_micros(col("ts").cast("timestamp")), col("conv_id"),
        col("turn_idx")).as("s"))
      .select(col("window_start"), col("level"),
        col("s.stat_min"), col("s.stat_max"), col("s.stat_avg_int"),
        col("s.stat_first"), col("s.stat_last"), col("s.stat_count"))
    val viaExprs = AggOps.metricStats(t)
      .select(col("window_start"), col("level"),
        col("stat_min"), col("stat_max"), col("stat_avg_int"),
        col("stat_first"), col("stat_last"), col("stat_count"))
    val a = viaAggregator.collect().map(_.toSeq).toSet
    val b = viaExprs.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("logcount windows align to epoch hours") {
    val lc = AggOps.logCount(t)
    val bad = lc.filter(minute(col("window_start")) =!= 0 ||
      second(col("window_start")) =!= 0).count()
    assert(bad == 0)
    assert(lc.agg(sum(col("log_count"))).collect().head.getLong(0) == t.count())
  }

  test("sampling rejects out-of-range drop_ratio (config.go errInvalidDropRatio)") {
    Seq(-0.1, 1.1).foreach { r =>
      assertThrows[IllegalArgumentException] {
        AggOps.sample(t, lit(true), r)
      }
      assertThrows[IllegalArgumentException] {
        AggOps.sampleHashed(t, lit(true), r)
      }
    }
  }

  test("metricextract config validation: type whitelist, extract required, no mixing") {
    assertThrows[IllegalArgumentException] { // invalid metric type
      AggOps.metricExtractConfigured(t, AggOps.MetricExtractConfig(
        extract = "turn_idx", metricType = "histogram"))
    }
    assertThrows[IllegalArgumentException] { // extract required
      AggOps.metricExtractConfigured(t, AggOps.MetricExtractConfig())
    }
    assertThrows[IllegalArgumentException] { // expr+OTTL mixing
      AggOps.metricExtractConfigured(t, AggOps.MetricExtractConfig(
        extract = "turn_idx", ottlMatch = Some("true")))
    }
    // int type truncates, double type keeps the fraction; gauge ⇒ not monotonic
    val gi = AggOps.metricExtractConfigured(t, AggOps.MetricExtractConfig(
      extract = "turn_idx / 2", metricType = "gauge_int"))
    val gd = AggOps.metricExtractConfigured(t, AggOps.MetricExtractConfig(
      extract = "turn_idx / 2", metricType = "gauge_double"))
    val i1 = gi.filter(col("turn_idx") === 1).select("value_int").collect().head.getLong(0)
    val d1 = gd.filter(col("turn_idx") === 1).select("value_double").collect().head.getDouble(0)
    assert(i1 == 0L && d1 == 0.5)
    assert(gi.filter(col("is_monotonic")).count() == 0)
  }

  test("logcount config rejects mixing the expr and OTTL surfaces") {
    // logcountprocessor/config.go:56-70: all four cross combinations error
    val combos = Seq(
      AggOps.LogCountConfig(exprMatch = Some("true"), ottlMatch = Some("true")),
      AggOps.LogCountConfig(exprAttrs = Some(Seq("a" -> "role")),
        ottlAttrs = Some(Seq("a" -> "role"))),
      AggOps.LogCountConfig(exprMatch = Some("true"),
        ottlAttrs = Some(Seq("a" -> "role"))),
      AggOps.LogCountConfig(ottlMatch = Some("true"),
        exprAttrs = Some(Seq("a" -> "role"))))
    combos.foreach { cfg =>
      assertThrows[IllegalArgumentException] {
        AggOps.logCountConfigured(t, cfg)
      }
    }
    // a pure surface (either one) is accepted and counts identically
    val e = AggOps.logCountConfigured(t, AggOps.LogCountConfig(
      exprMatch = Some("true")))
    val o = AggOps.logCountConfigured(t, AggOps.LogCountConfig(
      ottlMatch = Some("Len(text) >= 0")))
    assert(e.agg(sum(col("log_count"))).collect().head.getLong(0) ==
      o.agg(sum(col("log_count"))).collect().head.getLong(0))
  }

  test("span env: the four expr/span.go fields resolve through boolExpr") {
    val sv = AggOps.spanView(t).cache()
    // field value sets match the reference's rendering tables
    val kinds = sv.select("trace_kind").distinct().as[String].collect().toSet
    assert(kinds.subsetOf(Set("unspecified", "internal", "client", "server",
      "consumer", "producer")))
    val codes = sv.select("trace_status_code").distinct().as[String].collect().toSet
    assert(codes.subsetOf(Set("ok", "error", "unset")) && codes.size == 3)
    // a span predicate through the EXPR ENGINE (not hand-built Columns)
    // equals the direct column filter — all four env fields are live
    val cols = sv.columns.toSet
    // 'server' (assistant turns): JSON turns are odd event ids, so the
    // tool role (even ids) never intersects — client spans don't occur on
    // this derivation and the live kinds are server/internal
    val viaExpr = sv.filter(graft.expr.ExprLang.boolExpr(
      "span_duration_ms > 500 and trace_kind == 'server' and " +
        "trace_status_code == 'ok' and trace_status_message != ''", cols)).count()
    val direct = sv.filter(col("span_duration_ms") > 500 &&
      col("trace_kind") === "server" && col("trace_status_code") === "ok" &&
      col("trace_status_message") =!= "").count()
    assert(viaExpr == direct && viaExpr > 0)
    sv.unpersist()
  }
}

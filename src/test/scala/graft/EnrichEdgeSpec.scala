package graft

import org.apache.spark.sql.functions._
import graft.enrich.EnrichOps
import graft.parse.ParseOps

class EnrichEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("mask field exclusion leaves excluded columns untouched") {
    val df = Seq(("a@b.com", "c@d.com")).toDF("contact", "audit_raw")
    val masked = EnrichOps.maskColumns(df, exclude = Set("audit_raw")).collect().head
    assert(masked.getString(0) == "[masked_email]")
    assert(masked.getString(1) == "c@d.com")
  }

  test("map-typed remove-empty honors prefix-scoped excludes") {
    val df = Seq(1).toDF("x").select(
      map(lit("a"), lit("v"), lit("b"), lit(""), lit("keep_me"), lit("-"),
        lit("c"), lit("null")).as("attrs"))
    val cleaned = df.select(
      EnrichOps.cleanAttrMap(col("attrs"), excludeKeys = Set("keep_me")).as("m"))
      .select(map_keys(col("m")).as("ks")).collect().head.getSeq[String](0).sorted
    assert(cleaned == Seq("a", "keep_me"))
  }

  test("epoch time layouts (stanza layout_type: epoch)") {
    val df = Seq((1704067200L, 1704067200123L)).toDF("s", "ms")
    val r = df.select(
      ParseOps.parseEpoch(col("s"), "s").as("ts_s"),
      ParseOps.parseEpoch(col("ms"), "ms").as("ts_ms")).collect().head
    assert(r.getTimestamp(0).toInstant.getEpochSecond == 1704067200L)
    assert(r.getTimestamp(1).toInstant.toEpochMilli == 1704067200123L)
  }

  test("generated corpus is genuinely skewed and salted agg still exact") {
    val t = graft.model.Transcripts.generate(spark, nTurns = 30000, nConvs = 500)
      .cache()
    val counts = t.groupBy(col("conv_id")).count()
      .select(col("count")).as[Long].collect().sorted
    val max = counts.last
    val median = counts(counts.length / 2)
    assert(max > median * 20, s"expected hot keys: max=$max median=$median")
    // two-phase salted aggregation is exact on the skewed data
    val salted = graft.agg.AggOps.saltedCountByConv(t)
      .as[(String, Long)].collect().toMap
    val plain = t.groupBy(col("conv_id")).count().as[(String, Long)].collect().toMap
    assert(salted == plain)
    t.unpersist()
  }
}

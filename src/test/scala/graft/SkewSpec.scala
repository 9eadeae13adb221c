package graft

import org.apache.spark.sql.functions._

import graft.model.Transcripts

/** Skew-handling evidence (north rule: hot conv_ids / mega-tools absorbed
  * via explicit salting AND AQE skew-join). The salted two-phase
  * aggregation is oracle-checked (q_salted_agg); this spec proves the AQE
  * skew-join path actually engages in this engine's session configuration:
  * a join keyed on a pathologically hot conv_id must come out of adaptive
  * execution with the skewed partition split (isSkewJoin), not one straggler
  * task owning the whole hot key.
  */
class SkewSpec extends SparkTestBase {

  test("AQE splits the hot-conv_id join partition (skew join engages)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffled join (no broadcast escape hatch) and scale the AQE
      // skew thresholds down to test size — the same ratios a 100 TB run
      // hits with the default 256 MB threshold
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      val base = Transcripts.generate(spark, nTurns = 20000, nConvs = 500)
      // one conv_id owns ~5/6 of the corpus — the mega-conversation case.
      // Two shapes matter for the rule to fire, both 100 TB-relevant:
      // (1) the post-join consumer must keep a real payload column (text)
      //     flowing through the join shuffle — a conv_id-only shuffle of a
      //     single repeated key compresses to almost nothing, and byte-based
      //     skew detection correctly sees no byte skew;
      // (2) the dim side must reach the join as a plain shuffled relation:
      //     a partition fed through an aggregation cannot be mapper-split,
      //     so Spark's matcher requires sort-over-shuffle on both sides.
      val mega = base.withColumn("conv_id", lit("conv_mega"))
      val skewed = base.union(mega).union(mega).union(mega)
        .union(mega).union(mega)
      val dim = spark.range(0, 500)
        .select(format_string("c%d", col("id")).as("conv_id"))
        .union(spark.range(0, 1).select(lit("conv_mega").as("conv_id")))
        .withColumn("conv_attr", length(col("conv_id")))
      val joined = skewed.join(dim, "conv_id")
        .groupBy(col("conv_attr")).agg(count(lit(1)).as("n"),
          sum(octet_length(col("text"))).as("bytes"))
      joined.collect() // drive adaptive execution to the final plan

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(400))
      assert(finalPlan.contains("skew=true") || finalPlan.contains("isSkewJoin=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

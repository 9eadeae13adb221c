package graft.tools

import graft.{GraftSession, SparkEntry}

/** Mirrors the driver's flagship smoke: SparkEntry.entry must return >0 rows
  * on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val rows = SparkEntry.entry(spark).collect()
    println(s"[entry-smoke] rows=${rows.length}")
    rows.foreach(r => println(s"[entry-smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import graft.data.{Dedup, TextAnalysis}

/** Same-session A/B of the portable 60-bit hash forms (guide §1.4 noop
  * isolation): the SQL round-trip `conv(substring(md5(x),1,15),16,10)`
  * vs the codegen `Md5Long` (digest bytes → long), on the two hot shapes
  * that dominate the doc-family tier — per-token hashing (simhash path)
  * and per-shingle hashing (minhash/contamination path). Interleaved
  * reps so both forms share the host noise window. Throwaway diagnostic.
  */
object MicroMd5 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder(master = "local[32]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Dedup.withPlantedDups(TextAnalysis.documents(s, d))
    def sqlForm(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

    def run(name: String)(col: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(col.as("h")).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[micro-md5] $name $dt%.2f s")
      dt
    }
    val tokens = split(org.apache.spark.sql.functions.col("text"), " ")
    // warmup both codegen paths once
    run("warmup-sql")(transform(tokens, t => sqlForm(t)))
    run("warmup-new")(transform(tokens, t => Dedup.md5Hash64(t)))
    (1 to 3).foreach { rep =>
      run(s"tokens-sql-rep$rep")(transform(tokens, t => sqlForm(t)))
      run(s"tokens-new-rep$rep")(transform(tokens, t => Dedup.md5Hash64(t)))
      run(s"shingles-sql-rep$rep")(
        transform(Dedup.shingles(org.apache.spark.sql.functions.col("text")),
          sh => pmod(sqlForm(sh), lit(Dedup.P))))
      run(s"shingles-new-rep$rep")(
        transform(Dedup.shingles(org.apache.spark.sql.functions.col("text")),
          sh => pmod(Dedup.md5Hash64(sh), lit(Dedup.P))))
    }
    s.stop()
  }
}

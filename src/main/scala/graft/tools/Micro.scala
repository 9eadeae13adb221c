package graft.tools

import org.apache.spark.sql.functions._
import graft.data.{Dedup, TextAnalysis}

/** Ad-hoc stage isolation for the minhash pipeline (noop-sink timing per
  * optimization-guide §1.4). Throwaway diagnostic main.
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder(master = "local[32]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = TextAnalysis.documents(s, d)
    def time(name: String)(f: => Unit): Unit = (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      f
      println(f"[micro] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val k = 16
    time("wordhash-only") {
      Dedup.withPlantedDups(docs)
        .select(col("doc_id"),
          transform(Dedup.shingles(col("text")),
            sh => pmod(Dedup.md5Hash64(sh), lit(Dedup.P))).as("hs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles-only") {
      Dedup.withPlantedDups(docs)
        .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures-old-hof") {
      val hs = transform(Dedup.shingles(col("text")),
        s2 => pmod(Dedup.md5Hash64(s2), lit(Dedup.P)))
      val a = typedlit(Dedup.hashA(k)); val b = typedlit(Dedup.hashB(k))
      val sig = aggregate(hs, array_repeat(lit(Long.MaxValue), k),
        (acc, h) => transform(sequence(lit(0), lit(k - 1)),
          i => least(element_at(acc, i + 1),
            pmod(element_at(a, i + 1) * h + element_at(b, i + 1), lit(Dedup.P)))))
      Dedup.withPlantedDups(docs)
        .select(col("doc_id"), sig.as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures-only") {
      Dedup.withPlantedDups(docs)
        .select(col("doc_id"),
          Dedup.minHashSignature(col("text"), 16, portable = true).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("banded") {
      Dedup.minHashBanded(docs, portable = true)
        .write.format("noop").mode("overwrite").save()
    }
    time("lsh-candidates") {
      Dedup.minHashLshCandidates(docs, portable = true)
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup-pairs") {
      Dedup.minHashDedupPairs(docs, portable = true)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}

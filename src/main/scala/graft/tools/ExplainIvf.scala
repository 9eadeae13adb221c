package graft.tools
object ExplainIvf {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder(master = "local[8]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val emb = graft.data.Similarity.embeddings(s, "/root/testdata/sf0.001")
    println("=== ivfCells ===")
    graft.data.Similarity.ivfCells(emb).explain("formatted")
    println("=== timeRangeScan ===")
    val tmp = "/tmp/graft_trs"
    graft.model.Transcripts.writePartitioned(
      graft.model.Transcripts.generate(s, 20000, 10), tmp)
    graft.model.Transcripts.timeRangeScan(s, tmp,
      "2024-01-01 03:00:00", "2024-01-01 05:00:00").explain("formatted")
    s.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

import graft.pipeline.{Manifest, TableFormat}

/** Trait-level conformance for the table-format seam: any implementation —
  * today's directory manifest, a future Iceberg catalog — must pass these
  * verbatim. The suite is abstract over the factory so a real Iceberg impl
  * only supplies `newFormat()`.
  */
abstract class TableFormatConformance extends AnyFunSuite {

  /** A FRESH, empty format instance backed by fresh storage. */
  def newFormat(): TableFormat

  /** Reopen the same storage (crash-recovery view); formats that cannot
    * reopen may return the same instance.
    */
  def reopen(f: TableFormat): TableFormat

  test("conformance: empty table is snapshot 0 with no partitions") {
    val f = newFormat()
    assert(f.currentSnapshot() == 0L)
    assert(f.committed().isEmpty)
    assert(f.committedAsOf(0L).isEmpty)
  }

  test("conformance: commits are visible, monotone, and exactly-once per name") {
    val f = newFormat()
    f.commitPartition("hour=2024-01-01-00", 10L, Seq("a.parquet"))
    f.commitPartition("hour=2024-01-01-01", 20L, Seq("b.parquet"))
    assert(f.isPartitionCommitted("hour=2024-01-01-00"))
    assert(!f.isPartitionCommitted("hour=2024-01-01-02"))
    assert(f.committed().size == 2)
    val head = f.currentSnapshot()
    assert(head >= 2L) // one snapshot per commit, monotone
    // re-committing the same partition must not duplicate the listing
    f.commitPartition("hour=2024-01-01-00", 10L, Seq("a.parquet"))
    assert(f.committed().size == 2)
  }

  test("conformance: as-of reads reconstruct history; head as-of equals live") {
    val f = newFormat()
    f.commitPartition("p1", 1L, Seq("f1"))
    val s1 = f.currentSnapshot()
    f.commitPartition("p2", 2L, Seq("f2"))
    f.commitPartition("p3", 3L, Seq("f3"))
    assert(f.committedAsOf(s1).size == 1)
    assert(f.committedAsOf(f.currentSnapshot()) == f.committed())
  }

  test("conformance: reopened storage sees the same committed state") {
    val f = newFormat()
    f.commitPartition("p1", 1L, Seq("f1"))
    f.commitPartition("p2", 2L, Seq("f2"))
    val g = reopen(f)
    assert(g.committed() == f.committed())
    assert(g.currentSnapshot() == f.currentSnapshot())
    assert(g.isPartitionCommitted("p1"))
  }

  test("conformance: clear resets partitions AND lineage together") {
    val f = newFormat()
    f.commitPartition("p1", 1L, Seq("f1"))
    f.clear()
    assert(f.committed().isEmpty && f.currentSnapshot() == 0L)
    // post-clear commits restart the lineage cleanly
    f.commitPartition("p9", 9L, Seq("f9"))
    assert(f.committedAsOf(f.currentSnapshot()) == f.committed())
  }
}

/** The directory-manifest implementation under the conformance contract. */
class ManifestConformanceSpec extends TableFormatConformance {
  private val dirs = scala.collection.mutable.Map[TableFormat, String]()

  override def newFormat(): TableFormat = {
    val d = java.nio.file.Files.createTempDirectory("tf_conf").toString
    val m = new Manifest(d)
    dirs(m) = d
    m
  }

  override def reopen(f: TableFormat): TableFormat = new Manifest(dirs(f))
}

/** The Iceberg-layout filesystem implementation under the same contract. */
class IcebergLikeConformanceSpec extends TableFormatConformance {
  private val dirs = scala.collection.mutable.Map[TableFormat, String]()

  override def newFormat(): TableFormat = {
    val d = java.nio.file.Files.createTempDirectory("icb_conf").toString
    val t = new graft.pipeline.IcebergLikeTable(d)
    dirs(t) = d
    t
  }

  override def reopen(f: TableFormat): TableFormat =
    new graft.pipeline.IcebergLikeTable(dirs(f))
}

/** Beyond the metadata contract: REAL time-travel reads over parquet data
  * files pinned by snapshot, a stale version-hint healing, and the
  * optimistic-claim exclusivity that makes racing committers safe.
  */
class IcebergLikeTableSpec extends SparkTestBase {
  import graft.pipeline.IcebergLikeTable

  test("snapshot-pinned scans read exactly the files visible at that snapshot") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("icb_tt").toString
    val t = new IcebergLikeTable(root)
    Seq(1, 2, 3).toDF("n").write.parquet(s"$root/data/batch1")
    t.commitPartition("batch1", 3L, Seq(s"$root/data/batch1"))
    val s1 = t.currentSnapshot()
    Seq(4, 5).toDF("n").write.parquet(s"$root/data/batch2")
    t.commitPartition("batch2", 2L, Seq(s"$root/data/batch2"))
    // as-of s1 the second batch does not exist; at head both do
    assert(spark.read.parquet(t.dataFilesAsOf(s1): _*).count() == 3)
    assert(spark.read.parquet(t.dataFilesAsOf(t.currentSnapshot()): _*)
      .count() == 5)
    assert(t.committedAsOf(s1) == Set("batch1"))
  }

  test("stale and overshooting version hints heal via scan recovery") {
    val root = java.nio.file.Files.createTempDirectory("icb_hint").toString
    val t = new IcebergLikeTable(root)
    t.commitPartition("p1", 1L, Seq("f1"))
    t.commitPartition("p2", 1L, Seq("f2"))
    val hint = java.nio.file.Paths.get(root, "metadata", "version-hint.text")
    java.nio.file.Files.writeString(hint, "0") // stale: forward scan heals
    assert(new IcebergLikeTable(root).currentSnapshot() == 2L)
    java.nio.file.Files.writeString(hint, "99") // overshoot: walks back
    assert(new IcebergLikeTable(root).currentSnapshot() == 2L)
    java.nio.file.Files.writeString(hint, "junk") // unparseable: scans from 0
    assert(new IcebergLikeTable(root).currentSnapshot() == 2L)
  }

  test("corrupt manifest-chain cycle fails loudly instead of hanging") {
    val root = java.nio.file.Files.createTempDirectory("icb_cycle").toString
    val t = new IcebergLikeTable(root)
    t.commitPartition("p1", 1L, Seq("f1"))
    t.commitPartition("p2", 1L, Seq("f2"))
    val metaDir = java.nio.file.Paths.get(root, "metadata")
    def manifestOf(prefix: String): java.nio.file.Path = {
      val s = java.nio.file.Files.list(metaDir)
      try s.iterator().asScala.find(
        _.getFileName.toString.startsWith(prefix)).get
      finally s.close()
    }
    val m1 = manifestOf("snap-1-"); val m2 = manifestOf("snap-2-")
    // corrupt snap-1's parent pointer to point at its own child: the
    // child->root walk becomes snap-2 -> snap-1 -> snap-2 -> ...
    val lines = java.nio.file.Files.readString(m1).split("\n", -1)
    java.nio.file.Files.writeString(m1,
      (m2.getFileName.toString +: lines.drop(1).toSeq).mkString("\n"))
    val fresh = new IcebergLikeTable(root)
    val ex = intercept[IllegalStateException] {
      fresh.dataFilesAsOf(fresh.currentSnapshot())
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("partition names and file paths with quotes/backslashes/newlines round-trip") {
    val root = java.nio.file.Files.createTempDirectory("icb_esc").toString
    val t = new IcebergLikeTable(root)
    // newlines are the nastiest case: unescaped they would both split a
    // manifest line AND keep the one-line metadata JSON from ever
    // re-matching its extractor (Java '.' excludes \n)
    val oddName = "hour=\"00\"\\back\nslash"
    val oddFile = "/data/file \"v1\"\\part\n2.parquet"
    t.commitPartition(oddName, 1L, Seq(oddFile, "/plain.parquet"))
    assert(t.isPartitionCommitted(oddName)) // no duplicate re-commit loop
    val g = new IcebergLikeTable(root)
    assert(g.committed() == Set(oddName))
    assert(g.dataFilesAsOf(g.currentSnapshot()) ==
      Seq(oddFile, "/plain.parquet"))
    g.commitPartition("plain", 1L, Seq("/p2.parquet")) // table still writable
    assert(g.committed() == Set(oddName, "plain"))
  }

  test("concurrent committers of the SAME partition commit exactly once") {
    val root = java.nio.file.Files.createTempDirectory("icb_same").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 12).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit =
            new IcebergLikeTable(root).commitPartition("p1", 1L, Seq("f1"))
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    val t = new IcebergLikeTable(root)
    // the in-loop idempotency re-check stops every losing racer before it
    // can claim the next version with a duplicate: exactly one snapshot
    assert(t.currentSnapshot() == 1L)
    assert(t.committed() == Set("p1"))
    // and a sequential re-commit after visibility is a plain no-op
    new IcebergLikeTable(root).commitPartition("p1", 1L, Seq("f1"))
    assert(t.currentSnapshot() == 1L)
  }

  test("racing committers: exactly one claims each version, none are lost") {
    val root = java.nio.file.Files.createTempDirectory("icb_race").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 16).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            new IcebergLikeTable(root).commitPartition(s"p$i", i.toLong, Seq(s"f$i"))
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    val t = new IcebergLikeTable(root)
    assert(t.currentSnapshot() == 16L) // one snapshot per commit, no gaps
    assert(t.committed() == (1 to 16).map(i => s"p$i").toSet)
  }

  test("commit cost is O(1) metadata reads, independent of version count") {
    // the cumulative-state layout: every vN.metadata.json embeds the full
    // committed-partition set (the spec's snapshot-list analog), so a
    // commit at version 300 reads the HEAD file only — not 300 files (the
    // superlinear shape round-5's verdict flagged). Data-file lists live
    // in per-snapshot manifest DELTAS: metadata stays O(#partitions)
    // bytes, and only time travel walks the manifest chain.
    val root = java.nio.file.Files.createTempDirectory("icb_o1").toString
    class Counting(r: String) extends IcebergLikeTable(r) {
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      override protected def readEntry(v: Long): Option[Entry] = {
        reads.incrementAndGet(); super.readEntry(v)
      }
    }
    val t = new Counting(root)
    (1 to 300).foreach(i => t.commitPartition(s"p$i", i.toLong, Seq(s"f$i")))
    t.reads.set(0)
    t.commitPartition("p301", 301L, Seq("f301"))
    assert(t.reads.get() <= 2,
      s"commit after 300 versions took ${t.reads.get()} metadata reads")
    t.reads.set(0)
    assert(t.committedAsOf(150L) == (1 to 150).map(i => s"p$i").toSet)
    assert(t.reads.get() <= 2,
      s"as-of read took ${t.reads.get()} metadata reads")
    // time travel: exact file set at the pinned snapshot (manifest chain)
    assert(t.dataFilesAsOf(150L) == (1 to 150).map(i => s"f$i"))
    assert(t.committed() == (1 to 301).map(i => s"p$i").toSet)
    // duplicate paths WITHIN one commit collapse in the visible file list
    t.commitPartition("pdup", 1L, Seq("fdup", "fdup", "f1"))
    assert(t.dataFilesAsOf(t.currentSnapshot())
      .count(f => f == "fdup" || f == "f1") == 2)
  }
}

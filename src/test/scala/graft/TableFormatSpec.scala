package graft

import org.scalatest.funsuite.AnyFunSuite

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

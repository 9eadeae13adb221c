package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact (hash groupBy),
  * n-gram Jaccard, MinHash+LSH, SimHash. Designed for the 100 TB case:
  * every method is candidate-generation-by-bucketing (shuffle on a short
  * key) followed by within-bucket verification — never an all-pairs join.
  */
object Dedup {

  /** Deterministic corpus-with-duplicates: the driver's `documents` table
    * plus planted exact copies (doc_id%10==0 → +100000) and near-dup
    * copies (doc_id%10==1 → +200000, one token appended). SQL-expressible,
    * so dedup outputs stay oracle-checkable.
    */
  def withPlantedDups(docs: DataFrame): DataFrame = {
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val near = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" appended")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(exact).unionByName(near)
  }

  // -------------------------------------------------------------------
  // Exact dedup: hash-groupBy on content digest; keep first, count copies
  // -------------------------------------------------------------------
  def exactDedup(docs: DataFrame): DataFrame =
    withPlantedDups(docs)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))

  /** The deduplicated corpus itself (keep min doc_id per digest). */
  def exactDedupKeep(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    withPlantedDups(docs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  // -------------------------------------------------------------------
  // n-gram Jaccard: 3-word shingles, set intersection/union
  // -------------------------------------------------------------------
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => array_join(slice(words, i + 1, lit(n)), " ")))
  }

  /** Jaccard similarity of planted near-dup pairs (candidates here come
    * from the planted id mapping; at scale candidates come from [[minHashLsh]]).
    * Integer sizes + one exact division → no float-compare hazards.
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val all = withPlantedDups(docs)
    val a = all.filter(col("doc_id") < 100000)
      .select(col("doc_id").as("a_id"), shingles(col("text")).as("a_sh"))
    val b = all.filter(col("doc_id") >= 200000)
      .select((col("doc_id") - 200000).as("a_id"), col("doc_id").as("b_id"),
        shingles(col("text")).as("b_sh"))
    a.join(b, "a_id").select(
      col("a_id"), col("b_id"),
      size(array_intersect(col("a_sh"), col("b_sh"))).as("n_common"),
      size(array_union(col("a_sh"), col("b_sh"))).as("n_union"),
      (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
  }

  // -------------------------------------------------------------------
  // MinHash + LSH: shingle → k minhashes → b bands → bucket-join
  // -------------------------------------------------------------------
  /** k seeded minhash signatures per doc, banded into b buckets of r rows;
    * docs sharing any band bucket are candidates. Shuffle cost: one
    * explode(b) + groupBy(band,value) — linear in corpus size, never
    * all-pairs. (Standard MinHash-LSH; Broder '97.)
    */
  def minHashSignature(text: Column, k: Int): Column =
    // ONE fold over the shingle array maintaining all k minima — shingling
    // runs once per row (k separate aggregates would re-shingle k times)
    aggregate(shingles(text), array_repeat(lit(Long.MaxValue), k),
      (acc, s) => transform(sequence(lit(0), lit(k - 1)),
        i => least(element_at(acc, i + 1), xxhash64(i, s))))

  def minHashLshCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val r = k / bands
    val sigs = withPlantedDups(docs)
      .select(col("doc_id"), minHashSignature(col("text"), k).as("sig"))
    val banded = sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, concat_ws(",", slice(col("sig"), b * r + 1, lit(r)))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      // self-join below would otherwise recompute every signature twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate pairs: co-bucketed docs (distinct across bands)
    val l = banded.as("l")
    val rr = banded.as("r")
    l.join(rr, Seq("band", "bucket"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .distinct()
  }

  /** LSH candidates verified by true Jaccard ≥ threshold. */
  def minHashDedupPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val all = withPlantedDups(docs)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    minHashLshCandidates(docs)
      .join(all.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(all.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  // -------------------------------------------------------------------
  // SimHash: 64-bit sign-of-weighted-bit-sums over token hashes
  // (Charikar '02); near-dups have small hamming distance.
  // -------------------------------------------------------------------
  /** Per-bit vote counts over token hashes. IMPORTANT perf shape: token
    * hashes are materialized once (`transform` → one xxhash64 per token),
    * and callers must materialize this column BEFORE folding it into the
    * 64-bit signature — referencing an aggregate HOF from inside another
    * fold would re-evaluate the entire token loop per bit (64×).
    */
  private def simHashBitCounts(text: Column): Column = {
    import graft.functions.BitOps
    val hashes = transform(split(text, " "), tok => xxhash64(tok))
    aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => transform(sequence(lit(0), lit(63)),
        b => element_at(acc, b + 1) +
          when(BitOps.shiftRU(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
  }

  /** Fold the 64 vote counts into the sign-bit signature. `bits` is the
    * INPUT ARRAY of the fold (zip with positions), so it is evaluated once
    * per row even after CollapseProject inlines it — never once per bit.
    */
  private def simHashFromBits(bits: Column): Column = {
    import graft.functions.BitOps
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)),
        (v, b) => struct(v.as("v"), b.as("b"))),
      lit(0L),
      (acc, e) => when(e.getField("v") > 0,
        acc.bitwiseOR(BitOps.shiftL(lit(1L), e.getField("b")))).otherwise(acc))
  }

  def simHashes(docs: DataFrame): DataFrame =
    withPlantedDups(docs)
      .select(col("doc_id"), simHashFromBits(simHashBitCounts(col("text"))).as("simhash"))

  /** Column API kept for single-expression use in tests. */
  def simHash(text: Column): Column = simHashFromBits(simHashBitCounts(text))

  /** Candidate pairs by 16-bit chunk bucketing (hamming ≤ 3 pairs must share
    * at least one of 4 chunks), verified by bit_count(xor).
    */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val h = simHashes(docs)
    val chunked = h.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk"),
          graft.functions.BitOps.shiftRU(col("simhash"), c * 16)
            .bitwiseAND(lit(0xFFFFL)).as("v"))))
        .as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.v"))
      // self-join: don't recompute the signatures for each side
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = chunked.as("l")
    val r = chunked.as("r")
    l.join(r, Seq("chunk", "v"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for a training-data pipeline: exact hashing,
  * n-gram Jaccard, MinHash+LSH, and SimHash over the `documents` table.
  *
  * Scale design notes (the point of each shape):
  *  - exact: one hash-groupBy — a single shuffle on a 128-bit key.
  *  - n-gram Jaccard: the all-pairs form below is the CORRECTNESS
  *    reference; at 100 TB you never run it directly — [[minhashLsh]] is
  *    the scale path that prunes the pair space to colliding LSH bands
  *    first (shuffle on band keys, candidates ≪ n²).
  *  - MinHash signatures are computed as a pure per-row fold over the
  *    shingle array (transform/aggregate inside codegen — NO
  *    explode+groupBy shuffle for signatures; the only shuffles are the
  *    band-bucket self-join and final distinct).
  *  - SimHash: per-row fold, zero shuffles; near-dup = signature equality
  *    or small Hamming distance on a 32-bit key.
  *
  * All hashes derive from md5 (see [[graft.functions.TextFunctions]]) so
  * the DuckDB oracle reproduces every signature bit-for-bit.
  */
object Dedup {

  /** Exact dedup: md5 of normalized text; keeper = min doc_id per hash
    * (the canonical representative a 100 TB dedup job would keep).
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(lower(col("text"))).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))

  /** Distinct word n-gram shingles per document, as an array column.
    * Documents with fewer than `n` tokens produce no row.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val ws = (0 until n).map(k => s"w[i+$k]").mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        array_distinct(expr(s"transform(sequence(0, size(w)-$n), i -> $ws)"))
          .as("sh"))
  }

  /** All-pairs n-gram Jaccard ≥ `minJaccard` via a shingle equi-join:
    * explode distinct shingles, self-join on shingle, count common,
    * |A∪B| = |A|+|B|−common.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 3,
                   minJaccard: Double = 0.2): DataFrame = {
    val sh = shingles(docs, n)
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("shingle"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
               col("a.nsh").as("nsh_a"), col("b.nsh").as("nsh_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("nsh_a") + col("nsh_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // MinHash parameters: 32 hash functions in 8 bands of 4 rows
  // (collision threshold ≈ (1/8)^(1/4) ≈ 0.59 Jaccard).
  val NumHashes = 32
  val NumBands = 8
  val RowsPerBand: Int = NumHashes / NumBands
  val MinhashPrime = 2147483647L // 2^31 - 1
  val hashA: Seq[Long] = (1 to NumHashes).map(i => i * 1299721L % MinhashPrime)
  val hashB: Seq[Long] = (1 to NumHashes).map(i => i * 15485863L % MinhashPrime)

  /** MinHash signature per document: sig[i] = min over shingles s of
    * (a_i * (h(s) mod p) + b_i) mod p. A pure per-row fold — no shuffle.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3): DataFrame = {
    val aArr = hashA.mkString("array(", "L, ", "L)")
    val bArr = hashB.mkString("array(", "L, ", "L)")
    val hx = hash60Sql("s")
    shingles(docs, n).select(
      col("doc_id"), col("sh"),
      expr(
        s"""transform(sequence(0, ${NumHashes - 1}), i ->
           |  aggregate(sh, 9223372036854775807L, (acc, s) ->
           |    least(acc, (element_at($aArr, i+1) * ($hx % $MinhashPrime)
           |                + element_at($bArr, i+1)) % $MinhashPrime)))
           |""".stripMargin).as("sig"))
  }

  /** LSH band keys: md5 over each 4-row slice of the signature. One row
    * per (doc, band) — the only exploded/shuffled representation.
    */
  def lshBands(sigs: DataFrame): DataFrame = {
    val slice = (1 to RowsPerBand)
      .map(k => s"cast(element_at(sig, $RowsPerBand*j+$k) as string)")
      .mkString("concat_ws(',', ", ", ", ")")
    sigs.select(
      col("doc_id"), col("sh"),
      expr(s"explode(transform(sequence(0, ${NumBands - 1}), j -> " +
        s"named_struct('band', j, 'bkey', md5($slice))))").as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** MinHash+LSH near-dup: candidates collide on ≥1 band; candidates are
    * then verified with exact Jaccard on the carried shingle arrays.
    */
  def minhashLsh(docs: DataFrame, n: Int = 3,
                 minJaccard: Double = 0.2): DataFrame = {
    val bands = lshBands(minhashSignatures(docs, n))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
    cands
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val SimhashBits = 32

  /** 32-bit SimHash per document: for each bit j, sum +1/−1 over distinct
    * tokens by bit j of the token hash; bit set iff the sum is positive.
    * Entirely a per-row fold — zero shuffles, linear scale-out.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val hx = hash60Sql("t")
    docs
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
      .select(
        col("doc_id"),
        expr(
          s"""aggregate(sequence(0, ${SimhashBits - 1}), 0L, (acc, j) ->
             |  acc + CASE WHEN
             |    aggregate(toks, 0L, (a2, t) ->
             |      a2 + CASE WHEN (shiftright($hx, j) & 1) = 1 THEN 1 ELSE -1 END) > 0
             |  THEN shiftleft(1L, j) ELSE 0L END)
             |""".stripMargin).as("simhash"))
  }
}

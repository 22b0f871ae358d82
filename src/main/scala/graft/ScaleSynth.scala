package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic corpus scale-up for scaling-curve measurement
  * ([[ScaleBench]], `ScalingSpec`): replicate the `documents` and
  * `embeddings` tables R-fold so a ~sf1 point exists locally without
  * driver-generated data.
  *
  * The replication is designed so the DUPLICATE STRUCTURE scales
  * linearly — the property the capped dedup paths are supposed to
  * preserve and the one a naive copy would destroy:
  *
  *  - each replica applies a replica-specific rotation of a 10-letter
  *    high-frequency alphabet to the text (`translate` — codegen'd,
  *    char-for-char, bijective). Within a replica every document gets
  *    the SAME substitution, so the replica's near-duplicate clusters
  *    are exactly the original corpus's clusters; across replicas the
  *    rotations differ, so shingle sets are disjoint-ish and
  *    cross-replica similarity collapses. Result: near-dup pairs grow
  *    ~R-fold (linear), not R²-fold, mirroring how real corpora grow —
  *    more documents, same duplication RATE.
  *  - doc_id / vec_id are offset by r·10⁷ per replica, far from both
  *    the organic id range and the +2·10⁶ dump offset
  *    `dedup_cross_corpus_lsh` applies internally.
  *  - embeddings get a small deterministic per-replica, per-dimension
  *    perturbation (keeps ANN cell assignment work honest; replica-0
  *    rows are bit-identical originals so fixed anchor/centroid sets
  *    `vec_id < k` stay constant across scale points).
  *  - events are replicated with event_id offset by r·10⁷: the graph
  *    queries hash event_id into a fixed node universe (mod 1000/997),
  *    so the offset preserves the node set while rotating the edge set
  *    per replica — edge volume grows R-fold, node count stays fixed,
  *    which is the regime a bigger event log actually produces.
  *
  * Everything is a pure projection over a union — Spark reads the base
  * parquet once per replica, no shuffle, and the write re-partitions so
  * downstream scans see uniform splits.
  *
  * A content fingerprint (`_SYNTH_FINGERPRINT`: scheme version +
  * parameters) is written beside the tables; `synthesize` rebuilds when
  * it mismatches, so a stale scale point from an older replication
  * scheme — which can have the SAME row count — is never silently
  * reused by ScaleBench/ScalingSpec.
  */
object ScaleSynth {

  /** Bump whenever the replication scheme changes (alphabet, rotation,
    * perturbation, id offsets, table set) — forces sf-point rebuild.
    */
  val SynthVersion = 3

  /** Ten high-frequency letters: rotating these changes most words of
    * English-ish text, so distinct rotations produce dissimilar texts.
    */
  val Alphabet = "etaoinsrhl"

  /** Second-level alphabet, disjoint from [[Alphabet]]: rotations over
    * disjoint letter sets compose into 10×10 = 100 pairwise-distinct
    * bijective substitutions, extending the scheme to a SECOND scale
    * decade (sf10) without weakening per-replica dissimilarity.
    */
  val Alphabet2 = "dcumfpgwyb"

  /** The replica-r text substitution: first-level rotation a = r%10 of
    * [[Alphabet]], second-level rotation b = r/10 of [[Alphabet2]].
    * r < 10 ⇒ b = 0, so the first decade's substitutions are EXACTLY
    * the original single-level scheme (scale points stay comparable
    * across rounds).
    */
  def substituted(text: Column, r: Int): Column = {
    val a = r % 10; val b = r / 10
    val first =
      if (a == 0) text
      else translate(text, Alphabet, Alphabet.drop(a) + Alphabet.take(a))
    if (b == 0) first
    else translate(first, Alphabet2, Alphabet2.drop(b) + Alphabet2.take(b))
  }

  /** R-fold replicated documents: replica 0 verbatim, replica r>0 with
    * the r-indexed two-level substitution and ids offset by r·10⁷.
    */
  def replicateDocs(docs: DataFrame, replicas: Int): DataFrame = {
    require(replicas >= 1 && replicas <= 100,
      "two-level alphabet rotations are pairwise distinct up to 100 replicas")
    (0 until replicas).map { r =>
      docs.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        substituted(col("text"), r).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  /** R-fold replicated embeddings: replica 0 verbatim (anchors and
    * centroid seeds `vec_id < k` unchanged), replica r>0 perturbed by
    * a small deterministic per-dimension offset and ids offset r·10⁷.
    */
  def replicateEmbeddings(emb: DataFrame, replicas: Int): DataFrame = {
    require(replicas >= 1 && replicas <= 100)
    (0 until replicas).map { r =>
      // r < 10 reproduces the original first-decade perturbation
      // exactly; the second-level term keeps all 100 replica offsets
      // distinct while staying small against unit-norm-ish vectors
      val mag = (r % 10) * 0.003 + (r / 10) * 0.0007
      val vec =
        if (r == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + lit(mag) * ((i % 7) - lit(3.0))).cast("float"))
      emb.select(
        (col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.reduce(_ unionAll _)
  }

  /** R-fold replicated events: ids offset r·10⁷ (node-set-preserving
    * under the graph queries' mod-1000/997 hashing), other columns
    * verbatim — R× the edge volume over the same node universe.
    */
  def replicateEvents(events: DataFrame, replicas: Int): DataFrame = {
    require(replicas >= 1 && replicas <= 100)
    (0 until replicas).map { r =>
      events.select(
        (col("event_id") + lit(r.toLong * 10000000L)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
    }.reduce(_ unionAll _)
  }

  /** The scheme identity for `outDir/_SYNTH_FINGERPRINT`. Encodes every
    * parameter whose change would alter the synthesized bytes while
    * keeping row counts identical.
    */
  def fingerprint(replicas: Int): String =
    s"v$SynthVersion|replicas=$replicas|alphabets=$Alphabet+$Alphabet2|" +
      "perturb=(r%10*0.003+r/10*0.0007)*((i%7)-3)|offset=1e7|" +
      "tables=documents,embeddings,events"

  /** Materialize an R× scale point from `fromDir` into `outDir`
    * (documents + embeddings + events — the tables the
    * dedup/ANN/intake/graph headline reads). Idempotent via the
    * `_SYNTH_FINGERPRINT` marker plus per-table row counts: a marker
    * mismatch (older scheme, different parameters) rebuilds everything
    * even when counts coincide. Returns (docRows, embRows).
    */
  def synthesize(spark: SparkSession, fromDir: String, outDir: String,
                 replicas: Int): (Long, Long) = {
    val parts = spark.sparkContext.defaultParallelism
    val want = fingerprint(replicas)
    val marker = new java.io.File(outDir, "_SYNTH_FINGERPRINT")
    val fresh =
      try {
        val src = scala.io.Source.fromFile(marker)
        try src.mkString.trim == want finally src.close()
      } catch { case scala.util.control.NonFatal(_) => false }
    def materialize(name: String, build: DataFrame => DataFrame): Long = {
      val wantRows = Tables.read(spark, fromDir, name).count() * replicas
      val path = s"$outDir/$name.parquet"
      val haveRows =
        if (!fresh) -1L
        else try spark.read.parquet(path).count()
        catch { case scala.util.control.NonFatal(_) => -1L }
      if (haveRows != wantRows)
        build(Tables.read(spark, fromDir, name))
          .repartition(parts)
          .write.mode("overwrite").parquet(path)
      wantRows
    }
    val out = (materialize("documents", replicateDocs(_, replicas)),
      materialize("embeddings", replicateEmbeddings(_, replicas)))
    materialize("events", replicateEvents(_, replicas))
    marker.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(marker, "UTF-8")
    try w.print(want) finally w.close()
    out
  }
}

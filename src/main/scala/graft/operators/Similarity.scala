package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, mirroring how a 100 TB pipeline would run them:
  *  - [[bruteForceTopK]] — exact top-k: the small query set is
  *    BROADCAST against the big corpus, so the corpus is scanned once,
  *    partition-parallel, with no shuffle of the corpus itself; per-query
  *    top-k is a windowed rank over (query, score).
  *  - [[lshTopK]] — the scale path: random-hyperplane (sign) LSH using
  *    data-derived anchor vectors; corpus and queries are bucketed by a
  *    bit signature and only same-bucket pairs are scored (equi-join
  *    shuffle on the bucket key instead of a cross product).
  *
  * All arithmetic is double-precision sequential folds (see
  * [[graft.functions.VectorFunctions]]) for oracle bit-parity.
  */
object Similarity {

  /** Exact cosine top-k: `queries` (small) broadcast-crossed with
    * `corpus`, ranked per query by (cosine desc, vec_id). Norms are
    * precomputed per vector (one pass) so each pair costs ONE dot
    * product, not three — at N corpus x Q queries that's 3x fewer
    * array folds in the hot loop; the arithmetic stays bit-identical
    * (same sqrt-of-sequential-sum values, same division).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
                           asDouble(col("embedding")).as("q_vec"))
      .withColumn("q_nrm", norm(col("q_vec")))
    val c = corpus.select(col("vec_id"),
                          asDouble(col("embedding")).as("c_vec"))
      .withColumn("c_nrm", norm(col("c_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
              (dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
                .as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rn"))
  }

  /** All-pairs near-duplicate detection by cosine ≥ `minCos` over a
    * sampled corpus (the exact reference for LSH-based near-dup).
    */
  def nearDupPairs(corpus: DataFrame, minCos: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"),
                          asDouble(col("embedding")).as("va"))
      .withColumn("na", norm(col("va")))
    val b = corpus.select(col("vec_id").as("id_b"),
                          asDouble(col("embedding")).as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Sign-LSH bucket signature: bit j = 1 iff dot(v, anchor_j) > 0.
    * Anchors are taken deterministically from the dataset itself
    * (`vec_id < nBits`), making the "random" hyperplanes reproducible in
    * any engine without a shared RNG.
    */
  def signBuckets(corpus: DataFrame, anchors: DataFrame, nBits: Int): DataFrame = {
    val anch = anchors.select(col("vec_id").as("a_id"),
                              asDouble(col("embedding")).as("a_vec"))
    corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(anch))
      .select(col("vec_id"), col("v"),
        when(dot(col("v"), col("a_vec")) > 0,
             expr("shiftleft(1L, cast(a_id as int))")).otherwise(0L).as("bit"))
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), sum(col("bit")).as("bucket"))
  }

  /** IVF-style ANN: assign every corpus vector to its best centroid
    * "cell" (argmax dot, deterministic tie-break by centroid id), then
    * answer queries by scoring only the `nProbe` most promising cells.
    *
    * This is the inverted-file layout at 100 TB: the corpus is
    * PARTITIONED BY CELL at rest, a query touches nProbe partitions
    * instead of the whole corpus, and the probe-cell join is a hash
    * join on the cell id — no cross product anywhere. Centroids are
    * data-derived (first k vectors) for engine-reproducible assignment;
    * a k-means refinement would drop in without changing the query
    * shape.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              nProbe: Int, k: Int): DataFrame = {
    val cent = centroids.select(col("vec_id").as("c_id"),
                                asDouble(col("embedding")).as("cv"))
    def scoredCells(df: DataFrame) =
      df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("v"), col("c_id"),
                dot(col("v"), col("cv")).as("cd"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cd").desc, col("c_id"))
    val assigned = scoredCells(corpus)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cell"))
      .withColumn("c_nrm", norm(col("v")))
    val probes = scoredCells(queries)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("v").as("q_vec"),
              col("c_id").as("cell"))
      .withColumn("q_nrm", norm(col("q_vec")))
    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
              (dot(col("q_vec"), col("v")) / (col("q_nrm") * col("c_nrm")))
                .as("cos_sim"))
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rn"))
  }

  /** Approximate top-k: score only same-bucket (query, corpus) pairs. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, anchors: DataFrame,
              nBits: Int, k: Int): DataFrame = {
    val cb = signBuckets(corpus, anchors, nBits)
      .withColumn("c_nrm", norm(col("v")))
    val qb = signBuckets(queries, anchors, nBits)
      .select(col("vec_id").as("q_id"), col("v").as("q_vec"), col("bucket"))
      .withColumn("q_nrm", norm(col("q_vec")))
    val scored = cb.join(qb, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
              (dot(col("q_vec"), col("v")) / (col("q_nrm") * col("c_nrm")))
                .as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rn"))
  }
}

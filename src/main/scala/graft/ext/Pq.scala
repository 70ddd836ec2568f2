package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (IVF-PQ's compression rung — Jégou et al.
  * 2011): split each D-dim vector into m subvectors, train a small
  * codebook per SUBSPACE with the engine's existing Lloyd loop
  * ([[Similarity.kmeansTrain]] — cosine assignment, per-iteration
  * 6-dp rounding, so training itself is oracle-replayable), and store
  * each vector as m codes. After int8's 4× (q124), PQ is the next
  * memory rung: m=8 byte-sized codes vs 64 floats is 32× before
  * parquet encoding; search scans CODES and scores by ADC —
  * per-query per-subspace dot tables, m lookups + adds per candidate
  * ([[graft.functions.PqAdc]]).
  *
  * Metric contract: code ASSIGNMENT is cosine (scale-invariant,
  * reuses NearestCentroid's exact tie/fallback semantics the oracles
  * already replay); ADC SCORING estimates the INNER PRODUCT
  * `dot(q, x̂) = Σ_j dot(q_j, c_{j,code_j})` (linearity of the dot
  * over concatenation), ranked desc with neighbor-id tie-break.
  * Every float step is engineered for bit-exact SQL replay — see
  * PqAdc's scaladoc.
  *
  * Scale shape: training touches m small sub-corpora (each Lloyd
  * round is a broadcast-assignment scan + a dims+1-doubles-per-group
  * partial agg); encoding is ONE pure map-side scan (m codegen'd
  * argmax expressions over slices — no shuffle, no join); ADC search
  * is a scan of the m-codes table + the same partial top-k tail the
  * float/int8 paths use. Nothing corpus-sized ever shuffles.
  */
object Pq {

  /** Per-subspace codebooks: `codebooks(j)` lists (cid, centroid). */
  type Codebooks = IndexedSeq[Seq[(Long, Array[Double])]]

  private def subVec(vecCol: String, j: Int, dsub: Int): Column =
    slice(col(vecCol).cast("array<double>"), j * dsub + 1, dsub)

  /** Training slice keeps the corpus element type (array<float>) —
    * [[Similarity.kmeansTrain]]'s typed mean aggregator consumes
    * floats and does its own double cast at assignment, exactly like
    * the full-vector IVF path.
    */
  private def subVecRaw(vecCol: String, j: Int, dsub: Int): Column =
    slice(col(vecCol), j * dsub + 1, dsub)

  /** Train m per-subspace codebooks with the shared Lloyd loop.
    * `seeds` rows become initial centroids (their ids are the code
    * ids — the caller picks deterministic seeds, e.g. the k lowest
    * vec_ids, exactly like the IVF gates).
    */
  def trainCodebooks(corpus: DataFrame, seeds: DataFrame, m: Int, dims: Int,
                     iters: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Codebooks = {
    require(m > 0 && dims % m == 0, s"pq: dims $dims not divisible by m=$m")
    val dsub = dims / m
    (0 until m).map { j =>
      def sub(df: DataFrame): DataFrame =
        df.select(col(idCol), subVecRaw(vecCol, j, dsub).as(vecCol))
      Similarity.kmeansTrain(sub(corpus), sub(seeds), iters, dsub,
          idCol, vecCol)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
    }
  }

  /** Encode: ONE map-side scan adding `codesCol` = the m per-subspace
    * nearest-centroid ids (array<bigint>). Drop the float column for
    * the persisted PQ face.
    */
  def encode(corpus: DataFrame, codebooks: Codebooks, dims: Int,
             vecCol: String = "embedding",
             codesCol: String = "pq_codes"): DataFrame = {
    val m = codebooks.size
    val dsub = dims / m
    corpus.withColumn(codesCol, array((0 until m).map { j =>
      graft.functions.NearestCentroid.nearest(
        subVec(vecCol, j, dsub), codebooks(j))
    }: _*))
  }

  /** ADC top-k: score every encoded row against every query (queries
    * are a driver-side handful, like the centroid matrices) in one
    * scan — per-query ADC columns, posexplode, then the family's
    * partial top-k tail. Returns (query_id, neighbor_id, rank,
    * adc_dot).
    */
  def adcKnn(encoded: DataFrame, codebooks: Codebooks,
             queries: Seq[(Long, Array[Double])], k: Int,
             idCol: String = "vec_id",
             codesCol: String = "pq_codes"): DataFrame = {
    require(queries.nonEmpty, "pq adcKnn: no queries")
    val qids = array(queries.map(q => lit(q._1)): _*)
    val scores = array(queries.map { case (_, qv) =>
      graft.functions.PqAdc.score(col(codesCol), codebooks, qv) }: _*)
    val scored = encoded
      .select(col(idCol).as("neighbor_id"),
        posexplode(scores).as(Seq("qi", "adc_dot")))
      .withColumn("query_id", element_at(qids, col("qi") + 1))
      .filter(col("adc_dot").isNotNull)
    Similarity.rankTopK(scored, "query_id", k, "adc_dot")
  }

  /** Exact inner-product brute top-k over the FLOAT corpus — PQ's
    * ground truth ([[adcKnn]]'s metric without the quantization), for
    * recall gates and the rerank tail. Returns (query_id,
    * neighbor_id, rank, dot).
    */
  def bruteDotKnn(corpusF: DataFrame, queries: Seq[(Long, Array[Double])],
                  k: Int, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val spark = corpusF.sparkSession
    import spark.implicits._
    val qdf = broadcast(queries.toDF("query_id", "q_vec"))
    Similarity.rankTopK(
      corpusF.select(col(idCol).as("neighbor_id"),
          col(vecCol).cast("array<double>").as("c_vec"))
        .crossJoin(qdf)
        .withColumn("dot",
          graft.functions.DotProduct.dot(col("q_vec"), col("c_vec"))),
      "query_id", k, "dot")
  }

  /** IVF × PQ — the full production ANN composition (FAISS's IVF-PQ
    * shape, assembled from the engine's own parts): float centroid
    * PROBE ranking (the q35/q127 probe dataflow — centroids are tiny,
    * probe ranking costs nothing) over a corpus stored as PQ CODES,
    * so the corpus-sized part of the search scans m codes per vector
    * (32× fewer bytes than floats here) and scores by ADC inside the
    * probed clusters only.
    *
    * Probe sets are computed WITH the column cosine (crossJoin over
    * the broadcast centroid frame + window rank — the exact dataflow
    * the IVF oracles replay) and collected: queries are a driver-side
    * handful, so the probe table is queries × nprobe rows. The search
    * itself is ONE map-side scan of the coded corpus: per query, ADC
    * scores gated on probed-cluster membership, then the family's
    * partial top-k tail.
    *
    * @param encodedAssigned (idCol, pq_codes, centroid_id) — [[encode]]
    *                        over an assigned corpus (or a loaded
    *                        [[IvfIndex]] assignments frame re-encoded)
    */
  def ivfAdcKnn(encodedAssigned: DataFrame, centroids: DataFrame,
                codebooks: Codebooks, queries: Seq[(Long, Array[Double])],
                k: Int, nprobe: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                codesCol: String = "pq_codes"): DataFrame = {
    require(queries.nonEmpty, "pq ivfAdcKnn: no queries")
    val spark = encodedAssigned.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val qdf = queries.map { case (id, v) => (id, v.toSeq) }
      .toDF("query_id", "q_vec")
    val c = centroids.select(col(idCol).as("centroid_id"),
      col(vecCol).cast("array<double>").as("cent_vec"))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qc_cos").desc, col("centroid_id"))
    val probeRows = qdf.crossJoin(broadcast(c))
      .withColumn("qc_cos", Similarity.cosine(col("q_vec"), col("cent_vec")))
      .withColumn("qc_rank", row_number().over(qw))
      .filter(col("qc_rank") <= nprobe)
      .select(col("query_id"), col("centroid_id")).collect()
    val probes: Map[Long, Set[Long]] = probeRows.toSeq
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        (q, rs.map(_.getLong(1)).toSet) }
    val qids = array(queries.map(q => lit(q._1)): _*)
    val scores = array(queries.map { case (qid, qv) =>
      val probed = probes.getOrElse(qid, Set.empty[Long])
      if (probed.isEmpty) lit(null).cast("double")
      else when(col("centroid_id").isInCollection(probed),
        graft.functions.PqAdc.score(col(codesCol), codebooks, qv))
    }: _*)
    val scored = encodedAssigned
      .select(col(idCol).as("neighbor_id"),
        posexplode(scores).as(Seq("qi", "adc_dot")))
      .filter(col("adc_dot").isNotNull)
      .withColumn("query_id", element_at(qids, col("qi") + 1))
    Similarity.rankTopK(scored, "query_id", k, "adc_dot")
  }

  /** Two-stage rerank (the q124 rerankKnn pattern at the PQ rung): a
    * WIDE ADC pass over the codes, then an exact float dot re-rank of
    * just the candidates. With `candidates ≥ |corpus|` it EQUALS the
    * float brute ranking (spec-pinned); a few × k buys PQ's scan at
    * near-exact recall.
    */
  def rerankKnn(encoded: DataFrame, corpusF: DataFrame,
                codebooks: Codebooks, queries: Seq[(Long, Array[Double])],
                k: Int, candidates: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                codesCol: String = "pq_codes"): DataFrame = {
    require(candidates >= k,
      s"pq rerankKnn: candidates ($candidates) must be >= k ($k)")
    val spark = encoded.sparkSession
    import spark.implicits._
    val wide = adcKnn(encoded, codebooks, queries, candidates,
        idCol, codesCol)
      .select(col("query_id"), col("neighbor_id"))
    val qdf = broadcast(queries.toDF("query_id", "q_vec"))
    val scored = wide
      .join(corpusF.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("c_vec")), Seq("neighbor_id"))
      .join(qdf, Seq("query_id"))
      .withColumn("dot",
        graft.functions.DotProduct.dot(col("q_vec"), col("c_vec")))
    Similarity.rankTopK(scored, "query_id", k, "dot")
  }
}

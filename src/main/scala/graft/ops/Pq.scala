package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression and ANN — the
  * standard large-scale vector-memory layout (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
  * split each D-dim vector into `m` subvectors of `subDim` dims, learn
  * a small per-subspace codebook with Lloyd's k-means, and store each
  * vector as `m` one-byte-ish codes — D×4 bytes become m codes, e.g.
  * 64 floats → 8 codes (32× smaller). Queries stay full-precision and
  * score candidates with ADC (asymmetric distance computation): one
  * m×k* lookup table of partial squared distances per query, then each
  * candidate's approximate distance is an m-term table sum — no
  * decompression, no full-vector math per candidate.
  *
  * This is the codebook sibling of [[Similarity.quantizeInt8]] (SQ8
  * compresses components independently; PQ learns the subspace
  * structure) and composes with the IVF family: coarse lists from
  * [[Similarity.kmeansCentroids]] pick candidates, ADC scores them —
  * IVF-PQ, via `adcSearch(candidates = Some(ivfProbeCandidates))`.
  *
  * Scale shape:
  *  - codebook learning — per Lloyd round, ONE pass over the corpus:
  *    the subvector expansion is a narrow generator (no shuffle), the
  *    m×k* codebook is broadcast, assignment is a map-side-combining
  *    argmin, means are two hash aggregates keyed (sub, code[, d]) —
  *    the exact [[Similarity.kmeansCentroids]] shape with the subspace
  *    riding as a grouping column, NOT m separate k-means jobs (m
  *    corpus scans);
  *  - encoding — broadcast join + argmin, fully codegen'd via the
  *    native array_sqdiff; output is the narrow (vec_id, sub, code)
  *    code table;
  *  - ADC — the per-query LUT (m×k* rows per query) is broadcast onto
  *    the code table; per-candidate sums collapse by map-side partial
  *    aggregation before the one shuffle on (query, neighbor). With
  *    `candidates` supplied (IVF-PQ) the scan is ~nprobe/nlists of the
  *    code table instead of all of it.
  *
  * Determinism (the oracle-parity contract, inherited from
  * [[Similarity.kmeansCentroids]]): init codebooks are the `initIds`
  * vectors' subvectors rounded to 6 digits; distances round(sqrt(L2²),
  * 6) with code tie-break; `orderedMeans = true` folds member values
  * in vec_id order for bit-exact cross-engine means (the default
  * `false` is the scale path — plain partial-aggregating avg); empty
  * codes keep their previous centroid. ADC partial distances are
  * rounded to 6 digits and summed as DECIMAL(28,10) — exact and
  * associative, so the total is bit-identical under any partitioning
  * and in the DuckDB oracle (q88/q89).
  */
object Pq {

  /** Narrow subvector expansion: (vec_id, sub, v) where v = the sub-th
    * `subDim`-slice of the vector, widened to double element-wise (the
    * deterministic IEEE widening the SQL oracle mirrors). One
    * projection + one generator — no shuffle.
    *
    * Every row is guarded: a vector whose length differs from m·subDim
    * would otherwise yield a silently clamped final slice (too short)
    * or silently ignored trailing dimensions (too long, ADVICE r11)
    * and either fail deep in execution with array_sqdiff's
    * length-mismatch error (ADVICE r9) or quietly quantize a prefix —
    * instead it raises naming m, subDim and the offending id (the
    * lshBuckets guard convention). Callers quantizing a prefix of a
    * wider vector must slice explicitly before calling in.
    */
  private def subvectors(emb: DataFrame, idCol: String, vecCol: String,
                         m: Int, subDim: Int): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .select(col("vec_id"),
        when(size(col("vec")) === m * subDim, col("vec"))
          .otherwise(raise_error(concat(
            lit(s"Pq: embedding length != m*subDim = $m*$subDim for vec_id="),
            col("vec_id").cast("string"),
            lit(", got "), size(col("vec")).cast("string")))).as("vec"),
        explode(expr(s"sequence(0L, ${m - 1}L)")).as("sub"))
      .select(col("vec_id"), col("sub"),
        expr(s"transform(slice(vec, CAST(sub * $subDim + 1 AS INT), $subDim)," +
          " x -> CAST(x AS DOUBLE))").as("v"))

  /** Argmin code per (vec_id, sub) against a broadcast codebook frame
    * (sub, code, c_vec) — the [[Similarity]] nearest-centroid shape
    * (min-struct aggregate, map-side combine, no window) keyed by the
    * subspace too. Output: (vec_id, sub, code).
    */
  private def nearestCode(sv: DataFrame, cbs: DataFrame): DataFrame =
    sv.join(broadcast(cbs), "sub")
      .select(col("vec_id"), col("sub"), col("code"),
        expr("round(sqrt(array_sqdiff(v, c_vec)), 6)").as("dist"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("code"))).as("mm"))
      .select(col("vec_id"), col("sub"), col("mm.code").as("code"))

  /** Learn the per-subspace codebooks: `iters` Lloyd rounds over every
    * (vector, subspace) pair at once. `initIds` seeds code c of EVERY
    * subspace with vector c's sub-th slice (k* = initIds.size codes per
    * subspace). Output: (sub, code, c_vec).
    *
    * Same pinning contract as [[Similarity.kmeansCentroids]]: each
    * round's m×k*-row codebook frame is lazily checkpointed so the
    * unrolled plan stays linear in `iters`.
    */
  def codebooks(emb: DataFrame, idCol: String, vecCol: String,
                m: Int, subDim: Int, initIds: Seq[Long], iters: Int,
                orderedMeans: Boolean = false,
                pinIterations: Boolean = true,
                checkpointDir: Option[String] = None): DataFrame = {
    require(m >= 1 && subDim >= 1, "m and subDim must be >= 1")
    require(initIds.nonEmpty, "initIds must be non-empty")
    // a duplicated id would seed two IDENTICAL (sub, code) rows and the
    // ADC LUT join would then double-count that code's partial distance
    require(initIds.distinct.size == initIds.size, "initIds must be distinct")
    require(iters >= 0, "iters must be >= 0")
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    val sv = subvectors(emb, idCol, vecCol, m, subDim)
    val init = sv.filter(col("vec_id").isin(initIds: _*))
      .select(col("sub"), col("vec_id").as("code"),
        expr("transform(v, x -> round(x, 6))").as("c_vec"))
    // engine-stable mean: ordered left-fold over members sorted by
    // vec_id (double addition is not associative) vs the scale-path
    // plain avg — the kmeansCentroids convention verbatim
    val mean =
      if (orderedMeans)
        expr("""round(aggregate(array_sort(collect_list(named_struct('vec_id', vec_id, 'x', x))),
               |               CAST(0.0 AS DOUBLE), (a, s) -> a + s.x) / count(x), 6)""".stripMargin)
      else round(avg(col("x")), 6)
    (1 to iters).foldLeft(init) { (cbs, _) =>
      val assign = nearestCode(sv, cbs)
      val dims = assign.join(sv, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), col("vec_id"),
          posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("sub"), col("code"), col("d"))
        .agg(mean.as("mn"))
      val updated = dims.groupBy(col("sub"), col("code"))
        .agg(expr("transform(array_sort(collect_list(struct(d, mn))), s -> s.mn)")
          .as("c_vec_new"))
      val next = cbs.join(updated, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("c_vec_new"), col("c_vec")).as("c_vec"))
      if (pinIterations) Checkpoints.pin(next, checkpointDir, eager = false)
      else next
    }
  }

  /** PQ-encode the corpus against learned codebooks: each vector's
    * compressed form is its m (sub → code) assignments. Output:
    * (vec_id, sub, code) — the narrow code table ADC scans instead of
    * the vectors.
    */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             cbs: DataFrame, m: Int, subDim: Int): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    nearestCode(subvectors(emb, idCol, vecCol, m, subDim), cbs)
  }

  /** Residual frame for IVF-PQ: every vector minus its assigned coarse
    * centroid, as (vec_id, centroid_id, rvec) with rvec double-
    * widened. PQ codebooks learned on residuals are far tighter than
    * on raw vectors — within a coarse list the residuals share scale,
    * which is why IVF-PQ encodes residuals (Jégou et al. 2011, §III).
    * One broadcast argmin + one narrow zip_with — no extra shuffle.
    */
  def residuals(emb: DataFrame, idCol: String, vecCol: String,
                coarse: DataFrame): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    Similarity.assignWith(emb, idCol, vecCol, coarse)
      .select(col("vec_id"), col("centroid_id"))
      .join(emb.select(col(idCol).as("vec_id"), col(vecCol).as("vec")), "vec_id")
      .join(broadcast(coarse), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        expr("zip_with(vec, c_vec, (x, c) -> CAST(x AS DOUBLE) - CAST(c AS DOUBLE))")
          .as("rvec"))
  }

  /** Full IVF-PQ search with RESIDUAL encoding — the canonical
    * large-scale layout: corpus vectors live as per-list residual
    * codes; each query probes its `nprobe` nearest coarse lists and
    * scores each list's members with a LIST-LOCAL lookup table built
    * from the query's residual to THAT centroid. Candidate generation
    * is implicit: the LUT join on (centroid_id, sub, code) reaches
    * exactly the probed lists' code rows — ~nprobe/nlists of the code
    * table per query, full vectors touched only for queries and the
    * m×k* codebook. approx_dist estimates squared L2 in the original
    * space (|| (q − c) − r̂ ||²); DECIMAL sums keep it engine-exact.
    *
    * `cbs` must be codebooks learned on [[residuals]] of the same
    * `coarse` frame. Output: (query_id, neighbor_id, approx_dist,
    * rank), rank <= k, self excluded.
    */
  def ivfPqSearch(emb: DataFrame, idCol: String, vecCol: String,
                  coarse: DataFrame, cbs: DataFrame, queryIds: Seq[Long],
                  k: Int, nprobe: Int, m: Int, subDim: Int,
                  checkpointDir: Option[String] = None): DataFrame =
    ivfPqSearchCoded(
      residualCodeRows(emb, idCol, vecCol, cbs, coarse, m, subDim,
        checkpointDir),
      emb, idCol, vecCol, coarse, cbs, queryIds, k, nprobe, m, subDim)

  /** [[ivfPqSearch]]'s READ half against a pre-encoded residual code
    * table (the [[graft.Stores]] posture — codebooks trained offline,
    * codes a written table): `codes` is (vec_id, centroid_id, sub,
    * code) from [[residualCodeRows]]. Per query only its own vector
    * rows leave the embedding table (probe ranking + residual LUT);
    * the (centroid_id, sub, code) LUT join IS the candidate generator
    * against the stored codes — scoring, rounding, and ranking
    * identical to the inline form (it delegates here).
    */
  def ivfPqSearchCoded(codes: DataFrame, emb: DataFrame, idCol: String,
                       vecCol: String, coarse: DataFrame, cbs: DataFrame,
                       queryIds: Seq[Long], k: Int, nprobe: Int,
                       m: Int, subDim: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    // query residual per PROBED centroid (queries × nprobe rows)
    val qe = emb.filter(col(idCol).isin(queryIds: _*))
    val rq = Similarity.probeCentroids(emb, idCol, vecCol, coarse,
        queryIds, nprobe)
      .join(broadcast(qe.select(col(idCol).as("query_id"),
        col(vecCol).as("vec"))), "query_id")
      .join(broadcast(coarse), "centroid_id")
      .select(col("query_id"), col("centroid_id"),
        expr("zip_with(vec, c_vec, (x, c) -> CAST(x AS DOUBLE) - CAST(c AS DOUBLE))")
          .as("rvec"))
    // list-local LUT (the subvector expansion keeps the centroid key);
    // its (centroid_id, sub, code) join key IS the candidate generator
    // when joined onto the code table
    val lut = rq
      .select(col("query_id"), col("centroid_id"), col("rvec"),
        explode(expr(s"sequence(0L, ${m - 1}L)")).as("sub"))
      .select(col("query_id"), col("centroid_id"), col("sub"),
        expr(s"slice(rvec, CAST(sub * $subDim + 1 AS INT), $subDim)").as("v"))
      .join(broadcast(cbs), "sub")
      .select(col("query_id"), col("centroid_id"), col("sub"), col("code"),
        expr("CAST(round(array_sqdiff(v, c_vec), 6) AS DECIMAL(28,10))").as("pd"))
    val scored = codes
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"),
        col("sub"), col("code"))
      .join(broadcast(lut), Seq("centroid_id", "sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("pd")).cast("double").as("approx_dist"))
    adcRank(scored, k)
  }

  /** The store-row form of the raw-vector PQ family — the shared body
    * of the one-shot store build and [[pqIngest]], so the two paths
    * cannot diverge in encoding or schema: every vector's m codes at
    * FIXED codebooks, carrying its coarse-list assignment (the
    * [[Similarity.assignWith]] argmin) as the store's physical
    * partition key. Output: (vec_id, centroid_id, sub, code) — m rows
    * per vector, each a couple of longs; the 32×-compressed layout a
    * 100 TB vector memory actually persists.
    */
  def codeRows(emb: DataFrame, idCol: String, vecCol: String,
               cbs: DataFrame, coarse: DataFrame,
               m: Int, subDim: Int): DataFrame =
    encode(emb, idCol, vecCol, cbs, m, subDim)
      .join(Similarity.assignWith(emb, idCol, vecCol, coarse)
        .select(col("vec_id"), col("centroid_id")), "vec_id")
      .select(col("vec_id"), col("centroid_id"), col("sub"), col("code"))

  /** [[codeRows]]'s RESIDUAL sibling (the Jégou-canonical IVF-PQ
    * layout): codes quantize (vec − assigned coarse centroid). The
    * residual frame is pinned — it feeds both the encoding and the
    * centroid_id carry-join; unpinned, the corpus-scale assignment
    * argmin + zip_with would execute twice in one plan.
    */
  def residualCodeRows(emb: DataFrame, idCol: String, vecCol: String,
                       cbs: DataFrame, coarse: DataFrame,
                       m: Int, subDim: Int,
                       checkpointDir: Option[String] = None): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    val res = Checkpoints.pin(residuals(emb, idCol, vecCol, coarse),
      checkpointDir, eager = false)
    encode(res, "vec_id", "rvec", cbs, m, subDim)
      .join(res.select(col("vec_id"), col("centroid_id")), "vec_id")
      .select(col("vec_id"), col("centroid_id"), col("sub"), col("code"))
  }

  /** Incremental PQ-store ingest — the [[Similarity.ivfIngest]]
    * lifecycle applied to the code table: encode ONLY the new vectors
    * at the store's FIXED codebooks (+ coarse centroids) and APPEND
    * their code rows to the bucketed table; history is never re-read
    * or re-encoded, and Spark validates the bucket spec against the
    * existing table so a mismatched layout fails loudly. `residual`
    * picks which of the two store-row forms this table holds. The
    * trade is the IVF one: new vectors quantize at the store's
    * codebooks — re-training is a store rewrite, everywhere.
    */
  def pqIngest(newVecs: DataFrame, idCol: String, vecCol: String,
               cbs: DataFrame, coarse: DataFrame, table: String,
               buckets: Int, m: Int, subDim: Int,
               residual: Boolean = false,
               slice: Option[Long] = None): Unit = {
    val rows0 =
      if (residual)
        residualCodeRows(newVecs, idCol, vecCol, cbs, coarse, m, subDim)
      else codeRows(newVecs, idCol, vecCol, cbs, coarse, m, subDim)
    // `slice` tags the appended rows with an ingest-generation id (the
    // warehouse at-least-once guard keys on it); serving reads select
    // (vec_id, sub, code[, centroid_id]) and ignore the extra column
    val rows = slice.fold(rows0)(id => rows0.withColumn("slice", lit(id)))
    Bucketing.appendBucketed(rows, table, Seq("centroid_id"), buckets,
      sortCols = Seq("centroid_id"))
  }

  /** ADC top-k: score every encoded vector (or only `candidates` —
    * the IVF-PQ composition) against each full-precision query via the
    * per-query lookup table. approx_dist is the SQUARED L2 distance
    * between the query and the candidate's reconstruction (the ADC
    * estimator); rank ascending, neighbor-id tie-break, self excluded.
    * Output: (query_id, neighbor_id, approx_dist, rank), rank <= k.
    */
  def adcSearch(emb: DataFrame, idCol: String, vecCol: String,
                cbs: DataFrame, queryIds: Seq[Long], k: Int,
                m: Int, subDim: Int,
                candidates: Option[DataFrame] = None): DataFrame =
    adcSearchCoded(
      encode(emb, idCol, vecCol, cbs, m, subDim),
      emb, idCol, vecCol, cbs, queryIds, k, m, subDim, candidates)

  /** [[adcSearch]]'s READ half against a pre-encoded code table (the
    * [[graft.Stores]] posture): `codes` is (vec_id, sub, code) — any
    * extra columns (centroid_id in the stored form) are ignored. Only
    * the query vectors leave the embedding table; scoring, rounding,
    * and ranking are identical to the inline form (it delegates
    * here).
    */
  def adcSearchCoded(codes: DataFrame, emb: DataFrame, idCol: String,
                     vecCol: String, cbs: DataFrame, queryIds: Seq[Long],
                     k: Int, m: Int, subDim: Int,
                     candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    val c = codes.select(col("vec_id").as("neighbor_id"),
      col("sub"), col("code"))
    val lut = queryLut(emb, idCol, vecCol, cbs, queryIds, m, subDim)
    val contrib = candidates match {
      case Some(cand) =>
        cand.select(col("query_id"), col("neighbor_id"))
          .join(c, "neighbor_id")
          .join(broadcast(lut), Seq("query_id", "sub", "code"))
      case None => c.join(broadcast(lut), Seq("sub", "code"))
    }
    val scored = contrib
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("pd")).cast("double").as("approx_dist"))
    adcRank(scored, k)
  }

  /** IVF + ADC against the STORED code table — the q92 composition
    * served store-first: candidate generation is implicit in the
    * centroid_id join (each query's `nprobe` probed lists' members
    * contribute their m code rows; a vector lives in exactly one
    * list, so no dedup is needed), scoring is the same broadcast-LUT
    * m-term DECIMAL sum. Row-for-row equal to
    * `adcSearch(candidates = Some(ivfCandidates(...)))` — both join
    * the probed lists' members to the query's LUT on (query_id, sub,
    * code) — without the corpus re-assignment ivfCandidates performs
    * per call: the assignment lives IN the store.
    */
  def adcSearchProbed(codes: DataFrame, emb: DataFrame, idCol: String,
                      vecCol: String, coarse: DataFrame, cbs: DataFrame,
                      queryIds: Seq[Long], k: Int, nprobe: Int,
                      m: Int, subDim: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    graft.functions.VectorExprs.ensureRegistered(emb.sparkSession)
    val probe = Similarity.probeCentroids(emb, idCol, vecCol, coarse,
      queryIds, nprobe)
    val lut = queryLut(emb, idCol, vecCol, cbs, queryIds, m, subDim)
    val scored = codes
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"),
        col("sub"), col("code"))
      .join(broadcast(probe), "centroid_id")
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("pd")).cast("double").as("approx_dist"))
    adcRank(scored, k)
  }

  /** Per-query ADC lookup table: partial squared distance to every
    * (sub, code) centroid — m×k* rows per query, rounded then DECIMAL
    * so the m-term candidate sums are exact and order-independent
    * under any partitioning (and in the DuckDB oracle).
    */
  private def queryLut(emb: DataFrame, idCol: String, vecCol: String,
                       cbs: DataFrame, queryIds: Seq[Long],
                       m: Int, subDim: Int): DataFrame =
    subvectors(emb.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol,
        m, subDim)
      .join(broadcast(cbs), "sub")
      .select(col("vec_id").as("query_id"), col("sub"), col("code"),
        expr("CAST(round(array_sqdiff(v, c_vec), 6) AS DECIMAL(28,10))").as("pd"))

  /** Shared serving rank: per-query ascending-distance top-k with
    * neighbor-id tie-break — partitioned by query_id (queries are the
    * parallelism unit; never a global single-task rank).
    */
  private def adcRank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI'11): split each 64-dim vector into
  * `Subspaces` 8-dim subvectors, learn a tiny per-subspace codebook,
  * and store each vector as `Subspaces` one-byte codes — a 32× memory
  * reduction that is THE standard scale path for billion-vector ANN
  * (IVF-PQ). Search uses asymmetric distance computation (ADC): per
  * query, a (Subspaces × K) lookup table of exact query-to-centroid
  * distances; a vector's approximate distance is the sum of its codes'
  * table entries.
  *
  * Everything is declarative and bounded:
  *  - codebooks are (Subspaces·K) rows — broadcast-safe at ANY corpus
  *    size (bounded by parameters, like the kmeans centroid set);
  *  - training/encode shuffles only (subspace, centroid)-keyed
  *    aggregates; the per-vector argmin is a partition-local
  *    row_number (WindowGroupLimit), never a global sort;
  *  - ADC joins codes to the broadcast tables on (subspace, code) —
  *    an equijoin, no per-pair vector math at query time.
  *
  * Deterministic by the library's standard discipline: distances round
  * to 6 dp before any argmin/rank, ties break on the lower centroid or
  * vector id, seeds are the first K vectors (no RNG), and centroid
  * updates go through integer-quantized sums.
  */
object Pq {

  val Subspaces = 8
  val SubDim = 8
  val K = 16
  val TopK = 10

  /** (vec_id, subspace, sub) — the flattened subvector view. */
  private def subvectors(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(Subspaces - 1))).as("subspace"),
        col("emb"))
      .select(col("vec_id"), col("subspace"),
        slice(col("emb"), col("subspace") * SubDim + 1, lit(SubDim)).as("sub"))

  /** Squared L2 via the native codegen [[graft.plans.L2Squared]]
    * (sequential accumulation — bit-stable), rounded to 6 dp so every
    * downstream argmin/rank compares exact values. */
  private def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(graft.plans.ColumnBridge.column(graft.plans.L2Squared(
      graft.plans.ColumnBridge.expression(a),
      graft.plans.ColumnBridge.expression(b))), 6)

  /** Nearest codebook entry per (vector, subspace): broadcast the
    * bounded codebook, equijoin on subspace, then a min_by AGGREGATE
    * for the argmin — it combines map-side, so one candidate row per
    * (vector, subspace) reaches the shuffle, where a row_number
    * window would shuffle and sort all K candidates per vector (K×
    * the shuffle volume, × every Lloyd round). Ties break on the
    * lower code via the (d, code) ordering struct. */
  private def assign(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), "subspace")
      .select(col("vec_id"), col("subspace"), col("sub"), col("code"),
        l2sq(col("sub"), col("cent")).as("d"))
      .groupBy("vec_id", "subspace")
      .agg(min_by(struct(col("code"), col("d"), col("sub")),
        struct(col("d"), col("code"))).as("m"))
      .select(col("vec_id"), col("subspace"), col("m.sub").as("sub"),
        col("m.code").as("code"), col("m.d").as("d"))

  /** One quantized-mean codebook update (cf. Cluster.recenter — same
    * order-independent integer-sum discipline, keyed by
    * (subspace, code, position)). */
  private def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("subspace"), col("code"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy("subspace", "code", "pos")
      .agg(sum(round(col("v") * 1e6).cast("long")).as("isum"),
        count(lit(1)).as("cnt"))
      .select(col("subspace"), col("code"), col("pos"),
        round(col("isum").cast("double") / 1e6 / col("cnt").cast("double"), 6).as("v"))
      .groupBy("subspace", "code")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("cent"))

  /** Train per-subspace codebooks (seeds = the K lowest-id vectors'
    * subvectors — rank-based, so ANY id space works, not just one
    * starting at 0; `iters` Lloyd rounds) and return
    * (subspace, code, cent). */
  def trainCodebooks(embeddings: DataFrame, iters: Int = 2): DataFrame =
    trainOn(subvectors(embeddings), iters)

  /** Training over an already-derived subvector frame — annPq
    * materializes ONE subvector frame and feeds it to training and
    * encoding both, so the scan+explode+slice pipeline runs once
    * instead of once per Lloyd round. */
  private def trainOn(subs: DataFrame, iters: Int): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    // K rows after the TakeOrdered limit; the rank window runs on that
    // bounded frame only
    val seedIds = subs.select(col("vec_id")).distinct()
      .orderBy("vec_id").limit(K)
      .withColumn("code",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
    val seeds = subs.join(broadcast(seedIds), "vec_id")
      .select(col("subspace"), col("code"), col("sub").as("cent"))
    val last = (1 until iters).foldLeft(assign(subs, seeds)) { (a, _) =>
      assign(subs, recenter(a))
    }
    recenter(last)
  }

  /** Encode every vector: (vec_id, subspace, code, qerr) where qerr is
    * the per-subspace quantization error (sums to the vector's total
    * reconstruction error — the PQ quality diagnostic). */
  def encode(embeddings: DataFrame, codebook: DataFrame): DataFrame =
    assign(subvectors(embeddings), codebook)
      .select(col("vec_id"), col("subspace"), col("code"), col("d").as("qerr"))

  /** ADC top-k: per query, exact distances to every codebook entry
    * (the bounded lookup table), then one equijoin of codes against
    * the broadcast table and a per-query sum + partition-local top-k.
    */
  def search(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
             k: Int = TopK, excludeSelf: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qsubs = subvectors(queries)
      .select(col("vec_id").as("q_id"), col("subspace"), col("sub").as("qsub"))
    // Subspaces·K rows per query — bounded by parameters × query count
    val tables = qsubs.join(broadcast(codebook), "subspace")
      .select(col("q_id"), col("subspace"), col("code"),
        l2sq(col("qsub"), col("cent")).as("d"))
    val byDist = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    codes.join(broadcast(tables), Seq("subspace", "code"))
      // self-exclusion ONLY when the query ids live in the corpus id
      // space (annPq) — with external query ids an accidental match
      // would silently hide a legitimate nearest neighbor
      .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .groupBy("q_id", "vec_id")
      .agg(round(sum("d"), 6).as("adc"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("adc"))
      .withColumn("rank", row_number().over(byDist))
      .filter(col("rank") <= k)
      .orderBy("q_id", "rank")
  }

  /** ADC shortlist + exact re-rank — the standard two-stage PQ search:
    * the lookup-table pass prunes to `shortlistFactor · k` candidates
    * per query (never touching a full vector), then ONLY the shortlist
    * pairs pay an exact L2 against the original vectors. The re-rank
    * join is id-keyed over shortlistFactor·k·queries rows — bounded by
    * parameters, not the corpus.
    */
  def searchRerank(queries: DataFrame, vectors: DataFrame, codes: DataFrame,
                   codebook: DataFrame, k: Int = TopK,
                   shortlistFactor: Int = 5,
                   excludeSelf: Boolean = false): DataFrame = {
    require(shortlistFactor > 0, s"shortlistFactor must be positive, got $shortlistFactor")
    val shortlist = search(queries, codes, codebook, k * shortlistFactor, excludeSelf)
      .select(col("q_id"), col("n_id"))
    val qv = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val nv = vectors.select(col("vec_id").as("n_id"),
      col("embedding").cast("array<double>").as("n_emb"))
    val byDist = Window.partitionBy("q_id").orderBy(col("dist"), col("n_id"))
    shortlist
      .join(broadcast(qv), "q_id")
      .join(nv, "n_id")
      .select(col("q_id"), col("n_id"), l2sq(col("q_emb"), col("n_emb")).as("dist"))
      .withColumn("rank", row_number().over(byDist))
      .filter(col("rank") <= k)
      .orderBy("q_id", "rank")
  }

  /** Registered query: train → encode → ADC shortlist → exact re-rank
    * for the standard 8-query set; rows-only (PQ internals are not
    * SQL-expressible — cf. MinHash/SimHash; PqSpec holds the recall
    * and reconstruction guarantees). */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // one materialized subvector frame feeds every training round AND
    // the encode pass (16 bytes + one 8-dim array per row — tiny)
    val subs = subvectors(emb).localCheckpoint(false)
    val codebook = trainOn(subs, iters = 2).localCheckpoint(false)
    val codes = assign(subs, codebook)
      .select(col("vec_id"), col("subspace"), col("code"))
    val queries = emb.filter(col("vec_id") < Similarity.QuerySetSize)
    searchRerank(queries, emb, codes, codebook, excludeSelf = true)
  }
}

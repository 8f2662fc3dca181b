package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `graft.scale.approx` switch. `false` (default): exact
  * distinct counts / full-buffer percentile grids — the verification
  * contract every oracle hashes against. `true`: the documented
  * sketch swaps (HLL distinct counts, mergeable percentile sketches)
  * — the defaults a 100 TB run flips on, trading a bounded estimate
  * error for fixed-size aggregation state and, where the exact path
  * self-joins on a gram key, for eliminating that join entirely.
  * Read per query from the session conf so a pipeline can flip it at
  * runtime without re-registering anything; ScaleApproxSpec bounds
  * each swap against its exact twin on the sf0.01 corpus.
  */
object Scale {
  val ApproxKey = "graft.scale.approx"

  def approx(spark: SparkSession): Boolean =
    spark.conf.getOption(ApproxKey).exists(_.toBoolean)

  /** Build with the approx flag forced ON, restoring the session's
    * prior setting afterwards — the registered `*_approx` twins use
    * this so the 100 TB sketch path is driver-value-checked without
    * the caller owning session state. Sound because the exact/sketch
    * branch is taken at DataFrame-CONSTRUCTION time (the wrappers
    * read the conf while building the plan, not at execution). */
  def withApprox[A](spark: SparkSession)(build: => A): A = {
    val prev = spark.conf.getOption(ApproxKey)
    spark.conf.set(ApproxKey, "true")
    try build
    finally prev match {
      case Some(v) => spark.conf.set(ApproxKey, v)
      case None => spark.conf.unset(ApproxKey)
    }
  }

  // ---------------------------------------------------------------
  // Two-phase global-order decompositions.
  //
  // `Window.orderBy(...)` with no partitionBy requires AllTuples —
  // Spark plans it as Exchange SinglePartition + one reducer task, so
  // every global rank / running sum / global lag funnels the whole
  // frame through one core. The standard decomposition (the
  // range-partitioned sort every distributed sort already does, made
  // explicit for window semantics):
  //   1. one map-side sketch pass picks ~equi-depth boundaries of the
  //      LEADING sort key (fixed-size QuantileSummaries, no shuffle);
  //   2. every row gets a bucket id by comparing to the boundary
  //      literals — a pure map; all rows with EQUAL leading keys land
  //      in the same bucket, so concatenating per-bucket sorted runs
  //      IS the global order;
  //   3. per-bucket counts/sums (≤ `buckets` rows) collect to the
  //      driver, prefix-summed into offsets, and re-enter the plan as
  //      an array LITERAL indexed by bucket id — no join, no global
  //      window, nothing driver-side is data-sized;
  //   4. rank / running sum = offset(bucket) + the same window
  //      function over Window.partitionBy(__bkt) — `buckets`-way
  //      parallel instead of 1.
  // Output is IDENTICAL to the single-window form whenever `order` is
  // a total order (the callers' contract), whatever boundaries the
  // sketch picks — boundaries only move rows between buckets, never
  // reorder them. The input frame is narrow by contract (project
  // first); it is localCheckpoint'ed so the sketch, count and rank
  // passes share one materialization instead of recomputing upstream
  // regex/shuffle work three times.
  // ---------------------------------------------------------------

  private def defaultBuckets(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt.max(1)

  /** Phases 1–2: add `__sk` (the leading key as double — the cast is
    * monotone, and bucket membership only needs monotonicity; ties
    * that collapse in double share a bucket and re-separate in the
    * local window's exact-typed orderBy) and `__bkt` (count of
    * boundaries strictly below `__sk`, via one fold over the literal
    * boundary array). */
  private def bucketed(df: DataFrame, keyAsc: Column, buckets: Int): DataFrame = {
    val keyed = df.withColumn("__sk", keyAsc.cast("double"))
      .localCheckpoint(false) // 3 consumers: sketch, counts, final plan
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("__sk", probs, 0.001).distinct.sorted
    if (bounds.isEmpty) keyed.withColumn("__bkt", lit(0))
    else {
      val arr = array(bounds.map(lit(_)): _*)
      keyed.withColumn("__bkt",
        aggregate(arr, lit(0),
          (acc, b) => acc + when(b < col("__sk"), 1).otherwise(0)))
    }
  }

  /** Driver-side prefix sums over the bounded per-bucket frame:
    * offsets(i) = Σ totals over buckets < i, as an array literal
    * column indexed by `__bkt`, plus the grand total. */
  private def offsetsOf(perBucket: Array[(Int, Long)]): (Column, Long) = {
    val m = perBucket.toMap
    val maxB = if (m.isEmpty) 0 else m.keys.max
    val offs = new Array[Long](maxB + 1)
    var acc = 0L
    var i = 0
    while (i <= maxB) { offs(i) = acc; acc += m.getOrElse(i, 0L); i += 1 }
    (array(offs.map(lit(_)).toIndexedSeq: _*), acc)
  }

  /** Global dense row_number (1-based, column `__rank`) by the total
    * order `order`, without a single-partition window. `keyAsc` must
    * be an ASCENDING proxy of `order`'s leading key (negate for
    * desc). Returns the ranked frame (input columns + `__rank`) and
    * the total row count (for [[ntileFromRank]]). */
  def twoPhaseRank(df: DataFrame, keyAsc: Column, order: Seq[Column],
                   buckets: Int = 0): (DataFrame, Long) = {
    val b = bucketed(df, keyAsc, if (buckets > 0) buckets else defaultBuckets(df))
    val counts = b.groupBy(col("__bkt")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)) // ≤ buckets rows
    val (offArr, total) = offsetsOf(counts)
    val w = Window.partitionBy(col("__bkt")).orderBy(order: _*)
    (b.withColumn("__rank",
        element_at(offArr, col("__bkt") + 1) + row_number().over(w).cast("long"))
      .drop("__sk", "__bkt"), total)
  }

  /** Global running sum of `value` (column `__running`) over the total
    * order `order` — the prefix-sum twin of [[twoPhaseRank]]: offsets
    * carry each bucket's value total instead of its row count. */
  def twoPhaseRunningSum(df: DataFrame, keyAsc: Column, order: Seq[Column],
                         value: Column, buckets: Int = 0): DataFrame = {
    val b = bucketed(df, keyAsc, if (buckets > 0) buckets else defaultBuckets(df))
    val sums = b.groupBy(col("__bkt"))
      .agg(coalesce(sum(value), lit(0L)).cast("long").as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)) // ≤ buckets rows
    val (offArr, _) = offsetsOf(sums)
    val w = Window.partitionBy(col("__bkt")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("__running",
        element_at(offArr, col("__bkt") + 1) + sum(value).over(w))
      .drop("__sk", "__bkt")
  }

  /** lag(value, 1) over (PARTITION BY `part` ORDER BY `order`) when
    * the partition vocabulary is small (parallelism would equal it):
    * sub-bucket each partition by `keyAsc` ranges, lag locally within
    * (part, bucket), and carry each bucket's LAST value (max_by the
    * order struct) to the next non-empty bucket through a bounded
    * (parts × buckets) frame that broadcast-joins back. Adds
    * `__prev` (null on each part's first row, like the plain lag). */
  def boundaryCarryLag(df: DataFrame, part: String, keyAsc: Column,
                       order: Seq[Column], value: Column,
                       buckets: Int = 0): DataFrame = {
    val b = bucketed(df, keyAsc, if (buckets > 0) buckets else defaultBuckets(df))
    val localW = Window.partitionBy(col(part), col("__bkt")).orderBy(order: _*)
    val lasts = b.groupBy(col(part), col("__bkt"))
      .agg(max_by(value, struct(order: _*)).as("__last"))
    val byPart = Window.partitionBy(col(part)).orderBy(col("__bkt"))
    val carry = lasts // bounded: ≤ parts × buckets rows
      .withColumn("__carry", lag(col("__last"), 1).over(byPart))
      .select(col(part), col("__bkt"), col("__carry"))
    b.withColumn("__prev_local", lag(value, 1).over(localW))
      .join(broadcast(carry), Seq(part, "__bkt"))
      .withColumn("__prev", coalesce(col("__prev_local"), col("__carry")))
      .drop("__sk", "__bkt", "__prev_local", "__carry")
  }

  /** Spark/DuckDB NTILE(tiles) derived from a global 1-based rank and
    * the total row count: the first `total mod tiles` tiles take
    * ⌈total/tiles⌉ rows, the rest ⌊total/tiles⌋ — integer-exact, so
    * it reproduces the window function bit-for-bit. `rankCol` is a
    * column NAME (the expression needs integer `div`). */
  def ntileFromRank(rankCol: String, tiles: Int, total: Long): Column = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    if (total < tiles) col(rankCol).cast("int")
    else {
      val q = total / tiles
      val r = total % tiles
      val cut = r * (q + 1)
      expr(s"""CAST(CASE WHEN $rankCol <= $cut
              |  THEN ($rankCol - 1) div ${q + 1} + 1
              |  ELSE $r + ($rankCol - 1 - $cut) div $q + 1 END AS INT)"""
        .stripMargin)
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. A shuffled equi-join sends every row
  * of a key to one reducer; at 100 TB a handful of hot keys (the empty
  * document, a bot user id) straggle or OOM that reducer. Salting
  * splits each hot key across `salts` reducers: the skewed side gets a
  * salt in [0, salts), the other side replicates each row to all
  * salts, and the join key becomes (key, salt). AQE's skew-join
  * handles sort-merge cases adaptively; explicit salting remains the
  * tool for aggregations and for joins AQE can't split.
  */
object Skew {

  /** Equi-join with the LEFT side salted (left = the skewed/fact side,
    * right = the replicated side — keep it the smaller one: it costs
    * `salts`× its size in shuffle volume). Result is row-identical to
    * the plain join (SkewSpec asserts it). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    // Any salt assignment is correct (it only spreads rows) — but it
    // MUST vary within a key, so the row id goes into the hash; a salt
    // of the key alone would send every row of a hot key to one
    // reducer and defeat the whole mitigation.
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * aggregate on (key, salt) first so every reducer sees at most
    * 1/salts of a hot key's rows, then combine the partials. `aggs`
    * maps column → partial-agg; only algebraic aggregates (sum, count,
    * min, max) compose this way. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("total"), sum("__pcnt").as("rows"))
}

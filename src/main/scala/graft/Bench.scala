package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scheduler, codegen compiler, parquet reader
    // init) so the first timed query doesn't absorb ~4 s of one-time
    // startup that has nothing to do with its plan.
    spark.range(1000).selectExpr("sum(id)").collect()
    // Guarded: a missing table must surface as per-query errors below,
    // not abort the run before any JSON is emitted.
    try spark.read.parquet(s"$sfDir/nation.parquet").limit(1).collect()
    catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Optional comma-separated allowlist for local iteration (the
    // round driver never sets it → full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // "" (e.g. unset shell var) = no filter, not "run nothing"
    // A typo'd name must not read as a vacuous green run (stderr — the
    // driver parses raw stdout for the JSON line).
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(s"WARNING: SPARK_GRAFT_ONLY names not registered: ${unknown.mkString(",")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // Materialize every row through the full physical plan —
      // `df.count()` alone would let Parquet answer from footer
      // metadata and prune all columns, benchmarking a no-op.
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        // A crashed query must not masquerade as a fast run: no timing
        // entry, an explicit error record, and a nonzero exit below.
        errors(name) = e.getClass.getSimpleName
      }
      // Queries are independent: drop whatever blocks this one
      // persisted (cache() / localCheckpoint) so storage doesn't
      // accumulate across 90 queries and tax later timings. Outside
      // the timed region either way.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val qs = timings.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (timings.nonEmpty) timings.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

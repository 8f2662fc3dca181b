package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Cluster, Dedup}
import graft.sources.Tables

/** Scale-rehearsal probes that Bench can't express: PARAMETERIZED
  * variants of registered queries (the sampled recall audit at the
  * s-value a given corpus size calls for — SURVEY row 156's power
  * knob). Same timing convention as Bench (full materialization via
  * toRdd.count, min over SPARK_GRAFT_REPEAT runs, one JSON line).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.Rehearse <probe>[,<probe>…]`
  */
object Rehearse {
  def probes: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "lsh_recall_s8" -> ((s, d) => Dedup.lshRecallOf(Tables.documents(s, d), 0.5, sampleOneIn = 8)),
    "lsh_recall_s16" -> ((s, d) => Dedup.lshRecallOf(Tables.documents(s, d), 0.5, sampleOneIn = 16)),
    "lsh_recall_s32" -> ((s, d) => Dedup.lshRecallOf(Tables.documents(s, d), 0.5, sampleOneIn = 32)),
    // The hubness audit at the k ∝ n posture (SURVEY row 341): frozen
    // k=8 over a ×100 vector corpus is the deliberate Σ‖cell‖²
    // quadratic corner; a deployment sizes cells to the corpus.
    "hubness_k256" -> ((s, d) =>
      Cluster.hubnessAuditOf(Tables.embeddings(s, d), k = 256, iters = 2)),
    // The mutual-kNN twin at the same k ∝ n posture (SURVEY row 354).
    "mutual_knn_k256" -> ((s, d) =>
      Cluster.mutualKnnRateOf(Tables.embeddings(s, d), k = 256, iters = 2)))

  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(probes.keys.toSeq)
    val unknown = names.filterNot(probes.keySet)
    if (unknown.nonEmpty) sys.error(
      s"unknown probe(s) ${unknown.mkString(", ")}; available: ${probes.keys.toSeq.sorted.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt.max(1)
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup
    val timings = names.map { name =>
      var best = Double.MaxValue
      (1 to repeat).foreach { i =>
        val t0 = System.nanoTime()
        probes(name)(spark, sfDir).queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"REHEARSE $name run$i $s%.3f")
        best = math.min(best, s)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      "\"" + name + "\":" + f"$best%.3f"
    }
    println(s"""{"rehearse":{${timings.mkString(",")}},"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level timing probe for hotspot queries (not part of the
  * driver contract; run with `runMain graft.DevProbe <sfDir>`).
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm up.
    noop(operators.Dedup.ddMinhashLsh(spark, sfDir))

    val docs = Tables.documents(spark, sfDir)
    time("signatures+lshPairs (ddMinhashLsh)") {
      noop(operators.Dedup.ddMinhashLsh(spark, sfDir))
    }
    time("verifiedPairs (ddNgramJaccard)") {
      noop(operators.Dedup.ddNgramJaccard(spark, sfDir))
    }
    val edges = time("edge materialization (checkpoint)") {
      operators.Dedup.canonicalLabels(docs)
    }
    time("dd_canonical full") {
      noop(operators.Dedup.ddCanonical(spark, sfDir))
    }
    time("dd_components full") {
      noop(operators.Dedup.ddComponents(spark, sfDir))
    }
    time("q_cheapest_supplier full") {
      noop(operators.Relational.qCheapestSupplier(spark, sfDir))
    }
    time("ct_balancer_report full") {
      noop(operators.Containers.ctBalancerReport(spark, sfDir))
    }
    time("ct_cluster_state full") {
      noop(operators.Containers.ctClusterState(spark, sfDir))
    }
    spark.stop()
  }
}

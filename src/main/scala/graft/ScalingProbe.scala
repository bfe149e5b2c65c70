package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.LongAdder

/** Dev-only scale experiment (NOT part of the driver contract): replicate
  * the sf0.1 tables N× with remapped keys into /tmp, run headline queries
  * at both scales, and report wall-time and shuffle-byte scaling ratios.
  * A query whose shuffle bytes or time grow faster than N is hiding
  * superlinear work that 1000 executors cannot save at 100 TB; ~N ratios
  * are the evidence SURVEY §5 cites for the linear-scaling claims.
  *
  * The replication keeps dimension tables fixed and multiplies fact rows
  * (orders/lineitem/events/documents), offsetting primary keys per replica
  * so grain and referential integrity survive; per-user/per-hour densities
  * grow N× — deliberately stressing the skew paths. Document texts get a
  * per-replica suffix so the dedup family sees near-dups, not a degenerate
  * N-way exact-duplicate corpus.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4
    // args: [replication] [names-or-"-"-for-default] [json-out-path]
    val names: Seq[String] =
      if (args.length > 1 && args(1) != "-") args(1).split(",").toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority",
        "q9_product_profit", "q21_waiting_supplier", "ns_du",
        "ns_snapshot_diff", "ns_compaction_plan", "ns_top_keys_per_bucket",
        "ev_sessionize", "ev_value_quantiles", "ev_dau_sketch",
        "dd_minhash_lsh", "dd_canonical", "tx_tokens", "pipe_curate",
        "sim_topk_bruteforce")
    val base = "/root/testdata/sf0.1"
    val scaled = s"/tmp/graft_scaled_x$n"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    generate(spark, base, scaled, n)

    def run(fn: (SparkSession, String) => DataFrame, dir: String): (Double, Long) = {
      shuffleRead.reset(); shuffleWrite.reset()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      // Listener events post asynchronously and the bus is private API;
      // a short settle suffices for a dev probe's byte counters.
      Thread.sleep(500)
      ((System.nanoTime() - t0) / 1e9, shuffleRead.sum + shuffleWrite.sum)
    }

    println(f"${"query"}%-24s ${"t_base"}%8s ${"t_x" + n}%8s ${"t_ratio"}%8s " +
      f"${"sh_base"}%10s ${"sh_x" + n}%10s ${"sh_ratio"}%8s")
    val results = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: not registered")
        case Some(fn) =>
          try {
            // Warm-up BOTH dirs before measuring: codegen/footers, and —
            // decisively for the trained-model consumers — the per-dir
            // centroid/codebook memos. Without the scaled warm-up, the
            // scaled measurement pays the training job (memo miss on the
            // fresh dir) that the base measurement already had cached,
            // and the ratio compares training+query against query alone
            // (the r14 sim_ivf_balance 270x false alarm).
            run(fn, base)
            run(fn, scaled)
            val (tb, sb) = run(fn, base)
            val (ts, ss) = run(fn, scaled)
            val mb = sb / 1e6
            val ms = ss / 1e6
            val shRatio = if (sb == 0) 0.0 else ss.toDouble / sb
            println(f"$name%-24s $tb%8.2f $ts%8.2f ${ts / tb}%8.2f " +
              f"$mb%9.1fM $ms%9.1fM $shRatio%8.2f")
            results(name) = f"""{"t_base_s": $tb%.3f, "t_x${n}_s": $ts%.3f, """ +
              f""""t_ratio": ${ts / tb}%.3f, "shuffle_base_bytes": $sb, """ +
              f""""shuffle_x${n}_bytes": $ss, "shuffle_ratio": $shRatio%.3f}"""
          } catch {
            case e: Throwable => println(s"$name FAILED: ${e.getMessage}")
          }
      }
    }
    // Optional per-round artifact (VERDICT r9 #7): third arg = output JSON
    // path; scale regressions become diffable between rounds.
    if (args.length > 2) {
      val body = results.map { case (k, v) => s""""$k": $v""" }
        .mkString(s"""{"replication": $n, "queries": {""", ", ", "}}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(2)), body)
      println(s"wrote ${args(2)}")
    }
    spark.stop()
  }

  /** Writes the N×-replicated tables (idempotent: skips if present). */
  def generate(spark: SparkSession, base: String, out: String, n: Int): Unit = {
    val done = new java.io.File(s"$out/_DONE")
    if (done.exists()) return
    val rep = explode(sequence(lit(0), lit(n - 1))).as("r")
    def load(t: String) = spark.read.parquet(s"$base/$t.parquet")
    def save(df: DataFrame, t: String) =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    // Dims copied as-is.
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => save(load(t), t))
    val KeyOff = 100000000L
    save(load("orders").select(col("*"), rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * KeyOff)
      .drop("r"), "orders")
    save(load("lineitem").select(col("*"), rep)
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * KeyOff)
      .drop("r"), "lineitem")
    save(load("events").select(col("*"), rep)
      .withColumn("event_id", col("event_id") + col("r") * KeyOff)
      .drop("r"), "events")
    save(load("documents").select(col("*"), rep)
      .withColumn("doc_id", col("doc_id") + col("r") * KeyOff)
      .withColumn("text",
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r"), "documents")
    val emb = load("embeddings")
    val idCol = emb.columns.head // id column name as shipped by the driver
    save(emb.select(col("*"), rep)
      .withColumn(idCol, col(idCol) + col("r") * KeyOff)
      .drop("r"), "embeddings")
    done.getParentFile.mkdirs(); done.createNewFile(); ()
  }
}

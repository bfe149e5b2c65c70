package graft

import org.apache.spark.sql.functions.col

/** Every registered query must EXECUTE against schema-identical EMPTY
  * tables — the degenerate input a 100 TB job always encounters (empty
  * partitions, a fresh namespace, a day with no events). Rows may be zero
  * or a legitimate all-null/zero report row; what must not happen is a
  * runtime exception (division by zero, empty-reduce, sequence underflow,
  * NULL propagation into typed code paths). A failure here is a latent
  * production crash that the populated-data oracle gate cannot see.
  */
class EmptyTablesSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-empty-tables").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on empty tables") {
      val df = fn(spark, emptyDir)
      df.collect() // any runtime exception fails the test with its cause
      assert(df.schema.fields.nonEmpty)
    }
  }

  test("empty-table results keep the populated schema") {
    // Spot-check: a representative query per family resolves to the same
    // schema on empty and populated inputs (no dtype drift from
    // NULL-dominated branches).
    val names = Seq("q1_pricing_summary", "ns_du", "ev_sessionize",
      "dd_exact", "tx_quality", "pipe_curate")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      assert(fn(spark, emptyDir).schema == fn(spark, sf).schema,
        s"$n schema drifts on empty input")
    }
  }
}

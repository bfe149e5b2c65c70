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

  test("EVERY query keeps the populated schema on empty input") {
    // Universal schema-drift gate (VERDICT r9 #8): the analyzed schema
    // must be input-independent for every registered query — a dtype that
    // flips on NULL-dominated branches breaks downstream readers exactly
    // on the empty partitions a 100 TB job always has. Analysis-only per
    // query (no execution), so the universal sweep stays cheap.
    val drifts = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val e = fn(spark, emptyDir).schema
        val p = fn(spark, sf).schema
        if (e == p) None else Some(s"$name: empty=$e vs populated=$p")
    }
    assert(drifts.isEmpty,
      s"${drifts.size} queries drift schema on empty input:\n${
        drifts.mkString("\n")}")
  }
}

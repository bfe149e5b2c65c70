package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump the executed plan of one query for shape audits. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = if (args.nonEmpty) args(0) else "dd_canonical"
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

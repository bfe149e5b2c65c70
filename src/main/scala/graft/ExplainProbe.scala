package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump plans of one query for shape audits.
  * `runMain graft.ExplainProbe <name> [sfDir] [outFile]` — writes the
  * `.explain("formatted")` text (the plans/r{n}/ artifact format); honors
  * SPARK_GRAFT_CPUS and the SPARK_GRAFT_FANOUT A/B lever.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_FANOUT")
      .foreach(v => spark.conf.set("spark.graft.scan.fanout", v))
    val name = if (args.nonEmpty) args(0) else "dd_canonical"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(name)(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    if (args.length > 2) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(2)),
        formatted)
      println(s"wrote ${args(2)}")
    } else println(formatted)
    spark.stop()
  }
}

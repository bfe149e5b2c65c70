package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardening (VERDICT r14 #1 — the driver's correctness leg silently
  * produced an empty artifact in r12 and r14 while bench ran fine; the
  * likely cause is a wall-clock budget the serial dump outgrew at 262
  * queries):
  *  - `oracle_sql.json` is written FIRST, before any query runs, so even
  *    a partial (timed-out / killed) dump yields a partial artifact the
  *    DuckDB compare can score instead of `{}`;
  *  - queries run CONCURRENTLY on a fixed thread pool
  *    (SPARK_GRAFT_VERIFY_THREADS, default 8). At verify scale the
  *    per-query cost is dominated by single-threaded driver work
  *    (analysis/codegen) and small-job scheduling, so overlapping
  *    queries cuts total wall time several-fold. All registered queries
  *    are pure DataFrame builders over a shared immutable SparkSession
  *    (no temp views, no session state; the one shared memo is a
  *    ConcurrentHashMap) — concurrent construction is safe, and FAIR
  *    scheduling keeps one heavy query from starving the rest;
  *  - per-query wall time and a final `[verify] DONE ok=… fail=…`
  *    summary go to stderr, so a future empty artifact is diagnosable
  *    from the driver log instead of silent.
  * Exit code stays 0 on per-query failures (each is reported loudly and
  * scored MISSING by the compare; a partial artifact must not be
  * discarded wholesale) — tools/check.py is the pass/fail authority.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg (local dev only; the driver always passes two):
    // comma-separated query names to restrict the dump to.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val t0 = System.nanoTime()
    val ok = new AtomicInteger(0)
    val failed = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(threads)
    names.foreach { case (name, fn) =>
      pool.execute { () =>
        val tq = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          ok.incrementAndGet()
          System.err.println(
            f"[verify] $name ok ${(System.nanoTime() - tq) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          failed.incrementAndGet()
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(24, TimeUnit.HOURS)
    System.err.println(f"[verify] DONE ok=${ok.get} fail=${failed.get} " +
      f"of ${names.size} in ${(System.nanoTime() - t0) / 1e9}%.1fs " +
      f"(threads=$threads, cpus=$cpus)")
    spark.stop()
  }
}

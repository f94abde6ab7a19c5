package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run ONE registered query and dump it to `$outDir/$name` (parquet). On
    * failure, write `$outDir/$name.error.txt` with the exception chain and a
    * truncated logical plan, so a red round leaves its errors behind as
    * ARTIFACTS rather than vanishing into stderr (round 10's 39 failures
    * surfaced only as silent absence — this is the fix the verdict asked
    * for twice). Never throws: one broken query must not stop the dump of
    * the other ~130. */
  private[graft] def dumpOne(spark: SparkSession, name: String,
                             fn: (SparkSession, String) => DataFrame,
                             sfDir: String, outDir: String): Boolean =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .map(t => s"${t.getClass.getName}: ${t.getMessage}").mkString("\ncaused by: ")
      // the plan is best-effort: a query that failed to BUILD has no frame
      val plan = try fn(spark, sfDir).queryExecution.logical.treeString.take(4000)
                 catch { case _: Throwable => "(plan unavailable — query failed to build)" }
      val trace = e.getStackTrace.take(12).map("  at " + _).mkString("\n")
      try Files.writeString(Paths.get(s"$outDir/$name.error.txt"),
        s"query: $name\n$chain\n\nstack (top):\n$trace\n\nlogical plan (truncated):\n$plan\n")
      catch { case w: Throwable =>
        System.err.println(s"[verify] $name: could not write error artifact: ${w.getMessage}")
      }
      false
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for targeted dev iteration (same
    // contract as Bench's); the driver never sets it, so the gate always
    // dumps — and oracle_sql.json below is filtered to the same subset so
    // the checker only compares what was dumped
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_QUERIES names no registered query: ${unknown.mkString(", ")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) => dumpOne(spark, name, fn, sfDir, outDir) }
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
    spark.stop()
  }
}

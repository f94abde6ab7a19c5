package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The Verify catch path: a failing query must leave a per-query error
  * ARTIFACT (`<name>.error.txt`) in the out dir — the evidence contract a
  * red round depends on — and must not abort the run (dumpOne returns
  * false instead of throwing). */
class VerifySpec extends SparkSpec {

  test("dumpOne writes parquet for a working query and returns true") {
    val out = Files.createTempDirectory("graft-verify-ok-").toString
    try {
      val ok = Verify.dumpOne(spark, "dev_ok",
        (s, _) => s.range(3).toDF("id"), Sf0001, out)
      assert(ok)
      assert(spark.read.parquet(s"$out/dev_ok").count() === 3)
      assert(!Files.exists(java.nio.file.Paths.get(s"$out/dev_ok.error.txt")))
    } finally graft.operators.StatefulQueries.deleteRecursively(
      java.nio.file.Paths.get(out))
  }

  test("dumpOne writes an error artifact when the query throws at execution") {
    val out = Files.createTempDirectory("graft-verify-err-").toString
    try {
      // fails at ACTION time (ANSI division by zero would be folded; use a
      // deliberately failing parquet path so the write action throws)
      val ok = Verify.dumpOne(spark, "dev_broken",
        (s, _) => s.read.parquet("/nonexistent/graft/path"), Sf0001, out)
      assert(!ok)
      val art = java.nio.file.Paths.get(s"$out/dev_broken.error.txt")
      assert(Files.exists(art), "expected dev_broken.error.txt artifact")
      val txt = Files.readString(art)
      assert(txt.contains("query: dev_broken"))
      assert(txt.toLowerCase.contains("path"))
    } finally graft.operators.StatefulQueries.deleteRecursively(
      java.nio.file.Paths.get(out))
  }

  test("dumpOne writes an error artifact when the query fails to build") {
    val out = Files.createTempDirectory("graft-verify-build-").toString
    try {
      val ok = Verify.dumpOne(spark, "dev_nobuild",
        (_, _) => sys.error("boom at build time"), Sf0001, out)
      assert(!ok)
      val txt = Files.readString(
        java.nio.file.Paths.get(s"$out/dev_nobuild.error.txt"))
      assert(txt.contains("boom at build time"))
      assert(txt.contains("plan unavailable"))
    } finally graft.operators.StatefulQueries.deleteRecursively(
      java.nio.file.Paths.get(out))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The SQL registration surface + bucketed-join physical-plan check. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered SQL functions match the DSL expressions") {
    GraftFunctions.register(spark)
    graft.io.Tables.documents(spark, Sf0001).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_poly_fold(graft_token_hashes(text)) AS fp,
        |  graft_simhash(graft_token_hashes(text), 32) AS sh,
        |  size(graft_shingle_hashes(graft_token_hashes(text), 3)) AS nsh
        |FROM docs_sql ORDER BY doc_id""".stripMargin).collect()
    val viaDsl = graft.operators.TextOps.fingerprints(spark, Sf0001)
      .join(graft.operators.Dedup.simhash(spark, Sf0001), "doc_id")
      .orderBy(col("doc_id")).collect()
    assert(viaSql.length === viaDsl.length)
    viaSql.zip(viaDsl).foreach { case (s, d) =>
      assert(s.getLong(1) === d.getAs[Long]("fp_poly"))
      assert(s.getLong(2) === d.getAs[Long]("simhash"))
    }
    val dotRow = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head()
    assert(dotRow.getDouble(0) === 32.0)
    // chunk hashes: ceil(5/2) = 3 chunks; last is the partial [5]
    val chunkRow = spark.sql(
      "SELECT graft_chunk_hashes(array(1L, 2L, 3L, 4L, 5L), 2) AS c").head()
    assert(chunkRow.getSeq[Long](0) === Seq(1L * 31 + 2, 3L * 31 + 4, 5L))
  }

  test("spark.sql.extensions entry point injects graft functions at session build") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared-session init before detaching it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // no active/default session -> the builder constructs a NEW session on
      // the existing SparkContext and APPLIES the extensions. (The
      // spark.sql.extensions=graft.GraftExtensions config form is the same
      // applyExtensions path, but it is a STATIC conf read from the
      // SparkContext at build time — unreachable on this suite's reused
      // context, so the test drives the builder hook directly.)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base)
      val row = s2.sql(
        """SELECT graft_poly_fold(graft_token_hashes('abc')) AS fp,
          |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin).head()
      assert(row.getLong(0) === 96354L)
      assert(row.getDouble(1) === 11.0)
      // the base session is untouched: no leakage between session catalogs
      assert(intercept[Exception](
        base.sql("SELECT graft_never_registered(1)")).toString.nonEmpty)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("bucketed co-partitioned join plans without a shuffle exchange") {
    val li = graft.io.Tables.lineitem(spark, Sf0001)
    val o = graft.io.Tables.orders(spark, Sf0001)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bkt")
    // disable broadcast so the join strategy must co-locate via bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}

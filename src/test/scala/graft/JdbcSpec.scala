package graft

import org.apache.spark.sql.functions._
import graft.io.{Jdbc, Tables}

/** JDBC source/sink against the Derby embedded engine that ships in the
  * Spark distribution — the no-external-service stand-in for any
  * JDBC-reachable warehouse. */
class JdbcSpec extends SparkSpec {

  test("JDBC round-trip: sink, partitioned parallel source, pushdown") {
    val home = java.nio.file.Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", home) // keep derby.log out of the repo
    val url = s"jdbc:derby:$home/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val orders = Tables.orders(spark, Sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Jdbc.write(orders, url, "ORDERS_T", props)

    // partitioned read: 4 range slices, each its own connection
    val back = Jdbc.readPartitioned(spark, url, "ORDERS_T", "o_orderkey", 4, props)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === orders.count())
    // values survive the round-trip exactly
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)

    // predicate reaches the database scan (JDBCRelation pushes filters)
    val cut = orders.agg(avg(col("o_totalprice"))).head().getDouble(0)
    val filtered = Jdbc.read(spark, url, "ORDERS_T", props)
      .filter(col("o_totalprice") > cut)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"), p)
    assert(filtered.count() === orders.filter(col("o_totalprice") > cut).count())
  }

  test("mixed-case table name survives the write → bounds-probe → read cycle") {
    val home = java.nio.file.Files.createTempDirectory("graft_derby_mc").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val nations = Tables.nation(spark, Sf0001).select("n_nationkey", "n_name")
    // the probe must reference the table the same way the read does, or a
    // case-folding database (Derby) resolves them differently
    Jdbc.write(nations, url, "Nations_Mixed", props)
    val back = Jdbc.readPartitioned(spark, url, "Nations_Mixed", "n_nationkey", 3, props)
    assert(back.count() === nations.count())
    assert(back.exceptAll(nations).isEmpty)
  }

  test("bounds probe saturates instead of overflowing at Long.MaxValue") {
    val home = java.nio.file.Files.createTempDirectory("graft_derby_ov").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    import spark.implicits._
    val extremes = Seq(0L, 42L, Long.MaxValue).toDF("id")
    Jdbc.write(extremes, url, "EXTREMES_T", props)
    // pre-fix this threw (lowerBound > upperBound after the +1 wrapped)
    val back = Jdbc.readPartitioned(spark, url, "EXTREMES_T", "id", 2, props)
    assert(back.as[Long].collect().sorted === Array(0L, 42L, Long.MaxValue))
  }
}

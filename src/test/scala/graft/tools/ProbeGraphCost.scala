package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
object ProbeGraphCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    Tables.events(spark, dir).count()
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o  = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c  = Tables.table(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val su = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    def half = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(col("c_nationkey").as("x"), col("s_nationkey").as("y")).distinct()
    for (i <- 1 to 3) time(s"nation edge build (wide) $i") { half.count() }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    for (i <- 1 to 3) time(s"nation edge build (w8) $i") { half.count() }
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    val b = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 60000000000").as("w")).distinct()
    def ue = b.select(col("w"), col("user_id").as("u"))
      .join(b.select(col("w"), col("user_id").as("v")), "w")
      .filter(col("u") < col("v")).select(col("u"), col("v")).distinct()
    for (i <- 1 to 3) time(s"user edge build (wide) $i") { ue.count() }
    spark.stop()
  }
}

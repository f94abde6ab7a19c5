package graft
import org.apache.spark.sql.SparkSession
/** Temporary plan-inspection probe (removed before round end). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    println("=== q8 filtered_revenue plan (pushdown check) ===")
    SparkEntry.queries("q8_filtered_revenue")(spark, dir).explain("formatted")
    println("=== q14 asof plan ===")
    SparkEntry.queries("q14_asof_prior_signup")(spark, dir).explain("formatted")
    println("=== q6 join plan (broadcast check) ===")
    SparkEntry.queries("q6_revenue_by_nation")(spark, dir).explain("formatted")
    // time q14 pieces
    val t0 = System.nanoTime(); SparkEntry.queries("q14_asof_prior_signup")(spark, dir).count()
    println(s"q14 time: ${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime(); SparkEntry.queries("q14_asof_prior_signup")(spark, dir).count()
    println(s"q14 time warm: ${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}

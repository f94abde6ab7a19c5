package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Skew-resistant aggregation: the reference's keyBy(symbol) funnels the
  * whole stream to one subtask (SURVEY.md §3.2, §4.3) and the naive Spark
  * translation inherits that. The standard fix at 100 TB is two-phase salted
  * aggregation: shard each hot key across `salts` partitions for the partial
  * aggregate, then combine the shards — both phases map-side-combinable, the
  * hot key's work spread `salts`-ways.
  *
  * The salt must not change results, so it only works for algebraic
  * aggregates; here: decimal-exact sums and counts.
  */
object Skew {

  /** Two-phase salted sum/count: groupBy(keys, salt) partial → groupBy(keys)
    * final. `saltOn` must be a deterministic per-row column so the plan is
    * reproducible (e.g. a row id — NOT rand(), which breaks retry
    * determinism at scale). */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], valueDec: Column,
                     saltOn: Column, salts: Int,
                     sumName: String, cntName: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltOn, lit(salts)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(valueDec).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).as(sumName), sum(col("__pcnt")).cast("long").as(cntName))
  }

  /** Revenue per returnflag via salted two-phase aggregation — 3 hot keys
    * spread 16 ways; identical output to the direct groupBy (oracle-checked
    * against plain SQL). */
  def saltedRevenue(spark: SparkSession, sfDir: String, salts: Int = 16): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val dec = (col("l_extendedprice").cast("decimal(18,4)")) *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
    saltedSumCount(li, Seq(col("l_returnflag")), dec,
        col("l_orderkey") * 31 + col("l_linenumber"), salts,
        "revenue_dec", "n_rows")
      .withColumn("revenue", col("revenue_dec").cast("double"))
      .select(col("l_returnflag"), col("revenue"), col("n_rows"))
      .orderBy(col("l_returnflag"))
  }
}

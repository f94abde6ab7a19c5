package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY.md §2.2 "sources beyond local text").
  *
  * The scale-relevant shape is the PARTITIONED read: a single-connection
  * JDBC scan serializes the whole table through one executor, while
  * `readPartitioned` slices a numeric column's [min, max] range into
  * `numPartitions` predicates — every executor opens its own connection and
  * pulls only its slice, and Spark pushes filters/projections into the
  * database (JDBCScan's PushedFilters). The bounds probe is one tiny
  * aggregate query against the database, not a table scan through Spark.
  *
  * Tested against the Derby embedded engine that ships with the Spark
  * distribution (no external service; see JdbcSpec) — any JDBC URL works
  * the same way.
  */
object Jdbc {

  def write(df: DataFrame, url: String, table: String,
            props: Properties = new Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  /** Single-partition read — fine for dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read over a numeric `partitionColumn`. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, numPartitions: Int,
                      props: Properties = new Properties()): DataFrame = {
    // quote via the url's dialect: Spark's JDBC writer creates quoted
    // (case-exact) identifiers, so the probe must quote them the same way
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(partitionColumn)
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $table) b", props)
      .head()
    if (bounds.isNullAt(0)) // empty table: nothing to slice
      return read(spark, url, table, props)
    def asLong(i: Int) = bounds.get(i).asInstanceOf[Number].longValue
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", asLong(0))
      .option("upperBound", asLong(1) + 1L)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)
  }
}

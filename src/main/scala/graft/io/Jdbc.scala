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
    // The COLUMN is quoted via the url's dialect (Spark's JDBC writer emits
    // dialect-quoted, case-exact column identifiers). The TABLE is
    // interpolated VERBATIM — exactly how Spark's own scan uses the dbtable
    // string — so the probe resolves iff the subsequent read would: quoting
    // it here would break every caller whose table name Spark's unquoted
    // CREATE TABLE case-folded (JdbcSpec pins this with a mixed-case name).
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(partitionColumn)
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $table) b", props)
      .head()
    if (bounds.isNullAt(0)) // empty table: nothing to slice
      return read(spark, url, table, props)
    def asLong(i: Int) = bounds.get(i).asInstanceOf[Number].longValue
    // upperBound is a stride boundary, not a filter: rows >= it land in the
    // last (open-ended) slice. hi+1 keeps the max row out of that boundary
    // case, but at Long.MaxValue the +1 would overflow negative and invert
    // the bounds — saturate instead (fractional maxima truncate down, also
    // covered by the open-ended last stride).
    val hi = asLong(1)
    val upper = if (hi == Long.MaxValue) Long.MaxValue else hi + 1L
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", asLong(0))
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)
  }
}

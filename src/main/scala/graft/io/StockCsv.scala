package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Reader for the reference's stock-quote CSV schema (15 columns, header row;
  * see /root/reference/src/main/resources/HDFC.csv:1 and FIXTURES.md §1).
  * Schema-on-read replaces the reference's positional split(",") parsing
  * (MaximumClosingPrice.java:35-39); the post-2011-only columns are nullable.
  */
object StockCsv {

  val schema: StructType = StructType(Seq(
    StructField("Date", DateType, nullable = false),
    StructField("Symbol", StringType, nullable = false),
    StructField("Series", StringType, nullable = true),
    StructField("PrevClose", DoubleType, nullable = true),
    StructField("Open", DoubleType, nullable = true),
    StructField("High", DoubleType, nullable = true),
    StructField("Low", DoubleType, nullable = true),
    StructField("Last", DoubleType, nullable = true),
    StructField("Close", DoubleType, nullable = true),
    StructField("VWAP", DoubleType, nullable = true),
    StructField("Volume", LongType, nullable = true),
    StructField("Turnover", DoubleType, nullable = true),
    StructField("Trades", LongType, nullable = true),
    StructField("DeliverableVolume", LongType, nullable = true),
    StructField("PctDeliverable", DoubleType, nullable = true)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** Streaming variant (file source) for the Structured Streaming forms. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema(schema)
      .csv(dir)
}

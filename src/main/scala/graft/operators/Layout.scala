package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Data-layout operators: multi-dimensional clustering keys for scan
  * pruning.
  *
  * At 100 TB the cheapest query is the one whose files are never opened:
  * parquet/Delta readers prune files by per-file min/max zonemaps, but a
  * single-column sort gives locality in ONE dimension only — a scan
  * filtering on the other dimension reads every file. The Z-order (Morton)
  * curve interleaves the bits of two normalized dimensions into one sort
  * key, so ranges of the key correspond to RECTANGLES in (dim1, dim2)
  * space: lay files out by zval ranges and every file's zonemap is tight in
  * BOTH dimensions at once (each halves its global range per interleaved
  * bit). The write path is then ordinary Spark —
  * `repartitionByRange(nFiles, $"zval").sortWithinPartitions("zval")` — and
  * the sampling range partitioner does the global distribution without any
  * full sort.
  *
  * Everything here is exact integer arithmetic (rank normalization by
  * min/max, bit spreading by shift/mask), so the layout is deterministic
  * under retries/speculation and the DuckDB oracle reproduces it
  * bit-for-bit.
  */
object Layout {

  private val Mask16 = 0xFFFFL

  /** Spread the low 16 bits of `c` into the even bit positions of a 32-bit
    * value (the classic mask-shift Morton ladder — O(log bits) shifts, all
    * codegen'd integer ops, no UDF). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(Mask16))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Min/max normalization onto [0, 65535] — exact integer arithmetic
    * ((c - lo) * 65535 `div` max(hi - lo, 1); `div` is SQL integer
    * division, matching DuckDB's `//`). The corpus min/max ride a 1-row
    * broadcast aggregate (the same shape every stats-consuming operator
    * here uses); at 100 TB a production writer would take them from table
    * statistics instead — same two numbers. */
  private def norm16(c: String, lo: String, hi: String): Column =
    expr(s"($c - $lo) * 65535 div greatest($hi - $lo, 1)")

  /** The zonemap the Z-order layout of `events` over (user_id, event hour)
    * would give 256 output files: per zval-range bucket, the row count and
    * the min/max of BOTH normalized dimensions. The witness of the whole
    * exercise is in the numbers: every bucket's u-range AND h-range is
    * ≤ 2^12 of the 2^16 global range (top 4 interleaved bits of each
    * dimension are pinned by the bucket id), so a reader filtering on
    * EITHER dimension skips ~15/16 of the files — single-column sorting
    * gives that for one dimension and nothing for the other.
    *
    * Scale shape: one narrow projection (zval is pure bit arithmetic), one
    * 1-row stats broadcast, one 256-group aggregation with map-side
    * combine. No sort — the registered query materializes the zonemap;
    * the write path's range partition is sampling-based. */
  def zorderZonemap(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
              expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("hr"))
    val stats = ev.agg(min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
                       min(col("hr")).as("min_h"), max(col("hr")).as("max_h"))
    val uq = norm16("user_id", "min_u", "max_u")
    val hq = norm16("hr", "min_h", "max_h")
    ev.crossJoin(broadcast(stats))
      .select(uq.as("uq"), hq.as("hq"))
      .withColumn("zval", spread16(col("uq"))
        .bitwiseOR(shiftleft(spread16(col("hq")), 1)))
      .withColumn("bucket", shiftright(col("zval"), 24))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
           min(col("uq")).as("min_uq"), max(col("uq")).as("max_uq"),
           min(col("hq")).as("min_hq"), max(col("hq")).as("max_hq"))
      .orderBy(col("bucket"))
  }
}

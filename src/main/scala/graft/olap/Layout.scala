package graft.olap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Physical-layout demonstrations (SCALE.md "What changes on a real
  * 1000-executor cluster" #1): the two write-side decisions that delete
  * whole shuffle/scan stages at 100 TB, turned from prose into plans.
  *
  *  - `bucketBy` on the FK join key: both sides of a repeated fact⋈fact
  *    join land pre-hashed into the same bucket count, so every later join
  *    on that key plans NO Exchange on either input (LayoutSpec asserts it;
  *    the bench's `layout_join_*` legs time it).
  *  - `partitionBy` on the query-time filter column: a month-filtered scan
  *    prunes to its partition directories at PLANNING time
  *    (PartitionFilters in the scan node), never touching the other
  *    months' files.
  */
object Layout {

  /** Write `df` as a managed bucketed+sorted parquet table. The repartition
    * uses the SAME hash Spark's bucketing applies, so each task holds
    * exactly one bucket and writes exactly one file — the single-file-per-
    * bucket layout that lets a sorted-bucket scan also satisfy the join's
    * sort requirement without a per-partition sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.repartition(numBuckets, col(key))
      .write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Stage the ETL2-shaped join pair — orders and lineitem bucketed on the
    * shared order key — as `orders_bkt` / `lineitem_bkt`.
    */
  def writeBucketedPair(spark: SparkSession, dir: String, numBuckets: Int): Unit = {
    writeBucketed(Tables.orders(spark, dir), "orders_bkt", "o_orderkey", numBuckets)
    writeBucketed(Tables.lineitem(spark, dir), "lineitem_bkt", "l_orderkey", numBuckets)
  }

  /** The repeated fact⋈fact FK join + aggregate both layouts are measured
    * on: revenue per customer over orders⋈lineitem. Input-agnostic so the
    * plain-parquet and bucketed-table plans are byte-for-byte the same
    * query, differing only in layout.
    */
  def orderRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(12, 2))))).cast(DoubleType)
          .as("revenue"))

  /** Morton (z-order) key: interleave the low 16 bits of two non-negative
    * dimension keys, a-bits in even positions, b-bits in odd. Sorting by
    * this key clusters rows so EVERY file's min/max stats are tight on
    * BOTH dimensions — a single-column sort gives perfect pruning on one
    * filter column and none on the other; z-order trades a little of the
    * first for most of the second, which is what lets a 100 TB table serve
    * selective scans on two independent predicates from row-group stats
    * alone. Pure bit arithmetic (shift/and/or magic-number spread), so it
    * is codegen'd, map-only, and bit-identical in the DuckDB oracle.
    */
  def zOrderKey(a: Column, b: Column): Column = {
    // DOMAIN CONTRACT: inputs are masked to their low 16 bits — a key
    // above 65535 WRAPS, silently interleaving unrelated rows into the
    // same z-range. Callers with wider/unbalanced domains must quantize
    // first ([[writeZOrdered]] does this from observed bounds); this raw
    // primitive stays arithmetic-only so the oracle can pin it.
    def spread(x: Column): Column = {
      val m1 = x.bitwiseAND(lit(0xFFFFL))
      val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FFL))
      val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x33333333L))
      m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a.cast(LongType)).bitwiseOR(shiftleft(spread(b.cast(LongType)), 1))
  }

  /** Write `df` z-order-clustered on (a, b): quantize each dim to the FULL
    * 16-bit range from its observed min/max (one tiny aggregate job at
    * write time — without it a dim wider than 65535 wraps, and dims of
    * unequal width let the wider one own all the high interleave bits,
    * degrading to a 1-D sort), range-partition by the Morton key so files
    * tile the z-curve contiguously, sort within partitions, drop the key.
    * One exchange at write time buys stat-pruned scans on both dimensions
    * forever after.
    */
  def writeZOrdered(df: DataFrame, a: String, b: String, outPath: String,
      numFiles: Int): Unit = {
    val boundsRow =
      df.agg(min(col(a)).cast(LongType), max(col(a)).cast(LongType),
          min(col(b)).cast(LongType), max(col(b)).cast(LongType))
        .collect().head
    // an empty input or an all-NULL dimension column yields NULL aggregates
    // — fail with the actual problem instead of a downstream NPE/cast error
    // (ADVICE r6); a degenerate-but-silent write would hide a broken source
    require(!boundsRow.anyNull,
      s"writeZOrdered($a, $b): input is empty or a dimension column is " +
        "all-NULL — no min/max bounds to quantize from")
    val Array(aLo, aHi, bLo, bHi) =
      (0 until 4).map(boundsRow.getLong).toArray
    // double arithmetic: (c-lo)*65535 in Long overflows once the observed
    // range exceeds ~1.4e14 (a nanosecond-epoch column does), silently
    // wrapping the z-key; doubles lose only sub-bucket precision, which
    // the 16-bit quantization discards anyway
    def q(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else ((c.cast(DoubleType) - lo.toDouble) * 65535.0 / (hi - lo).toDouble)
        .cast(LongType)
    df.withColumn("_zkey", zOrderKey(q(col(a), aLo, aHi), q(col(b), bLo, bHi)))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(outPath)
  }

  /** Write an events-derived fact partitioned by event date (the testdata
    * events all land in one month, so DAY is the demonstrable EP3-style
    * filter grain here — at 100 TB the same write uses whatever grain the
    * dominant filter hits): every `event_date = X` query prunes to one
    * directory at planning time.
    */
  def writePartitionedEvents(spark: SparkSession, dir: String, outPath: String): Unit =
    Tables.events(spark, dir)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("event_date").parquet(outPath)
}

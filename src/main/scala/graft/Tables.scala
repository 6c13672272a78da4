package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry takes `(spark, sfDir)` and reads only
  * these tables, so the DuckDB oracle can run the equivalent SQL over the
  * same parquet files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** events.ts has shipped as TIMESTAMP(NANOS) in some driver testdata
    * generations and TIMESTAMP(MICROS) in others, so the loader branches on
    * what the file actually contains. Nanos: Spark's vectorized reader
    * rejects the type outright unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at session-build time
    * by Verify/Bench/tests — a loader must never mutate session conf) maps
    * it to raw long nanos, truncated here to a microsecond timestamp —
    * exactly what DuckDB does scanning the same file. Micros: the column
    * arrives as TIMESTAMP_NTZ and only needs the cast to session-local
    * TimestampType (UTC everywhere here, so no instant shift) that every
    * downstream op and oracle already assumes.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

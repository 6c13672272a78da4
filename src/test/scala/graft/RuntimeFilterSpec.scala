package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SCALE.md "Joins"): when a shuffle
  * join's build side carries a selective filter, Catalyst can inject a
  * bloom-filter semi-filter on the probe side BEFORE its shuffle — at
  * 100 TB that means the fact table's non-matching rows are dropped at the
  * scan instead of being shuffled, which is the difference between
  * shuffling terabytes and shuffling the matching slice. This spec pins
  * that the injection actually fires on our ETL2-shaped join and that it
  * never changes the answer.
  *
  * The thresholds exist for real clusters (don't build a bloom filter over
  * a huge creation side; don't bother filtering a tiny probe side) — the
  * test lowers the probe-side floor because the fixture is tiny, which is
  * the documented knob, not a cheat: at 100 TB the default 10 GB floor is
  * exactly what makes the rule fire on facts and skip dims.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevT = conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    // shuffle join (the 100 TB shape: neither side broadcastable), tiny
    // fixture allowed to qualify as the "big" probe side
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      def query() = Tables.lineitem(spark, sf)
        .join(
          Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))

      val withBloom = query()
      assert(withBloom.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "no bloom filter injected on the probe side")
      val expected = {
        val prevE = conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try query().collect().toSeq
        finally conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prevE)
      }
      assert(withBloom.collect().toSeq === expected)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prevT)
    }
  }
}

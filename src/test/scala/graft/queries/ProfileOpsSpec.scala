package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Profiling operators: the CMS one-sided-error guarantee audited over
  * every key of the real corpus, a collision-free fixture where estimates
  * are exact, and containment arithmetic pinned on hand-built sets.
  */
class ProfileOpsSpec extends SparkSpec {

  test("cms: est >= exact for EVERY key on the corpus (one-sided error)") {
    val audit = ProfileOps.cmsAudit(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_partkey")), "l_partkey").cache()
    assert(audit.filter(col("overestimate") < 0).count() === 0)
    assert(audit.count() > 0)
    // the sketch is useful, not degenerate: some key estimates exactly
    assert(audit.filter(col("overestimate") === 0).count() > 0)
    audit.unpersist()
  }

  test("cms: estimates are exact when keys cannot collide") {
    import spark.implicits._
    // 3 distinct keys in 4x64 cells: no (depth,bucket) collision across
    // all 4 depths is astronomically unlikely AND deterministic (md5) —
    // pinned at authoring time
    val df = Seq(10L, 10L, 10L, 20L, 20L, 30L).toDF("k")
    val rows = ProfileOps.cmsAudit(df, "k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows === Map(10L -> ((3L, 3L)), 20L -> ((2L, 2L)), 30L -> ((1L, 1L))))
  }

  test("fk containment: partial, full, and superset-parent cases") {
    import spark.implicits._
    val child  = Seq(1L, 1L, 2L, 3L).toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val r1 = ProfileOps.pair(child, "ck", "c", parent, "pk", "p").collect()(0)
    // distinct child {1,2,3}, parent {1,2}: 2 of 3 contained
    assert(r1.getLong(2) === 3L && r1.getLong(3) === 2L && r1.getLong(4) === 2L)
    assert(math.abs(r1.getDouble(5) - 2.0 / 3.0) < 1e-15)
    assert(!r1.getBoolean(6))
    val bigParent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val r2 = ProfileOps.pair(child, "ck", "c", bigParent, "pk", "p").collect()(0)
    assert(r2.getDouble(5) === 1.0 && r2.getBoolean(6)) // superset parent: FK
  }

  test("fk profile on the corpus: the true FKs read 1.0") {
    val rows = ProfileOps.fkProfile(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(rows("lineitem.l_orderkey")) // lineitem -> orders is a real FK
    assert(rows("lineitem.l_partkey"))  // lineitem -> part is a real FK
    assert(rows("orders.o_custkey"))    // orders -> customer is a real FK
  }
}

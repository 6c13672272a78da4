package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.olap.Layout

/** ScalaCheck invariants of the Morton (z-order) key: for ANY pair of
  * 16-bit keys —
  *  1. the interleave round-trips (deinterleaving recovers both inputs
  *     exactly — no two (a, b) pairs collide on a z-value);
  *  2. the key is monotone along each axis when the other is held at 0
  *     (the property range-partitioning by z-value relies on).
  * The reference deinterleave below is the independent bit-by-bit spec,
  * not the magic-number ladder under test.
  */
object ZOrderProps extends Properties("ZOrder") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L
    for (i <- 0 until 16) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  private val gen16 = Gen.choose(0L, 65535L)

  property("interleave round-trips bit-exactly") = Prop.forAll(
    Gen.listOfN(64, Gen.zip(gen16, gen16))) { pairs =>
    val df = pairs.toDF("a", "b")
      .withColumn("z", Layout.zOrderKey(col("a"), col("b")))
    df.collect().forall { r =>
      deinterleave(r.getAs[Long]("z")) == ((r.getAs[Long]("a"), r.getAs[Long]("b")))
    }
  }

  property("monotone along each axis at origin") = Prop.forAll(
    Gen.listOfN(32, gen16)) { as =>
    val sorted = as.distinct.sorted
    val zs = sorted.toDF("a")
      .withColumn("z1", Layout.zOrderKey(col("a"), lit(0L)))
      .withColumn("z2", Layout.zOrderKey(lit(0L), col("a")))
      .orderBy("a").collect()
    zs.map(_.getAs[Long]("z1")).toSeq == zs.map(_.getAs[Long]("z1")).toSeq.sorted &&
      zs.map(_.getAs[Long]("z2")).toSeq == zs.map(_.getAs[Long]("z2")).toSeq.sorted
  }
}

package graft.etl

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** ScalaCheck SCD2 invariants (SURVEY.md §5): for ANY set of raw version
  * rows, after dedup + end-dating —
  *  1. intervals within an entity never overlap;
  *  2. exactly one open interval per entity (the latest start);
  *  3. re-running the pipeline on its own output is a no-op (idempotent).
  */
object Scd2Props extends Properties("Scd2") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genVersions: Gen[List[(Long, Long, Int)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.choose(1L, 4L)
      attr <- Gen.choose(1L, 3L)
      dayOffset <- Gen.choose(0, 1000)
    } yield (user, attr, dayOffset))

  private def build(rows: List[(Long, Long, Int)]) = {
    val df = rows.map { case (u, a, d) =>
      (u, a, Date.valueOf(java.time.LocalDate.of(2015, 1, 1).plusDays(d)))
    }.toDF("user_id", "attr_id", "start_date")
    Scd2.endDate(
      Scd2.dedupVersions(df, Seq("user_id", "attr_id", "start_date")),
      "user_id", "start_date", Seq("attr_id"))
  }

  property("intervals never overlap within an entity") = Prop.forAll(genVersions) { rows =>
    val out = build(rows)
    val a = out.select(col("user_id"), col("start_date"), col("end_date"))
    val b = out.select(col("user_id").as("user_id2"), col("start_date").as("s2"),
      col("end_date").as("e2"))
    val overlaps = a.join(b,
      col("user_id") === col("user_id2") &&
        (col("start_date") =!= col("s2") || col("end_date") =!= col("e2")) &&
        col("start_date") <= coalesce(col("e2"), lit(Date.valueOf("9999-12-31"))) &&
        col("s2") <= coalesce(col("end_date"), lit(Date.valueOf("9999-12-31"))))
    overlaps.count() == 0
  }

  property("exactly one open interval per entity, and it is the latest") = Prop.forAll(genVersions) { rows =>
    val out = build(rows).cache()
    val bad = out.groupBy("user_id")
      .agg(
        sum(when(col("end_date").isNull, 1).otherwise(0)).as("n_open"),
        max(col("start_date")).as("max_start"),
        max(when(col("end_date").isNull, col("start_date"))).as("open_start"))
      .filter(col("n_open") =!= 1 || col("max_start") =!= col("open_start"))
      .count()
    out.unpersist()
    bad == 0L
  }

  property("end-dating is idempotent on deduplicated input") = Prop.forAll(genVersions) { rows =>
    val once = build(rows)
    val twice = Scd2.endDate(
      once.drop("end_date"), "user_id", "start_date", Seq("attr_id"))
    once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0
  }
}

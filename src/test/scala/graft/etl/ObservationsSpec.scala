package graft.etl

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Date assembly (incl. placeholder-January), day clamping, and all four
  * affiliation priority classes (04_ETL1_part3.sql:369-416) on tiny frames.
  */
class ObservationsSpec extends SparkSpec {
  import spark.implicits._

  test("date assembly: full date, missing day, placeholder-January, missing year") {
    val df = Seq(
      ("15", "06", "2018"), (null, "06", "2018"),
      ("12", null, "2023"), ("12", "06", null))
      .toDF("obs_date", "obs_month", "obs_year")
    val out = Observations.assembleDate(df)
      .select("observation_date").collect().map(_.getDate(0))
    assert(out(0) === Date.valueOf("2018-06-15"))
    assert(out(1) === Date.valueOf("2018-06-01"))
    assert(out(2) === Date.valueOf("2023-01-01")) // placeholder January
    assert(out(3) === null)
  }

  test("day clamp: 31 in 30-day months → 30; 29-31 in February → 28; both month spellings") {
    val df = Seq(("31", "04"), ("31", "4"), ("30", "02"), ("29", "2"), ("31", "05"))
      .toDF("obs_date", "obs_month")
    val out = Observations.dayClampFixes(df).select("obs_date")
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("30", "30", "28", "28", "31"))
  }

  test("priority classes 1-4: best candidate wins by (priority, start_date)") {
    // one user, three affiliation versions: closed, closed, open
    val ui = Seq(
      (1L, 10L, Date.valueOf("2015-01-01"), Date.valueOf("2016-12-31")),
      (2L, 10L, Date.valueOf("2017-01-01"), Date.valueOf("2018-12-31")),
      (3L, 10L, Date.valueOf("2019-01-01"), null.asInstanceOf[Date]))
      .toDF("user_institution_id", "user_id", "start_date", "end_date")
    val obs = Seq(
      (1L, 10L, Date.valueOf("2017-06-01")), // class 1 → version 2
      (2L, 10L, null.asInstanceOf[Date]),    // class 2 → open version 3
      (3L, 10L, Date.valueOf("2010-01-01")), // class 3 → earliest start (v1)
      (4L, 10L, Date.valueOf("2019-06-01"))) // class 1 → open version 3
      .toDF("raw_data_id", "user_id", "observation_date")
    val resolved = Observations.resolveAffiliation(obs, ui)
      .select("raw_data_id", "user_institution_id", "affiliation_priority")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(resolved === Set((1L, 2L, 1), (2L, 3L, 2), (3L, 1L, 3), (4L, 3L, 1)))
  }

  test("priority class 4: dated observation after a closed interval, no better candidate") {
    val ui = Seq((1L, 10L, Date.valueOf("2015-01-01"), Date.valueOf("2016-12-31")))
      .toDF("user_institution_id", "user_id", "start_date", "end_date")
    val obs = Seq((1L, 10L, Date.valueOf("2020-01-01")))
      .toDF("raw_data_id", "user_id", "observation_date")
    val resolved = Observations.resolveAffiliation(obs, ui)
      .select("affiliation_priority").head().getInt(0)
    assert(resolved === 4)
  }

  test("manual NBN code fixes rewrite only the targeted species, case-insensitively") {
    val df = Seq(
      ("WRONG", "Andrena Flavipes", "x", "Prunella vulgaris"),
      ("KEEP", "Other species", "NHMSYS0000462067", "prunella VULGARIS"))
      .toDF("nbn_pollinator_code", "pollinator_species", "nbn_plant_code", "plant_species")
    val out = Observations.manualCodeFixes(df)
      .select("nbn_pollinator_code", "nbn_plant_code")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) === (("NHMSYS0000875202", "x")))
    assert(out(1) === (("KEEP", "NBNSYS0000004225")))
  }

  test("author theta-join is case-insensitive substring containment") {
    val users = Seq((1L, "Chapman"), (2L, "Stone")).toDF("user_id", "last_name")
    val stg = Seq((1L, "CHAPMAN, R. E. & Stone, G."), (2L, "Nobody")).toDF("raw_data_id", "authors")
    val matched = Observations.matchAuthors(stg, users)
      .select("raw_data_id", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched === Set((1L, 1L), (1L, 2L))) // fan-out to both; row 2 drops
  }
}

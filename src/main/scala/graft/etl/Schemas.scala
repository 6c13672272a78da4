package graft.etl

import org.apache.spark.sql.types._

/** Declared staging schemas (SURVEY.md §1): the reference's staging layer is
  * all-TEXT DDL (02_ETL1_part1.sql:7-12, 03_ETL1_part2.sql:6-18,
  * 04_ETL1_part3.sql:9-68) — schemas are fixed, never inferred.
  */
object Schemas {

  def allString(cols: Seq[String]): StructType =
    StructType(cols.map(StructField(_, StringType, nullable = true)))

  /** stg_institutions (02_ETL1_part1.sql:7-12) minus the injected country. */
  val institutionsCsv: Seq[String] = Seq("institution", "city", "county")

  /** stg_users (03_ETL1_part2.sql:6-18) minus the injected country. */
  val usersCsv: Seq[String] = Seq(
    "full_name", "username", "email", "institution", "affiliation_start",
    "city", "county", "subscription_type", "subscription_start", "join_date")

  /** tmp_insect_observations_full — the 30-column DOPI CSV
    * (04_ETL1_part3.sql:9-40). */
  val dopiCsv: Seq[String] = Seq(
    "authors", "title", "journal", "pub_year", "pub_vol", "doi", "methodology",
    "pollinator_survey", "plant_survey", "nbn_pollinator_code",
    "col_pollinator_code", "pollinator_species", "caste", "nbn_plant_code",
    "col_plant_code", "plant_species", "interactions", "date", "month", "year",
    "grid_letter", "grid_code", "latitude", "longitude", "habitat",
    "pollination", "pollen", "nectar", "record", "articleurl")

  /** stg_insect_observations: the 16 consumed columns after the 30→16
    * projection+rename (04_ETL1_part3.sql:79-114); raw_data_id added by the
    * loader. */
  val obsStaging: Seq[String] = Seq(
    "authors", "nbn_pollinator_code", "pollinator_species", "caste",
    "nbn_plant_code", "plant_species", "interactions", "obs_date",
    "obs_month", "obs_year", "latitude", "longitude", "habitat",
    "pollination", "pollen", "nectar")
}

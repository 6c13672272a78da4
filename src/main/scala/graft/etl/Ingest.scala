package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A1/A2/A3: CSV ingestion into all-TEXT staging frames.
  *
  * Mirrors `COPY … DELIMITER ',' CSV HEADER` (02_ETL1_part1.sql:24-27,
  * 03_ETL1_part2.sql:37-51) and the Latin-1 DOPI load
  * (04_ETL1_part3.sql:43-46). Schemas are declared, never inferred — the
  * staging layer is permissive TEXT; typing happens in later validated
  * stages, exactly like the reference.
  */
object Ingest {

  /** Headered CSV → all-string DataFrame with the declared column list. */
  def readCsv(spark: SparkSession, path: String, cols: Seq[String],
              encoding: String = "UTF-8"): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", encoding)
      .schema(Schemas.allString(cols))
      .csv(path)

  /** Institutions staging with the injected country default
    * (02_ETL1_part1.sql:11). */
  def stageInstitutions(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, Schemas.institutionsCsv)
      .withColumn("country", lit("United Kingdom"))

  /** Users staging with the injected country default (03_ETL1_part2.sql:17). */
  def stageUsers(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, Schemas.usersCsv)
      .withColumn("country", lit("United Kingdom"))

  /** DOPI staging: Latin-1 30-column load (04_ETL1_part3.sql:43-46), 30→16
    * projection+rename (:79-114), and a deterministic raw_data_id surrogate
    * (SERIAL replacement, SURVEY.md §1) ordered by the full row content.
    * NOTE (README.md:19): full-duplicate rows are LEGAL and must all survive
    * — the id is a row_number over content ordering, so duplicates get
    * distinct consecutive ids, never collapsed.
    */
  def stageObservations(spark: SparkSession, path: String): DataFrame = {
    val raw = readCsv(spark, path, Schemas.dopiCsv, encoding = "ISO-8859-1")
    val projected = raw.select(
      col("authors"), col("nbn_pollinator_code"), col("pollinator_species"),
      col("caste"), col("nbn_plant_code"), col("plant_species"),
      col("interactions"),
      col("date").as("obs_date"), col("month").as("obs_month"),
      col("year").as("obs_year"),
      col("latitude"), col("longitude"), col("habitat"),
      col("pollination"), col("pollen"), col("nectar"))
    // Bounded-file contract: a single CSV load is one batch; the global
    // row_number here stands in for SERIAL assignment order. For a
    // multi-terabyte load this would become file+offset derived ids.
    val w = Window.orderBy(Schemas.obsStaging.map(col): _*)
    projected.withColumn("raw_data_id", row_number().over(w).cast("long"))
  }
}

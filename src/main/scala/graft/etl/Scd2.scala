package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E1 + D7: SCD2 version handling — deduplicated version inserts and
  * LAG/LEAD end-dating (03_ETL1_part2.sql:136-246).
  *
  * Invariants (asserted by Scd2Spec + ScalaCheck):
  *  - per entity, version intervals never overlap after end-dating;
  *  - per entity, exactly one open (end_date IS NULL) interval — the latest.
  */
object Scd2 {

  /** DISTINCT ON (entity, attr, start) dedup of raw version rows
    * (03_ETL1_part2.sql:137-148). */
  def dedupVersions(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /** End-date versions: within each entity, ordered by start_date (attribute
    * id as deterministic tiebreak), every version's end_date is the next
    * version's start minus one day; the last version stays open.
    *
    * Batch-recompute equivalent of the reference's incremental
    * `UPDATE … SET end_date = next_start - 1 WHERE end_date IS NULL`
    * (03_ETL1_part2.sql:182-188, 242-246): on a full rebuild every closed
    * version gets the same end date the incremental path would have
    * assigned. One shuffle on the entity key; window within partition.
    */
  def endDate(df: DataFrame, entityCol: String, startCol: String,
              tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    val order = (startCol +: tiebreakCols).map(col)
    val w = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    df.withColumn("end_date",
      date_sub(lead(col(startCol), 1).over(w), 1).cast("date"))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness: dump the formatted physical plan of every
  * SparkEntry query (or just the ones named as extra args) so broadcast
  * choices, pushed filters, and codegen spans can be reviewed.
  *
  * Planning only — nothing executes — with one exception: q_dedup_cc's
  * construction runs its bounded label-propagation rounds eagerly, so its
  * printed plan is the checkpointed tail; the per-round plan it pays is
  * audited separately (PlanGuardSpec "CC propagation round").
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .appName("graft-explain")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.isEmpty || only.contains(name)) {
      println(s"\n===== $name =====")
      q(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

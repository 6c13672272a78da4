package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.GraphOps

/** Throwaway plan-dump harness for the r16 optimization round (not part of
  * the driver contract; deleted before round close). Writes the plans-r16
  * before/after evidence files: the louvain move
  * round (old shape reconstructed verbatim from the r15 code vs the fused
  * r16 shape) and the betweenness backward dagLevel in both join orders,
  * all over the REAL sf graph so sizes/strategies are the bench's.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val outDir = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(outDir)
    def dump(name: String, df: DataFrame, header: String): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(name),
        s"// $header\n$plan")
      println(s"[dump] $name")
    }

    // ---- louvain move round, real co-purchase graph
    val raw = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val scope = new GraphOps.CacheScope
    val edges = GraphOps.coEdges(raw, scope)
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
      .withColumn("w", lit(1L))
    val deg = scope.cache(GraphOps.edgeDegrees(edges))
    val m = edges.agg(count(lit(1)).as("m"))

    // BEFORE: the r15 louvainMoveRound body, verbatim (checkpoint dropped
    // so the PRE-truncation round plan is visible), labels (node, comm)
    {
      val labels = deg.select(col("node"), col("node").as("comm"))
        .localCheckpoint()
      val r = 1
      val parity: Column => Column = n => pmod(n, lit(2L))
      val tot = labels.join(deg, Seq("node"))
        .groupBy(col("comm")).agg(sum(col("deg")).as("tot"))
      val kic = sym
        .join(labels.select(col("node").as("dst"), col("comm")), Seq("dst"))
        .groupBy(col("src").as("node"), col("comm"))
        .agg(sum(col("w")).as("k_ic"))
      val cand = kic
        .unionByName(labels.select(col("node"), col("comm"), lit(0L).as("k_ic")))
        .groupBy(col("node"), col("comm")).agg(sum(col("k_ic")).as("k_ic"))
      val scored = cand
        .join(labels.select(col("node"), col("comm").as("cur")), Seq("node"))
        .join(deg, Seq("node"))
        .join(tot, Seq("comm"))
        .crossJoin(broadcast(m))
        .select(col("node"), col("comm"), col("cur"),
          (dec(col("k_ic")) * 2 * col("m")
            - dec(col("deg")) * (col("tot")
              - when(col("comm") === col("cur"), col("deg"))
                .otherwise(lit(0L))))
            .as("score"))
      val moved = scored
        .groupBy(col("node"), col("cur"))
        .agg(max(struct(col("score"), (-col("comm")).as("nc"))).as("m"))
        .select(col("node"), col("cur"), (-col("m.nc")).as("pick"))
      val round = moved
        .select(col("node"),
          when(parity(col("node")) === lit(r % 2), col("pick"))
            .otherwise(col("cur")).as("comm"),
          (parity(col("node")) === lit(r % 2) && col("pick") =!= col("cur"))
            .cast(org.apache.spark.sql.types.LongType).as("chg"))
      dump("q_louvain_round_before.txt", round,
        "ONE louvain move round, r15 shape (pre-checkpoint plan), sf0.1 co-purchase graph")
    }

    // AFTER: the r16 fused louvainMoveRound body, verbatim (checkpoint
    // dropped), labels (node, comm, deg)
    {
      val labels = deg.select(col("node"), col("node").as("comm"), col("deg"))
        .localCheckpoint()
      val r = 1
      val parity: Column => Column = n => pmod(n, lit(2L))
      val tot = labels.groupBy(col("comm")).agg(sum(col("deg")).as("tot"))
      val cand = sym
        .join(labels.select(col("node").as("dst"), col("comm")), Seq("dst"))
        .select(col("src").as("node"), col("comm"), col("w"))
        .unionByName(labels.select(col("node"), col("comm"), lit(0L).as("w")))
        .groupBy(col("node"), col("comm")).agg(sum(col("w")).as("k_ic"))
      val scored = cand
        .join(tot, Seq("comm"))
        .join(labels.select(col("node"), col("comm").as("cur"), col("deg")),
          Seq("node"))
        .crossJoin(broadcast(m))
        .select(col("node"), col("comm"), col("cur"), col("deg"),
          (dec(col("k_ic")) * 2 * col("m")
            - dec(col("deg")) * (col("tot")
              - when(col("comm") === col("cur"), col("deg"))
                .otherwise(lit(0L))))
            .as("score"))
      val moved = scored
        .groupBy(col("node"))
        .agg(max(struct(col("score"), (-col("comm")).as("nc"))).as("m"),
          max(col("cur")).as("cur"), max(col("deg")).as("deg"))
        .select(col("node"), col("cur"), col("deg"), (-col("m.nc")).as("pick"))
      val round = moved
        .select(col("node"),
          when(parity(col("node")) === lit(r % 2), col("pick"))
            .otherwise(col("cur")).as("comm"),
          col("deg"),
          (parity(col("node")) === lit(r % 2) && col("pick") =!= col("cur"))
            .cast(org.apache.spark.sql.types.LongType).as("chg"))
      dump("q_louvain_round_after.txt", round,
        "ONE louvain move round, r16 fused shape (pre-checkpoint plan), sf0.1 co-purchase graph")
    }

    // ---- betweenness backward dagLevel, real trade graph, level 3
    {
      val pairs = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val bedges = pairs
        .select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persist()
      val seeds = bedges
        .filter(col("src") % 2 === 0 && expr("(src div 2) % 500") === 1)
        .select(col("src").as("s")).distinct()
      val layer0 = seeds.select(col("s"), col("s").as("node"))
        .withColumn("sigma", dec(lit(1L))).localCheckpoint()
      val layers = scala.collection.mutable.ArrayBuffer(layer0)
      for (d <- 1 to 4) {
        val prior = (d % 2 until d by 2).map(layers(_))
        val cand = bedges
          .join(layers(d - 1).select(col("s"), col("node").as("src"), col("sigma")),
            Seq("src"))
          .groupBy(col("s"), col("dst"))
          .agg(dec(sum(col("sigma"))).as("sigma"))
          .select(col("s"), col("dst").as("node"), col("sigma"))
        val next = (if (prior.isEmpty) cand
          else cand.join(
            prior.map(_.select(col("s"), col("node"))).reduce(_ unionByName _),
            Seq("s", "node"), "left_anti"))
          .localCheckpoint()
        layers += next
      }
      def dag(k: Int, nearFirst: Boolean): DataFrame = {
        val lk = layers(k)
          .select(col("s"), col("node").as("src"), col("sigma").as("sigma_v"))
        val lk1 = layers(k + 1)
          .select(col("s"), col("node").as("dst"), col("sigma").as("sigma_w"))
        val j =
          if (nearFirst) bedges.join(lk, Seq("src")).join(lk1, Seq("s", "dst"))
          else bedges.join(lk1, Seq("dst")).join(lk, Seq("s", "src"))
        j.select(col("s"), col("src").as("v"), col("dst").as("w"),
          col("sigma_v"), col("sigma_w"))
      }
      dump("q_betweenness_dag3_before.txt", dag(3, nearFirst = true),
        "backward DAG level 3, r15 order (near layer joins edges first; its 33 M edge-mass side streams)")
      dump("q_betweenness_dag3_after.txt", dag(3, nearFirst = false),
        "backward DAG level 3, r16 mass-ordered (far layer, 9.5 M edge mass, joins edges first)")
    }
    spark.stop()
  }
}

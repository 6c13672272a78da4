package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The native codegen'd vector expressions must be drop-in replacements for
  * the interpreted higher-order forms they displaced: bitwise-equal doubles
  * (the DuckDB oracle hashes depend on it), identical null semantics (null
  * element poisons, length mismatch nulls, empty array = 0.0), on both the
  * codegen and interpreted (eval) paths.
  */
class VectorExprSpec extends SparkSpec {

  /** Draws `n` deterministic samples from a generator (fixed seeds, so the
    * suite is reproducible without the scalatest-scalacheck bridge).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  import VectorFunctions.{signed_proj, vec_dot}

  /** The displaced HOF form of the dot product, kept here as the executable
    * specification the native expression is tested against.
    */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** The displaced HOF form of the signed hyperplane projection. */
  private def hofPlaneDot(j: Int, emb: Column): Column = {
    def rsign(i: Column): Column =
      when(substring(md5(concat(lit(s"${j}_"), i.cast(StringType))), 1, 1) <= "7",
        lit(1.0)).otherwise(lit(-1.0))
    aggregate(
      transform(emb, (x, i) => x.cast(DoubleType) * rsign(i)),
      lit(0.0), (acc, v) => acc + v)
  }

  private val vecSchema = StructType(Seq(
    StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
    StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))

  private val genFloat: Gen[java.lang.Float] =
    Gen.chooseNum(-10f, 10f).map(java.lang.Float.valueOf)

  private val genElem: Gen[java.lang.Float] =
    Gen.frequency(9 -> genFloat, 1 -> Gen.const(null: java.lang.Float))

  private val genVec: Gen[Seq[java.lang.Float]] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, genElem))

  private val genPair: Gen[(Seq[java.lang.Float], Seq[java.lang.Float])] = for {
    a <- genVec
    sameLen <- Gen.frequency(4 -> true, 1 -> false)
    b <- if (sameLen) Gen.listOfN(a.size, genElem) else genVec
  } yield (a, b)

  /** Runs `native` and `reference` over the same rows and asserts bitwise
    * (null-safe) equality row by row, with codegen on.
    */
  private def assertColumnsAgree(
      rows: Seq[Row], native: (Column, Column) => Column,
      reference: (Column, Column) => Column): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), vecSchema)
    val out = df.select(
      native(col("a"), col("b")).as("nat"),
      reference(col("a"), col("b")).as("ref"))
    val disagree = out.filter(!(col("nat") <=> col("ref"))).collect()
    assert(disagree.isEmpty, s"native != HOF on: ${disagree.mkString(", ")}")
  }

  test("vec_dot matches the HOF form bitwise over random vectors (incl. nulls, length skew)") {
    val pairs = samples(genPair, 150)
    val rows = pairs.map { case (a, b) => Row(a, b) } ++
      Seq(Row(null, Seq.empty[java.lang.Float]), Row(Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]))
    assertColumnsAgree(rows, vec_dot, hofDot)
  }

  test("signed_proj matches the HOF form bitwise for all four planes") {
    val vecs = samples(genVec, 100)
    val rows = vecs.map(v => Row(v, v)) :+ Row(Seq.empty[java.lang.Float], null)
    (0 until 4).foreach { j =>
      assertColumnsAgree(rows, (a, _) => signed_proj(a, j), (a, _) => hofPlaneDot(j, a))
    }
  }

  test("interpreted eval path agrees with codegen (cache forces InterpretedUnsafeProjection off the hot path)") {
    // Row-by-row eval (the non-codegen fallback) must agree too: evaluate via
    // a projection that Catalyst cannot whole-stage-compile by turning
    // codegen off at the session level for one query.
    val rows = Seq(
      Row(Seq[java.lang.Float](1.5f, -2f, 3.25f), Seq[java.lang.Float](0.5f, 4f, -1f)),
      Row(Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 1f, 1f)),
      Row(Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f, 2f, 3f)),
      Row(Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), vecSchema)
    val expected = Seq[Any](1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.0, null, null, 0.0)
    withCodegen("NO_CODEGEN") {
      val got = df.select(vec_dot(col("a"), col("b"))).collect().map(_.get(0)).toSeq
      assert(got === expected)
    }
    withCodegen("CODEGEN_ONLY") {
      val got = df.select(vec_dot(col("a"), col("b"))).collect().map(_.get(0)).toSeq
      assert(got === expected)
    }
  }

  test("vec_outer_ut matches the nested-transform HOF form (both eval paths)") {
    import VectorFunctions.vec_outer_ut
    val genLongVec: Gen[Seq[java.lang.Long]] =
      Gen.choose(0, 20).flatMap(n => Gen.listOfN(n,
        Gen.choose(-1000000L, 1000000L).map(java.lang.Long.valueOf)))
    // empty arrays are excluded from the HOF comparison: sequence(0, -1)
    // DESCENDS, so the HOF reference itself errors on them — the native
    // form's empty-in/empty-out is asserted separately below
    val rows = samples(genLongVec, 80).filter(_.nonEmpty).map(Row(_)) :+ Row(null)
    val schema = StructType(Seq(StructField("v", ArrayType(LongType), nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val hof = expr("flatten(transform(sequence(0, size(v) - 1), j -> " +
      "transform(sequence(j, size(v) - 1), k -> v[j] * v[k])))")
    for (mode <- Seq("NO_CODEGEN", "CODEGEN_ONLY")) withCodegen(mode) {
      val disagree = df.select(vec_outer_ut(col("v")).as("nat"), hof.as("ref"))
        .filter(!(col("nat") <=> col("ref"))).collect()
      assert(disagree.isEmpty, s"[$mode] native != HOF on: ${disagree.mkString(", ")}")
    }
    // stated divergence: a null ELEMENT poisons the native result (the HOF
    // form would emit an array containing nulls) — unreachable from the
    // PCA quantizer, which only ever produces non-null elements
    val nd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq[java.lang.Long](1L, null, 3L))), 1), schema)
    assert(nd.select(vec_outer_ut(col("v"))).collect().head.isNullAt(0))
    // empty in, empty out
    val ed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq.empty[java.lang.Long])), 1), schema)
    assert(ed.select(vec_outer_ut(col("v"))).collect().head.getSeq[Long](0).isEmpty)
  }

  test("vec_recon_sae matches the HOF audit bitwise (random vectors, nulls, both eval paths)") {
    import VectorFunctions.vec_recon_sae
    // the displaced HOF form from vecQuantize's reconstruction audit,
    // kept as the executable specification
    def hofSae(emb: Column, codes: Column, mn: Column, scale: Column): Column =
      aggregate(
        zip_with(emb, codes, (x, c) =>
          abs(x.cast(DoubleType) - (mn + c * scale))),
        lit(0.0), (acc, v) => acc + v)
    val schema = StructType(Seq(
      StructField("emb", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("codes", ArrayType(IntegerType, containsNull = true), nullable = true),
      StructField("mn", DoubleType, nullable = true),
      StructField("scale", DoubleType, nullable = true)))
    val genCode: Gen[java.lang.Integer] = Gen.frequency(
      9 -> Gen.choose(0, 255).map(java.lang.Integer.valueOf),
      1 -> Gen.const(null: java.lang.Integer))
    val genRow: Gen[Row] = for {
      emb <- genVec
      sameLen <- Gen.frequency(4 -> true, 1 -> false)
      m <- Gen.choose(0, 80)
      codes <- Gen.listOfN(if (sameLen) emb.size else m, genCode)
      mn <- Gen.chooseNum(-10.0, 10.0)
      scale <- Gen.chooseNum(0.0, 0.1)
    } yield Row(emb, codes, mn, scale)
    val rows = samples(genRow, 150) ++ Seq(
      Row(Seq.empty[java.lang.Float], Seq.empty[java.lang.Integer], 0.0, 0.0),
      Row(null, Seq.empty[java.lang.Integer], 0.0, 0.0),
      Row(Seq[java.lang.Float](1f), Seq[java.lang.Integer](3), null, 0.5))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    def check(): Unit = {
      val out = df.select(
        vec_recon_sae(col("emb"), col("codes"), col("mn"), col("scale")).as("nat"),
        hofSae(col("emb"), col("codes"), col("mn"), col("scale")).as("ref"))
      val disagree = out.filter(!(col("nat") <=> col("ref"))).collect()
      assert(disagree.isEmpty, s"native != HOF on: ${disagree.mkString(", ")}")
    }
    withCodegen("CODEGEN_ONLY") { check() }
    withCodegen("NO_CODEGEN") { check() }
  }

  test("the vector queries carry no interpreted HOF lambdas — only the native expressions") {
    import graft.queries.VectorOps
    val sf = "/root/testdata/sf0.001"
    Seq(VectorOps.simTopk _, VectorOps.simLsh _, VectorOps.embedDedup _).foreach { q =>
      val plan = q(spark, sf).queryExecution.executedPlan.toString()
      assert(plan.contains("vec_dot"), "native dot product missing from the plan")
      // `lambdafunction` is how any interpreted HOF (aggregate/zip_with/
      // transform) prints; none may survive in the vector tier's hot path.
      assert(!plan.contains("lambdafunction"), s"interpreted HOF leaked back in:\n$plan")
    }
  }

  private def withCodegen[A](mode: String)(f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try f finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}

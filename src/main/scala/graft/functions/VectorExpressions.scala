package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the vector tier.
  *
  * The DataFrame higher-order functions (`aggregate`/`zip_with`/`transform`)
  * are interpreted — each call allocates a lambda frame per element and never
  * enters whole-stage codegen. These expressions compute the identical values
  * (left-to-right double accumulation, so DuckDB `list_reduce` oracles still
  * hash-match bitwise) as a tight compiled loop with `doGenCode`, keeping the
  * pair joins of the similarity/dedup operators inside WholeStageCodegen.
  */
object VectorFunctions {

  /** Left-to-right double dot product of two float arrays; codegen'd.
    * Bitwise-equal to
    * `aggregate(zip_with(a, b, (x, y) => x.cast(Double) * y.cast(Double)), 0.0, _ + _)`.
    */
  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(
      FloatVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Signed projection of a float array onto pseudo-random hyperplane
    * `planeId` (±1 components derived from md5, see [[SignedProjection]]);
    * codegen'd. Bitwise-equal to the interpreted
    * `aggregate(transform(emb, (x, i) => x.cast(Double) * rsign(planeId, i)), 0.0, _ + _)`.
    */
  def signed_proj(emb: Column, planeId: Int): Column =
    ColumnShim.column(SignedProjection(ColumnShim.expression(emb), planeId))

  /** Exact squared Euclidean distance of two bigint arrays; codegen'd.
    * Equal to `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0L, _ + _)`
    * — integer arithmetic, so "bitwise" is simply exact. Serves the
    * quantized k-means tier, where vectors are integer-quantized precisely
    * so that distance comparisons are engine-exact.
    */
  def vec_sqdist_l(a: Column, b: Column): Column =
    ColumnShim.column(
      LongVecSqDist(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Sum of absolute int8-dequantization errors
    * Σ |emb(i) - (mn + codes(i) * scale)| accumulated left-to-right in
    * double precision; codegen'd. Bitwise-equal to the interpreted
    * `aggregate(zip_with(emb, codes, (x, c) -> abs(x.cast(Double) - (mn + c * scale))), 0.0, _ + _)`.
    */
  def vec_recon_sae(emb: Column, codes: Column, mn: Column, scale: Column): Column =
    ColumnShim.column(VecReconSAE(ColumnShim.expression(emb),
      ColumnShim.expression(codes), ColumnShim.expression(mn),
      ColumnShim.expression(scale)))

  /** Upper-triangle self outer product of an `array<bigint>` — the
    * d(d+1)/2 exact products v(j)·v(k), j ≤ k, row-major; codegen'd.
    * Bitwise-equal (it is integer arithmetic) to the nested
    * `flatten(transform(transform(...)))` HOF form it replaces.
    */
  def vec_outer_ut(v: Column): Column =
    ColumnShim.column(LongVecOuterUpper(ColumnShim.expression(v)))
}

/** Dot product of two `array<float>` columns, accumulated left-to-right in
  * double precision. Null semantics mirror the `zip_with`+`aggregate` HOF
  * form it replaces: a null element poisons the sum (null + x = null), and
  * length-mismatched arrays yield null (zip_with pads with nulls). Empty
  * arrays yield 0.0 (the fold seed).
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      null
    } else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Signed projection of an `array<float>` onto deterministic pseudo-random
  * hyperplane `planeId`: sum over i of elem(i) * sign(planeId, i), where
  * sign is +1 when the first hex digit of md5("planeId_i") is <= '7'
  * (equivalently the top bit of the digest's first byte is clear) and -1
  * otherwise — the engine-portable convention the LSH oracles use. The sign
  * row is precomputed once per plane on the driver and shipped as a codegen
  * reference object; the per-row work is a compiled multiply-add loop. A null
  * element poisons the sum, mirroring the `transform`+`aggregate` form.
  */
case class SignedProjection(child: Expression, planeId: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val signs: Array[Double] =
    SignedProjection.signRow(planeId, SignedProjection.MaxDims)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signed_proj requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n <= signs.length, s"signed_proj supports up to ${signs.length} dims, got $n")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * signs(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n > $signsRef.length) {
         |  throw new IllegalArgumentException(
         |    "signed_proj supports up to " + $signsRef.length + " dims, got " + $n);
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $x.getFloat($i)) * $signsRef[$i];
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "signed_proj"

  override protected def withNewChildInternal(newChild: Expression): SignedProjection =
    copy(child = newChild)
}

/** Squared Euclidean distance of two `array<bigint>` columns — exact int64
  * arithmetic (the caller guarantees headroom: quantized components q and
  * dims d must satisfy d * (2q)^2 < 2^63; the 1e-6-quantized 64-dim
  * embeddings sit ~5 orders of magnitude under the bound). Null semantics
  * mirror the `zip_with`+`aggregate` HOF form: a null element poisons the
  * sum, and length-mismatched arrays yield null.
  */
case class LongVecSqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist_l requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      null
    } else {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $x.getLong($i) - $y.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_sqdist_l"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecSqDist =
    copy(left = newLeft, right = newRight)
}

/** Sum of absolute reconstruction errors of an int8-quantized
  * `array<float>`: Σ |emb(i) - (mn + codes(i) * scale)|, left-to-right
  * double accumulation. Evaluation order mirrors the `zip_with`+`aggregate`
  * HOF form it replaces EXACTLY — `codes(i)` widens int→double, multiplies
  * by `scale`, adds `mn`, subtracts from the float-widened element, abs,
  * accumulate — so DuckDB oracles hash-match bitwise. Null semantics
  * mirror the HOF form: any null input or null element poisons the result,
  * and length-mismatched arrays yield null (zip_with pads with nulls).
  * Empty arrays yield 0.0 (the fold seed). One stated divergence: empty
  * arrays WITH a null mn/scale poison here but fold to 0.0 in the HOF
  * (which never consults the scalars) — unreachable from [[
  * graft.queries.VectorOps.vecQuantize]], where mn is null only when the
  * array itself is, and scale arrives pre-coalesced.
  */
case class VecReconSAE(emb: Expression, codes: Expression, mn: Expression,
    scale: Expression) extends QuaternaryExpression {

  override def first: Expression = emb
  override def second: Expression = codes
  override def third: Expression = mn
  override def fourth: Expression = scale

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, codes.dataType, mn.dataType, scale.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_recon_sae requires (array<float>, array<int>, double, double), got " +
          s"(${emb.dataType.catalogString}, ${codes.dataType.catalogString}, " +
          s"${mn.dataType.catalogString}, ${scale.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val lo = c.asInstanceOf[Double]
    val sc = d.asInstanceOf[Double]
    val n = x.numElements()
    if (n != q.numElements()) {
      null
    } else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || q.isNullAt(i)) return null
        acc += math.abs(x.getFloat(i).toDouble - (lo + q.getInt(i).toDouble * sc))
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, q, lo, sc) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $q.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $q.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += java.lang.Math.abs(
         |      ((double) $x.getFloat($i)) - ($lo + ((double) $q.getInt($i)) * $sc));
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_recon_sae"

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): VecReconSAE =
    copy(emb = newFirst, codes = newSecond, mn = newThird, scale = newFourth)
}

object SignedProjection {
  /** Hard cap on supported embedding width; the testdata is 64-dim, so 4096
    * leaves ample headroom at 32 KiB per plane of driver memory.
    */
  val MaxDims = 4096

  /** ±1 sign row for plane `planeId`: sign(i) = +1 iff the top bit of the
    * first md5("planeId_i") byte is clear (first hex digit <= '7').
    */
  def signRow(planeId: Int, n: Int): Array[Double] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(n) { i =>
      md.reset()
      val d = md.digest(s"${planeId}_$i".getBytes(StandardCharsets.UTF_8))
      if ((d(0) & 0x80) == 0) 1.0 else -1.0
    }
  }
}

/** Upper-triangle outer product of an `array<bigint>` with itself — the
  * d(d+1)/2 products v(j)·v(k) for j ≤ k in row-major (j, k) order, the
  * per-row second-moment stream the exact-integer Gram/PCA pass aggregates
  * (position p decodes to (j, k) by the same row-major walk). Exact int64
  * (caller guarantees (q_max)² headroom, as with [[LongVecSqDist]]). One
  * stated divergence from the nested `transform`+`flatten` HOF form it
  * replaces: a null ELEMENT poisons the whole result here, where the HOF
  * emits an array containing nulls — unreachable from the PCA quantizer,
  * whose `transform` only produces non-null elements.
  */
case class LongVecOuterUpper(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_outer_ut requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val res = new Array[Long](n * (n + 1) / 2)
    var p = 0
    var j = 0
    while (j < n) {
      if (x.isNullAt(j)) return null
      val vj = x.getLong(j)
      var k = j
      while (k < n) {
        if (x.isNullAt(k)) return null
        res(p) = vj * x.getLong(k)
        p += 1
        k += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val res = ctx.freshName("res")
      s"""
         |final int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  final long[] $res = new long[$n * ($n + 1) / 2];
         |  int $p = 0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    for (int $k = $j; $k < $n; $k++) {
         |      $res[$p++] = $x.getLong($j) * $x.getLong($k);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_outer_ut"

  override protected def withNewChildInternal(newChild: Expression): LongVecOuterUpper =
    copy(child = newChild)
}

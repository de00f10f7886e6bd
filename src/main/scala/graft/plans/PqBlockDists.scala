package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Per-block squared L2 distances of two vectors as a native codegen
  * expression: `pq_block_dists(x, c, blocks)` returns ARRAY<DOUBLE> of
  * length `blocks`, element b = Σ over the b-th sub-vector of
  * DECIMAL(38,6)-rounded (x_i − c_i)² — bit-identical to the
  * `aggregate(zip_with(slice…))` HOF chain it replaces in
  * `Engine.pqBlockDistances` (asserted in ExpressionSpec), but ~an
  * order of magnitude cheaper: the HOF form allocates a JVM BigDecimal
  * PER TERM (blocks·subDim per (vector, code) pair — the measured
  * bottleneck of the q92i/q99c/q99e family at the 10× fixture), while
  * this one fuses everything into one primitive loop.
  *
  * EXACTNESS: decimal summation semantics are preserved, not
  * approximated. Each term is rounded at 6 dp half-up — the identical
  * rule Spark's double→DECIMAL(38,6) cast applies — and accumulated in
  * LONG fixed-point (exact, order-free, like decimal addition; no
  * overflow until Σ terms ≥ 2⁶³/10⁶ ≈ 9.2e12, far beyond any distance
  * this data model produces — and `longValueExact` on the slow path
  * would throw loudly, not wrap). [[PqBlockDists.round6]] takes a fast
  * primitive path when `dd·10⁶` is provably far from a rounding tie
  * (error bound: a few ulps covers both the ×10⁶ multiply and
  * Double.toString shortest-decimal conversion) and falls back to the
  * exact BigDecimal rule within the tie window — so the result equals
  * `CAST(dd AS DECIMAL(38,6))` for EVERY input, not just almost all.
  * The final per-block value divides the exact long sum by 10⁶ in
  * double — the correctly-rounded quotient, which is precisely what
  * Decimal.toDouble returns.
  *
  * Both ARRAY<FLOAT> and ARRAY<DOUBLE> inputs are accepted (the
  * codebook may be `kmeansRefine` output, which is double). Lengths
  * are trusted equal modulo the caller's raise_error guard; like the
  * zip_with form, the loop runs over min(len) and `blocks` must divide
  * it.
  */
case class PqBlockDists(left: Expression, right: Expression, blocks: Int)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType) && blocks >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments and " +
        s"blocks >= 1, got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}, $blocks)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_block_dists"

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(xa.numElements(), xb.numElements())
    PqBlockDists.checkShape(n, blocks)
    val subDim = n / blocks
    val sums = new Array[Long](blocks)
    var i = 0
    while (i < n) {
      val x = if (isFloat(left)) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (isFloat(right)) xb.getFloat(i).toDouble else xb.getDouble(i)
      val d = x - y
      sums(i / subDim) += PqBlockDists.round6(d * d)
      i += 1
    }
    val out = new Array[Double](blocks)
    var j = 0
    while (j < blocks) { out(j) = PqBlockDists.div6(sums(j)); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, j) =
        (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("j"))
      val (sub, sums, out, d) = (ctx.freshName("sub"),
        ctx.freshName("sums"), ctx.freshName("out"), ctx.freshName("d"))
      def get(arr: String, e: Expression, idx: String) =
        if (isFloat(e)) s"(double) $arr.getFloat($idx)"
        else s"$arr.getDouble($idx)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |graft.plans.PqBlockDists.checkShape($n, $blocks);
         |final int $sub = $n / $blocks;
         |final long[] $sums = new long[$blocks];
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ${get(a, left, i)} - ${get(b, right, i)};
         |  $sums[$i / $sub] += graft.plans.PqBlockDists.round6($d * $d);
         |}
         |final double[] $out = new double[$blocks];
         |for (int $j = 0; $j < $blocks; $j++) {
         |  $out[$j] = graft.plans.PqBlockDists.div6($sums[$j]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqBlockDists =
    copy(left = newLeft, right = newRight)
}

object PqBlockDists {
  val name = "pq_block_dists"

  /** Input-shape gate shared by eval and generated code: the function is
    * PUBLICLY registered, so a caller bypassing Engine's raise_error
    * guards must still get a descriptive error — not a raw / by zero
    * (length < blocks) or an out-of-bounds index (length not a multiple
    * of blocks). */
  def checkShape(n: Int, blocks: Int): Unit =
    if (n < blocks || n % blocks != 0)
      throw new IllegalArgumentException(
        s"$name: vector length $n must be a positive multiple of " +
          s"blocks=$blocks")

  /** The exact-long-sum → double division, correctly rounded for EVERY
    * accumulator: `acc/1e6` in double is the correctly-rounded quotient
    * only while acc is exactly representable (|acc| < 2⁵³ — block
    * distance sums up to ~9e9, far beyond this data model); past that
    * the double division double-rounds and can differ from the
    * DECIMAL(38,6) cast by 1 ulp, so the slow path divides through
    * BigDecimal's correctly-rounded doubleValue — bit-equality with
    * `CAST(… AS DECIMAL(38,6))`'s toDouble holds unconditionally, not
    * just below the 2⁵³ fixed-point bound. */
  def div6(acc: Long): Double =
    if (math.abs(acc) < (1L << 53)) acc.toDouble / 1e6
    else java.math.BigDecimal.valueOf(acc, 6).doubleValue()

  /** round(dd · 10⁶) under the double→DECIMAL(38,6) cast's half-up rule,
    * exact for every non-negative input: primitive fast path away from
    * the tie boundary (a few-ulp guard band covers the ×10⁶ rounding
    * AND BigDecimal.valueOf's shortest-decimal conversion), exact
    * BigDecimal inside it. */
  def round6(dd: Double): Long = {
    val y = dd * 1e6
    val l = y.toLong
    val frac = y - l
    val eps = Math.ulp(y) * 8 + 1e-15
    if (frac > 0.5 + eps) l + 1
    else if (frac < 0.5 - eps) l
    else java.math.BigDecimal.valueOf(dd).movePointRight(6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  private[plans] val builder: Seq[Expression] => Expression = {
    case Seq(a, b, blocks) =>
      // A non-foldable third argument (e.g. a column reference) would be
      // eval'd against no input row — null/undefined behavior instead of
      // an error. blocks is part of the expression's SHAPE (output array
      // length), so it must be a literal.
      if (!blocks.foldable) throw new IllegalArgumentException(
        s"$name: blocks must be an integer literal, got ${blocks.sql}")
      val k = blocks.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$name: blocks must be an integer literal, got $other")
      }
      PqBlockDists(a, b, k)
    case exprs => throw new IllegalArgumentException(
      s"$name expects 3 arguments, got ${exprs.length}")
  }

  /** Idempotent session registration (the [[CosineSimilarity.register]]
    * pattern). */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
}

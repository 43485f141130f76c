package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSessionExtensions}

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns.
  *
  * A Scala UDF pays per-row serialization: each 64-float array is copied
  * out of Tungsten format into a boxed Seq[Float] before the lambda runs.
  * These expressions read `ArrayData` in place inside whole-stage codegen
  * (`doGenCode` emits a static call on the unconverted columnar value) —
  * the hot loop of brute-force similarity search stays inside the
  * generated stage with zero boxing. SURVEY.md §2.7 note: the reference
  * needs no custom expressions; these exist for the engine's
  * similarity-search extension where the UDF tax is measurable.
  */
object VectorOps {
  /** Cosine similarity over two float vectors, accumulated in double
    * (index order, so results are bit-stable across engines/plans). */
  def cosineArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  def dotArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    dot
  }

  /** |a ∩ b| of two SORTED distinct long arrays (two-pointer merge) —
    * the set-similarity verify kernel: together with `size()`,
    * intersection and union sizes (u = |a| + |b| − i) come out of one
    * in-place pass over Tungsten array data. */
  def sortedOverlapCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val expected = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two $expected arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** `cosine_sim(array<float>, array<float>) -> double`, codegen'd. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineArrayData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.cosineArrayData($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** `dot_product(array<float>, array<float>) -> double`, codegen'd. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotArrayData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dotArrayData($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** `sorted_overlap_count(array<bigint>, array<bigint>) -> bigint`,
  * codegen'd. Inputs MUST be sorted ascending (the producer sorts at
  * hash time); the expression does not re-verify order. */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedOverlapCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.sortedOverlapCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_overlap_count"
}

/** `strict_sigmoid(double) -> double`: 1/(1+exp(−z)) with
  * `StrictMath.exp`, codegen'd. Exists because t13's trained weights are
  * SPEC-PINNED as exact doubles: the built-in `exp()` lowers to
  * `Math.exp`, whose HotSpot intrinsic may differ from StrictMath by
  * ulps ACROSS PLATFORMS — and an ulp at a 2^-32 quantization boundary
  * would shift the pinned gradient sums. This keeps the scoring loop
  * inside whole-stage codegen (the r8 verdict's UDF nit) without
  * trading away cross-platform reproducibility. */
case class StrictSigmoid(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double argument, got ${child.dataType.simpleString}")
  override def nullSafeEval(z: Any): Any =
    1.0 / (1.0 + StrictMath.exp(-z.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, z => s"1.0 / (1.0 + java.lang.StrictMath.exp(-($z)))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "strict_sigmoid"
}

/** `elliott_sigmoid(double) -> double`: the rational squash
  * σ̃(z) = 0.5 + 0.5·z/(1+|z|) (Elliott 1993's "fast sigmoid") —
  * monotone, symmetric, decision boundary IDENTICAL to the logistic
  * (σ̃(z) ≥ 0.5 ⇔ z ≥ 0). Exists because it is built ONLY from
  * IEEE-correctly-rounded ops (+ · / abs): unlike any exp()-based
  * sigmoid — StrictMath pins a JVM-specific fdlibm polynomial no SQL
  * engine reproduces — every engine with 64-bit floats evaluates this
  * bit-for-bit, which is what lets t13's quantized-gradient GD
  * recurrence be replayed as a SQL oracle. Codegen'd. */
case class ElliottSigmoid(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double argument, got ${child.dataType.simpleString}")
  override def nullSafeEval(z: Any): Any = {
    val x = z.asInstanceOf[Double]
    0.5 + 0.5 * (x / (1.0 + Math.abs(x)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, z =>
      s"0.5 + 0.5 * (($z) / (1.0 + java.lang.Math.abs($z)))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "elliott_sigmoid"
}

/** Column-API entry points. */
object GraftFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def sorted_overlap_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedOverlapCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def strict_sigmoid(z: Column): Column =
    GraftColumnBridge.column(StrictSigmoid(GraftColumnBridge.expression(z)))
  def elliott_sigmoid(z: Column): Column =
    GraftColumnBridge.column(ElliottSigmoid(GraftColumnBridge.expression(z)))
}

/** SQL registration via SparkSessionExtensions — enables
  * `SELECT cosine_sim(a, b)` with
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_overlap_count"),
      new ExpressionInfo(classOf[SortedOverlapCount].getName, "sorted_overlap_count"),
      (children: Seq[Expression]) => SortedOverlapCount(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("strict_sigmoid"),
      new ExpressionInfo(classOf[StrictSigmoid].getName, "strict_sigmoid"),
      (children: Seq[Expression]) => StrictSigmoid(children(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("elliott_sigmoid"),
      new ExpressionInfo(classOf[ElliottSigmoid].getName, "elliott_sigmoid"),
      (children: Seq[Expression]) => ElliottSigmoid(children(0))))
  }
}

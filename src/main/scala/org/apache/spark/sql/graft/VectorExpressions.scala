// Lives under org.apache.spark.sql so the expression can use the
// private[sql] extension surface (AbstractDataType for implicit casts,
// ExpressionUtils for Expression↔Column bridging) — the conventional
// pattern for third-party native expressions. Public API re-exported as
// graft.functions.VectorFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns — the
  * (b)-tier extension path (custom Catalyst `Expression` with `doGenCode`)
  * from the build brief: the built-in alternative,
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x)`, runs
  * interpreted (higher-order functions don't codegen their lambdas), which
  * dominates the ANN hot path at scale.
  *
  * Semantics: element-wise product-sum over the common prefix length, in
  * index order (matches the HOF formulation and DuckDB's list_sum over
  * list_zip bit-for-bit). Null elements are treated as 0. `array<float>`
  * inputs are implicitly cast by the type system.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = CodeGenerator.getValue(x, DoubleType, i)
      val getY = CodeGenerator.getValue(y, DoubleType, i)
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += $getX * $getY;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** SQL registration for the native expressions — the SparkSessionExtensions
  * path from the build brief (§custom operators (c)): with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`,
  * `SELECT vec_dot(a, b)` parses/optimizes/codegens like a built-in. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotRegistration)
    ext.injectFunction(GraftExtensions.jaroWinklerRegistration)
    ext.injectFunction(GraftExtensions.pqEncodeRegistration)
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    ext.injectOptimizerRule(_ => JaroWinklerPrefilter)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val vecDotRegistration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  val jaroWinklerRegistration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "jaro_winkler takes exactly 2 arguments")
      JaroWinkler(children.head, children(1))
    })

  val pqEncodeRegistration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_encode"),
    new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "pq_encode takes exactly 3 arguments")
      PqEncode(children.head, children(1), children(2))
    })
}

/** Column-API entry points for the native vector expressions. */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }

  def cosine(a: Column, b: Column, aNorm: Column, bNorm: Column): Column =
    vecDot(a, b) / (aNorm * bNorm)
}

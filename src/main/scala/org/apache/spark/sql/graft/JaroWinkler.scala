// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions: the private[sql] extension surface. Public API
// re-exported as graft.functions.TextSimilarity.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, pinned to the rapidfuzz evaluation that DuckDB
  * adapted (empirically verified against `jaro_winkler_similarity` on the
  * known pairs: MARTHA/MARHTA 0.96111…, DIXON/DICKSONX 0.81333…,
  * boost only when jaro > 0.7, prefix cap 4, weight 0.1, either-empty →
  * 0.0, match window floor(max/2) − 1):
  *
  *   jaro = (m/|a| + m/|b| + (m − t)/m) / 3,  t = mismatched-pairs / 2
  *   jw   = jaro + min(prefix, 4) · 0.1 · (1 − jaro)   if jaro > 0.7
  *
  * The arithmetic ORDER mirrors rapidfuzz term by term so both engines
  * compute bit-identical doubles (the oracle gate hash-compares them).
  * Char-level on UTF-16 units — identical to byte/codepoint level for the
  * ASCII identifiers entity resolution runs on.
  */
object JaroWinklerAlgo {

  def jaroWinkler(aU: UTF8String, bU: UTF8String): Double = {
    val a = aU.toString
    val b = bU.toString
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0.0
    val window = math.max(0, math.max(m, n) / 2 - 1)
    val aMatch = new Array[Boolean](m)
    val bMatch = new Array[Boolean](n)
    var matches = 0
    var i = 0
    while (i < m) {
      val lo = math.max(0, i - window)
      val hi = math.min(n - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatched = 0
    var k = 0
    i = 0
    while (i < m) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val t = mismatched / 2 // integer half, as in rapidfuzz/DuckDB
    val mm = matches.toDouble
    val jaro = (mm / m + mm / n + (mm - t) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(m, n))
    while (l < maxPrefix && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native codegen'd Jaro-Winkler over two string columns — the (b)-tier
  * extension path (custom Expression with doGenCode): the alternative is
  * a Scala UDF, which boxes both strings and blocks whole-stage codegen.
  * Generated code calls the shared static kernel directly on UTF8String
  * operands inside the WholeStageCodegen loop, like Spark's own
  * `levenshtein`. Used by the blocked entity-resolution join
  * (q_entity_resolution_jw); registered in SQL as `jaro_winkler` via
  * GraftExtensions. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.graft.JaroWinklerAlgo.jaroWinkler($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object TextSimilarityFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder — `pq_encode(vec, codebook, m)`
  * returns the `m` 0-based nearest-codeword indices, one per subspace
  * (subspace width = len(vec) / m; codeword c's slice for subspace s is
  * codebook[c][s·w .. (s+1)·w)). The (b)-tier fix for q_pq_adc's hot
  * path: the HOF formulation
  * `transform(seq, m -> array_position(transform(cbv, cv -> aggregate ...)))`
  * runs interpreted — ~2k boxed lambda invocations per row — while this
  * expression codegens to three tight loops (measured 94 s → sub-second
  * for the encode itself at sf0.1 after the HOF rewrite + this).
  *
  * Tie semantics: strict `<` keeps the FIRST (smallest) codeword index —
  * identical to array_position-of-min and DuckDB's list_position, so the
  * oracle replays encodes bit-for-bit. Distances accumulate in index
  * order, matching the HOF/DuckDB fold order.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any, cb: Any, mAny: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val book = cb.asInstanceOf[ArrayData]
    val m = mAny.asInstanceOf[Int]
    val d = vec.numElements()
    val k = book.numElements()
    val w = d / m
    val codes = new Array[Int](m)
    // pre-extract codeword rows once (ArrayData.getArray allocates)
    val rows = Array.tabulate(k)(c => book.getArray(c))
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val row = rows(c)
        var acc = 0.0
        var j = s * w
        val end = j + w
        while (j < end) {
          val diff = vec.getDouble(j) - row.getDouble(j)
          acc += diff * diff
          j += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, m) => {
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val w = ctx.freshName("w")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val row = ctx.freshName("row")
      val diff = ctx.freshName("diff")
      val getV = CodeGenerator.getValue(v, DoubleType, j)
      val getR = CodeGenerator.getValue(row, DoubleType, j)
      s"""
         |final int $d = $v.numElements();
         |final int $k = $cb.numElements();
         |final int $w = $d / $m;
         |final int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $row =
         |      $cb.getArray($c);
         |    double $acc = 0.0;
         |    final int $end = ($s + 1) * $w;
         |    for (int $j = $s * $w; $j < $end; $j++) {
         |      double $diff = $getV - $getR;
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqFunctions {
  def pqEncode(vec: Column, codebook: Column, m: Column): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(codebook), ExpressionUtils.expression(m)))
}

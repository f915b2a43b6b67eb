package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pq_encode must match the interpreted HOF argmin formulation exactly —
  * including first-wins tie-breaking — on both the codegen and the
  * interpreted (eval) paths. */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of width 4, K=3 codewords
  private val book = Seq(
    Seq(0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0),
    Seq(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0),
    Seq(5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0))

  private def hofCodes = expr(
    """transform(sequence(0, 1), m ->
         element_at(transform(array(transform(cbv, cv ->
             aggregate(sequence(4 * m, 4 * m + 3), CAST(0.0 AS DOUBLE),
               (a, j) -> a + (element_at(vecd, CAST(j + 1 AS INT))
                              - element_at(cv, CAST(j + 1 AS INT)))
                           * (element_at(vecd, CAST(j + 1 AS INT))
                              - element_at(cv, CAST(j + 1 AS INT)))))),
           ds -> array_position(ds, array_min(ds))), 1) - 1)""")

  private val vecs = Seq(
    Seq(0.1, 0.1, 0.1, 0.1, 0.9, 0.9, 0.9, 0.9),   // (0 vs 1 close), sub2 → 1
    Seq(5.0, 5.0, 5.0, 5.0, 9.0, 9.0, 9.0, 9.0),   // → (2, 0)
    Seq(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5),   // equidistant 0/1 in sub1 → first wins
    Seq(-3.0, 2.0, 7.0, 0.0, 1.0, 1.0, 1.0, 1.0))

  private def df = vecs.map(Tuple1(_)).toDF("vecd")
    .crossJoin(Seq(Tuple1(book)).toDF("cbv"))

  test("native codes equal the HOF argmin, including ties (codegen path)") {
    val got = df.select(
        VectorFunctions.pqEncode(col("vecd"), col("cbv"), lit(2)).as("n"),
        hofCodes.as("h"))
      .as[(Seq[Int], Seq[Long])].collect()
    got.foreach { case (n, h) => assert(n.map(_.toLong) == h) }
  }

  test("interpreted eval path agrees (codegen disabled)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = df.select(
          VectorFunctions.pqEncode(col("vecd"), col("cbv"), lit(2)).as("n"))
        .as[Seq[Int]].collect()
      assert(got(1) == Seq(2, 0))
      assert(got(2).head == 0) // tie → smallest codeword
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("SQL registration via GraftExtensions-style function call") {
    // direct expression construction (same constructor the injected
    // function uses); float input implicitly casts
    val one = Seq(Tuple1(Seq(1.0f, 1.0f, 0.1f, 0.2f))).toDF("v")
      .crossJoin(Seq(Tuple1(Seq(Seq(1.0, 1.0, 0.0, 0.0),
        Seq(0.0, 0.0, 3.0, 3.0)))).toDF("cb"))
      .select(VectorFunctions.pqEncode(col("v"), col("cb"), lit(2)).as("c"))
      .as[Seq[Int]].head()
    assert(one == Seq(0, 0))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native DotProduct expression must agree bit-for-bit with the HOF
  * formulation (same index-order summation) — that equivalence is what lets
  * the DuckDB oracle keep validating the ANN queries. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    (1 to n).map(_ => (Array.fill(dim)(rng.nextGaussian()),
      Array.fill(dim)(rng.nextGaussian())))
  }

  test("vec_dot ≡ aggregate(zip_with(...)) bit-for-bit on 500 random pairs") {
    val df = randVecs(500, 64, 3L).toDF("a", "b")
    val out = df.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        .as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot handles length mismatch (common prefix) and empty arrays") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),
      (Array.empty[Double], Array(1.0))).toDF("a", "b")
    val out = df.select(VectorFunctions.vecDot(col("a"), col("b"))).as[Double].collect()
    assert(out(0) === 1.0 * 4 + 2 * 5)
    assert(out(1) === 0.0)
  }

  test("vec_dot implicit-casts float arrays; norm/cosine helpers") {
    val df = Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.vecNorm(col("a")).as("n"),
      VectorFunctions.cosine(col("a"), col("b"),
        VectorFunctions.vecNorm(col("a")), VectorFunctions.vecNorm(col("b"))).as("c"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("vec_dot registers as a SQL function via the extensions entry point") {
    // production wiring is spark.sql.extensions=...GraftExtensions; the
    // shared test session predates that config, so apply the same
    // registration tuple to its function registry directly
    val (ident, info, builder) =
      org.apache.spark.sql.graft.GraftExtensions.vecDotRegistration
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("codegen path produces same result as interpreted eval") {
    val df = randVecs(50, 16, 9L).toDF("a", "b")
    val withCodegen = df.select(VectorFunctions.vecDot(col("a"), col("b")))
      .as[Double].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(VectorFunctions.vecDot(col("a"), col("b")))
        .as[Double].collect()
      withCodegen.zip(interpreted).foreach { case (x, y) => assert(x == y) }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}

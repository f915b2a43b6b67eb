package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r15 native sorted-merge intersect count to its contract:
  * on SORTED, duplicate-free string arrays it equals
  * size(array_intersect(a, b)) exactly — including empty, disjoint,
  * identical, subset, and null-array inputs — across random inputs
  * (whole-stage codegen path) and the interpreted eval path. */
class SortedIntersectSpec extends SparkSpec {

  private def viaDf(rows: Seq[(Seq[String], Seq[String])]): Seq[(Int, Int)] = {
    import spark.implicits._
    rows.toDF("a", "b")
      .select(
        TextSimilarity.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
  }

  test("equals size(array_intersect) on sorted distinct arrays (random)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def mk(): Seq[String] =
        (0 until rnd.nextInt(60)).map(_ => s"tok${rnd.nextInt(80)}")
          .distinct.sorted
      (mk(), mk())
    }
    viaDf(rows).foreach { case (n, b) => assert(n == b) }
  }

  test("edge shapes: empty, disjoint, identical, subset") {
    val rows = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "c"), Seq("a", "b", "c", "d")))
    assert(viaDf(rows).map(_._1) == Seq(0, 0, 0, 3, 2))
    viaDf(rows).foreach { case (n, b) => assert(n == b) }
  }

  test("duplicate-bearing counter-example: the precondition is load-bearing") {
    // r16 (verdict #2): WITH duplicates three semantics diverge — the
    // merge counts min-multiplicity matches (2 below), set semantics
    // (size(array_intersect)) counts 1, and the oracle's
    // list_filter(A, contains(B)) counts A-multiset hits. The expression
    // is only exchangeable for array_intersect on DISTINCT inputs, which
    // is why the call sites must (and do — see the next test) distinct
    // before sorting.
    import spark.implicits._
    val r = Seq((Seq("x", "x", "y"), Seq("x", "x")))
      .toDF("a", "b")
      .select(
        TextSimilarity.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect().head
    assert(r.getInt(0) == 2) // min-multiplicity merge
    assert(r.getInt(1) == 1) // set semantics
  }

  test("curation shingles are duplicate-free by construction (call-site proof)") {
    // The exact shingle expression from q_curation_e2e
    // (CurationQueries:539-543): array_distinct over adjacent-bigram
    // transforms. Texts with repeated bigrams ("a b a b a" yields "a b"
    // twice and "b a" twice pre-distinct) must still produce distinct
    // arrays, so sort_array(shingles) satisfies sorted_intersect_count's
    // sorted+duplicate-free contract and the merge equals set semantics.
    import spark.implicits._
    val texts = Seq("a b a b a", "x x x x", "p q r p q r", "solo", "")
    val df = texts.toDF("text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(toks) >= 2
              THEN array_distinct(transform(sequence(0, size(toks) - 2),
                                  i -> concat_ws(' ', slice(toks, i + 1, 2))))
              ELSE array() END"""))
      .select(col("shingles"),
        (size(col("shingles")) === size(array_distinct(col("shingles"))))
          .as("distinct_ok"))
    assert(df.collect().forall(_.getBoolean(1)))
    // and on such (sorted) sets the native count equals array_intersect
    val pairs = df.select(sort_array(col("shingles")).as("s")).collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    val cross = for (a <- pairs; b <- pairs) yield (a, b)
    viaDf(cross).foreach { case (n, b) => assert(n == b) }
  }

  test("null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Seq("a", "b")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(TextSimilarity.sortedIntersectCount(col("a"), col("b")).as("n"))
    assert(df.collect().head.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val e = org.apache.spark.sql.graft.SortedIntersectCount(null, null)
    def arr(xs: String*): ArrayData =
      ArrayData.toArrayData(xs.map(x =>
        if (x == null) null else UTF8String.fromString(x)).toArray)
    val f = classOf[org.apache.spark.sql.graft.SortedIntersectCount]
      .getDeclaredMethods.find(_.getName == "nullSafeEval").get
    f.setAccessible(true)
    def ev(a: ArrayData, b: ArrayData): Int =
      f.invoke(e, a, b).asInstanceOf[Int]
    assert(ev(arr("a", "b", "c"), arr("b", "c", "d")) == 2)
    assert(ev(arr(null, "a"), arr(null, "a")) == 1) // null elements skipped
    assert(ev(arr(), arr("a")) == 0)
  }
}

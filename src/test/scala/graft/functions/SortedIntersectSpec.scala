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

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (graft.operators.ZOrder): key math and the file-level
  * locality property that makes the layout worth paying for at 100 TB. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey interleaves bits exactly (known vectors)") {
    // (x=0b101, y=0b011) with 3 bits → z = y2 x2 y1 x1 y0 x0 = 0b011011
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(ZOrder.mortonKey(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(0x1BL, 0L, 0x3FL, 1L, 2L))
  }

  test("mortonKey is monotone in each dimension within fixed other dims") {
    // growing one coordinate can only grow the key when the other is fixed
    val df = (0L until 64L).map(x => (x, 21L)).toDF("x", "y")
      .select(col("x"), ZOrder.mortonKey(Seq(col("x"), col("y")), 6).as("z"))
      .orderBy("x").collect().map(_.getLong(1))
    assert(df.sliding(2).forall { case Array(a, b) => a < b })
  }

  test("layout() writes files whose bounding boxes shrink BOTH dims") {
    // 4096 points on a 64x64 grid, written 16 files z-ordered vs 16 files
    // sorted by x only. Every z-ordered file must bound y tightly as well;
    // the x-sorted layout leaves y unbounded (~full range) in every file —
    // that difference IS the multi-dim pruning win.
    val pts = (0 until 4096).map(i => (i % 64L, i / 64L)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString

    ZOrder.layout(pts, Seq(col("x"), col("y")), 6, 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def maxYSpan(path: String): Long =
      spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f").agg((max("y") - min("y")).as("span"))
        .agg(max("span")).head().getLong(0)

    val zSpan = maxYSpan(s"$dir/z")
    val linSpan = maxYSpan(s"$dir/linear")
    assert(zSpan <= 31, s"z-ordered file spans y by $zSpan (> one half-grid)")
    assert(linSpan >= 60, s"x-sorted control unexpectedly bounded y: $linSpan")
  }
}

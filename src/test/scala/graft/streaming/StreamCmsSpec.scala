package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming sketch maintenance: the CMS cell grid (q_cms_heavy_hitters'
  * 4×512 Count-Min state) maintained by Structured Streaming over an
  * unbounded token stream. The sketch's WHOLE POINT at 100 TB is that its
  * state is a constant 2,048 cells — which is exactly what makes a
  * complete-mode streaming aggregation of it legal and cheap (complete
  * mode over unbounded-cardinality keys would be the classic streaming
  * anti-pattern; over a fixed grid it is the canonical one). The final
  * streamed grid must equal the batch grid CELL FOR CELL — same counts,
  * same top-k estimates. */
class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 512L
  private val Lcg = Seq((69069L, 12345L), (1664525L, 1013904223L),
    (65539L, 362437L), (2034059L, 1499101L))
  private val base = // polynomial rolling hash % 2^32 (as the batch query)
    """(CASE WHEN length(tok) > 0
             THEN aggregate(transform(sequence(1, length(tok)),
                              i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT)),
                            CAST(0 AS BIGINT),
                            (acc, x) -> (acc * 31 + x) % 4294967296)
             ELSE CAST(0 AS BIGINT) END)"""

  private def cellsOf(df: org.apache.spark.sql.DataFrame) = {
    val rc = array(Lcg.map { case (a, c) =>
      (col("b") * lit(a) + lit(c)) % lit(4294967296L) % lit(W) }: _*)
    df.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("b", expr(base))
      .select(posexplode(rc).as(Seq("r", "c")))
      .groupBy("r", "c").count()
  }

  test("streamed CMS grid equals the batch grid cell-for-cell") {
    val dir = Files.createTempDirectory("graft-scms").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))

    // feed the corpus in three chunks to force multi-batch accumulation
    docs.filter(col("doc_id") % 3 === 0).write.parquet(s"$dir/src")
    docs.filter(col("doc_id") % 3 === 1)
      .write.mode("append").parquet(s"$dir/src")
    docs.filter(col("doc_id") % 3 === 2)
      .write.mode("append").parquet(s"$dir/src")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/src")
    val q = cellsOf(stream).writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/cells")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$dir/cells")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = cellsOf(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch,
      s"grids differ: ${streamed.size} streamed vs ${batch.size} batch cells")
    assert(batch.size <= 2048, "cell cardinality must stay bounded")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway r15 dev probe — A/B of the BPE training loop shape. */
object ScratchProbe {
  val BpeD = ""
  val BpeE = ""

  def bpeWords(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        s"concat_ws('', transform(sequence(1, length(word)), " +
          s"i -> concat('$BpeD', substring(word, i, 1), '$BpeE')))"))
      .select(col("syms"), col("cnt"))

  def pcOf(v: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    v.withColumn("sa", expr(
        s"filter(split(replace(syms, '$BpeD', ''), '$BpeE'), x -> x <> '')"))
      .filter(size(col("sa")) >= 2)
      .select(col("cnt"), explode(expr(
        s"transform(sequence(0, size(sa) - 2), " +
          s"i -> concat(sa[i], '$BpeD', sa[i + 1]))")).as("pairkey"))
      .groupBy("pairkey").agg(sum("cnt").as("pair_count"))

  def mergeExpr: String =
    s"replace(syms, concat('$BpeD', replace(pairkey, '$BpeD', '$BpeE$BpeD'), '$BpeE'), " +
      s"concat('$BpeD', replace(pairkey, '$BpeD', ''), '$BpeE'))"

  // variant A: current shape (checkpoint best, broadcast it, checkpoint v)
  def loopA(docs: org.apache.spark.sql.DataFrame, k: Int)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    var v = bpeWords(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
    for (i <- 1 to k) {
      val best = pcOf(v).orderBy(col("pair_count").desc, col("pairkey").asc)
        .limit(1).localCheckpoint(true)
      merges += best.withColumn("step", lit(i))
      v = v.crossJoin(broadcast(best.select(col("pairkey"))))
        .withColumn("syms", expr(mergeExpr))
        .select("syms", "cnt")
        .localCheckpoint(true)
    }
    (v, merges.toList)
  }

  // variant B: best stays lazy inside the broadcast (one checkpoint/round);
  // merges recomputed from the per-round checkpointed v at the end
  def loopB(docs: org.apache.spark.sql.DataFrame, k: Int)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    var v = bpeWords(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
    for (i <- 1 to k) {
      val best = pcOf(v).orderBy(col("pair_count").desc, col("pairkey").asc)
        .limit(1)
      merges += best.withColumn("step", lit(i))
      v = v.crossJoin(broadcast(best.select(col("pairkey"))))
        .withColumn("syms", expr(mergeExpr))
        .select("syms", "cnt")
        .localCheckpoint(true)
    }
    (v, merges.toList)
  }

  // variant C: vocabulary frame coalesced to a type-count-derived partition
  // count (1 at this scale) before the loop; same per-round algebra as A
  def loopC(docs: org.apache.spark.sql.DataFrame, k: Int)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val v0 = bpeWords(docs).localCheckpoint(true)
    val parts = math.max(1L, math.min(v0.rdd.getNumPartitions.toLong,
      v0.count() / 65536L + 1L)).toInt
    var v = if (parts < v0.rdd.getNumPartitions)
      v0.coalesce(parts).localCheckpoint(true) else v0
    val merges = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
    for (i <- 1 to k) {
      val best = pcOf(v).orderBy(col("pair_count").desc, col("pairkey").asc)
        .limit(1).localCheckpoint(true)
      merges += best.withColumn("step", lit(i))
      v = v.crossJoin(broadcast(best.select(col("pairkey"))))
        .withColumn("syms", expr(mergeExpr))
        .select("syms", "cnt")
        .localCheckpoint(true)
    }
    (v, merges.toList)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def out(m: Seq[org.apache.spark.sql.DataFrame]): Long = {
      m.reduce(_ unionAll _)
        .withColumn("parts", split(col("pairkey"), BpeD))
        .select(col("step"), col("parts")(0).as("lhs"), col("parts")(1).as("rhs"),
          concat(col("parts")(0), col("parts")(1)).as("merged"), col("pair_count"))
        .orderBy("step").count()
    }
    val docs = Tables.documents(spark, sfDir)
    for (rep <- 1 to 2) {
      t(s"rep$rep loopA K=64") { val (_, m) = loopA(docs, 64); println("[scratch] A rows " + out(m)) }
      spark.catalog.clearCache()
      t(s"rep$rep loopC K=64") { val (_, m) = loopC(docs, 64); println("[scratch] C rows " + out(m)) }
      spark.catalog.clearCache()
    }
    // value equality of the merge tables
    val (_, ma) = loopA(docs, 16)
    val (_, mb) = loopC(docs, 16)
    val a = ma.reduce(_ unionAll _).orderBy("step").collect().map(_.toString).toSeq
    val b = mb.reduce(_ unionAll _).orderBy("step").collect().map(_.toString).toSeq
    println("[scratch] equal merge tables: " + (a == b))
    spark.stop()
  }
}

// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions: TypedImperativeAggregate and ExpressionUtils are
// private[sql] extension surface.
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** KMV (bottom-k / theta) distinct-count sketch as a NATIVE Spark
  * aggregate — the mergeable-sketch story done the way a warehouse engine
  * does it: each partition folds rows into an O(k) buffer, partial buffers
  * MERGE associatively at the exchange (this class's `merge`), and the
  * final buffer yields the estimate. One pass, no distinct, no window —
  * compare q_kmv_distinct, which builds the identical sketch relationally
  * (distinct + WindowGroupLimit) so DuckDB can replay it; this aggregate
  * produces the SAME estimate from the same hash column, which is exactly
  * what its oracle checks.
  *
  * Input: a pre-hashed key column (64-bit values already scrambled into
  * [0, 2^32), e.g. SketchQueries' cross-engine polynomial hash). The
  * buffer keeps the k smallest DISTINCT hash values (a TreeSet, trimmed
  * after every insert, so memory is O(k) regardless of input size).
  * Estimate: exact buffer size when fewer than k distinct hashes exist
  * (KMV exact mode), else (k-1) * 2^32 / (h_k + 1).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  // analysis-time input contract: update() narrows to Long, so a mistyped
  // column (e.g. an int hash) must fail resolution, not ClassCastException
  // mid-execution
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct_est"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  // the fold/estimate/codec all route through KmvBuffers — ONE source of
  // truth shared with the partial/merge pair, so the documented bit-exact
  // agreement between the three aggregates cannot silently diverge
  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvBuffers.insert(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) KmvBuffers.insert(b1, it.next().longValue(), k)
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvBuffers.estimate(buf, k)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvBuffers.toBytes(buf, k)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvBuffers.fromBytes(bytes)._2 // shuffle-internal: same operator, same k

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** Shared KMV buffer codec + fold logic for the partial/merge pair below:
  * serialized form is [int k][int n][n × long hash, ascending] — a
  * portable sketch PARTIAL that can live in a table column and merge
  * later. The header records the k the partial was built with — the same
  * self-describing-header principle as BloomFilterAgg — so build- and
  * merge-site parameters cannot drift: a partial trimmed to k' < k has
  * DISCARDED hashes a k-merge needs, and merging it would yield a
  * silently biased estimate. */
object KmvBuffers {
  def insert(buf: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit = {
    if (buf.size < k || h < buf.last()) {
      buf.add(h)
      if (buf.size > k) buf.remove(buf.last())
    }
  }

  def estimate(buf: java.util.TreeSet[java.lang.Long], k: Int): Double =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 4294967296.0 / (buf.last().longValue() + 1).toDouble

  def toBytes(buf: java.util.TreeSet[java.lang.Long], k: Int): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(k)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bytes.toByteArray
  }

  /** Returns (k the partial was built with, buffer). */
  def fromBytes(b: Array[Byte]): (Int, java.util.TreeSet[java.lang.Long]) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(b))
    val kp = in.readInt()
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    (kp, buf)
  }
}

/** KMV sketch PARTIAL as a value: same fold as [[KmvSketchAgg]] but the
  * result is the serialized bottom-k buffer (BinaryType), not the
  * estimate. This is the warehouse sketch-rollup shape (theta-sketch
  * columns in Druid/BigQuery): aggregate once per fine bucket (day,
  * partition, source), STORE the partial, and answer any coarser window
  * later by merging partials with [[KmvMergeAgg]] — no re-scan of the
  * raw rows, ever. */
case class KmvSketchBinaryAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "kmv_sketch_partial"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvBuffers.insert(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) KmvBuffers.insert(b1, it.next().longValue(), k)
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvBuffers.toBytes(buf, k)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvBuffers.toBytes(buf, k)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvBuffers.fromBytes(bytes)._2 // shuffle-internal: same operator, same k

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchBinaryAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchBinaryAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchBinaryAgg =
    copy(child = newChildren.head)
}

/** Merge stored KMV partials (BinaryType column of [[KmvSketchBinaryAgg]]
  * outputs) into one estimate — the query-time half of the sketch
  * rollup. Merging partials built with k' >= k is exact w.r.t. a direct
  * k-sketch of the unioned input (bottom-k of a union = bottom-k of the
  * per-part bottom-k's when every part kept at least k). */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_merge_est"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val (kp, part) = KmvBuffers.fromBytes(v.asInstanceOf[Array[Byte]])
      // a partial trimmed below this merge's k has discarded hashes the
      // bottom-k of the union may need — merging it is silently biased,
      // so fail loudly (header principle, see KmvBuffers)
      require(kp >= k,
        s"kmv_merge_est(k=$k) fed a partial built with k=$kp < $k — " +
          "rebuild the stored partials with k >= the merge k")
      val it = part.iterator()
      while (it.hasNext) KmvBuffers.insert(buf, it.next().longValue(), k)
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) KmvBuffers.insert(b1, it.next().longValue(), k)
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvBuffers.estimate(buf, k)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvBuffers.toBytes(buf, k)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvBuffers.fromBytes(bytes)._2 // shuffle-internal: same operator, same k

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren.head)
}

/** Column-API entry point (mirrors VectorFunctions). */
object SketchFunctions {
  /** KMV distinct-count estimate of a pre-hashed long column, as a native
    * one-pass mergeable aggregate. The expression requires LongType input
    * (no implicit cast) — hash first. */
  def kmvDistinctEst(hashed: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(hashed), k)
        .toAggregateExpression())

  /** KMV sketch partial (serialized bottom-k buffer) — store per fine
    * bucket, merge later with [[kmvMergeEst]]. */
  def kmvSketchPartial(hashed: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketchBinaryAgg(ExpressionUtils.expression(hashed), k)
        .toAggregateExpression())

  /** Merge stored KMV partials into a distinct-count estimate. */
  def kmvMergeEst(partial: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvMergeAgg(ExpressionUtils.expression(partial), k)
        .toAggregateExpression())
}

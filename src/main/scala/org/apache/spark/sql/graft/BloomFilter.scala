// Lives under org.apache.spark.sql for the same reason as KmvSketchAgg /
// VectorExpressions: TypedImperativeAggregate and ExpressionUtils are
// private[sql] extension surface.
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Shared bit-position derivation for the Bloom pair below. One source of
  * truth called from BOTH the aggregate's interpreted update and the
  * membership expression's generated Java (Scala objects emit static
  * forwarders, so codegen can call
  * `org.apache.spark.sql.graft.BloomBits.bitIndex(...)` directly) — the
  * classic way a builder/prober pair silently diverges is two copies of the
  * probe schedule.
  *
  * Probe i of input hash h: splitmix64-finalize (h + i * goldenGamma), then
  * map onto [0, numBits). The per-probe gamma stride gives j independent
  * bit positions from ONE 64-bit input hash (Kirsch–Mitzenmacher double
  * hashing, strengthened by the full finalizer per probe).
  */
object BloomBits {
  private final val Gamma = 0x9E3779B97F4A7C15L

  def bitIndex(h: Long, probe: Int, numBits: Int): Int = {
    var x = h + Gamma * probe.toLong
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^= x >>> 31
    ((x >>> 1) % numBits.toLong).toInt
  }

  /** Membership probe against a serialized filter (layout documented on
    * [[BloomFilterAgg]]). Called from both the interpreted and generated
    * paths of [[BloomMightContain]]. */
  def mightContain(filter: Array[Byte], h: Long): Boolean = {
    val numBits = readIntLE(filter, 0)
    val numHashes = readIntLE(filter, 4)
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(h, i, numBits)
      if ((filter(8 + (b >>> 3)) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  def readIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
      ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
}

/** Bloom filter over a pre-hashed long column as a NATIVE mergeable Spark
  * aggregate — the other half of the mergeable-sketch story next to
  * [[KmvSketchAgg]]: each partition folds rows into a fixed O(m/8)-byte bit
  * array, partial buffers merge by bitwise OR at the exchange (associative
  * and commutative — bits(A ∪ B) = bits(A) | bits(B) exactly), and the
  * final buffer serializes to a self-describing binary value that
  * [[BloomMightContain]] probes.
  *
  * This is the 100 TB ingest-gate shape (reference analog: the content-hash
  * skip gate, `app/pipelines/document_parser.py:61-77`, which re-queries
  * the seen-hash store per document): build the filter over the seen corpus
  * in ONE pass (no distinct — duplicate inserts set the same bits), ship
  * the ~m/8-byte filter to every executor, and let the anti-join that
  * guards ingest run only over the filter's positive slice (true dupes +
  * the FP tail). No false negatives ever: a "definitely new" verdict needs
  * no join at all.
  *
  * Serialized layout (little-endian): [int numBits][int numHashes][bit
  * bytes, bit b at byte 8 + (b>>>3), mask 1<<(b&7)]. The header makes the
  * filter self-describing so build- and probe-site parameters cannot drift.
  *
  * Sizing: FP ≈ (1 - e^(-jn/m))^j; m = 2^23 bits (1 MiB) with j = 5 holds
  * FP under 1e-3 up to n ≈ 10^6 distinct keys — a fine default for a
  * broadcast gate (the filter is ~10^5× smaller than the 32 B/key exact
  * hash set it stands in for).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_filter_build"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val b = BloomBits.bitIndex(h, i, numBits)
        buf(b >>> 6) |= 1L << (b & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    // header + little-endian words: word w's byte k carries bits
    // 64w+8k .. 64w+8k+7, i.e. global bit b lands at byte 8 + (b>>>3),
    // mask 1<<(b&7) — the exact layout BloomBits.mightContain probes
    val out = new Array[Byte](8 + (numBits >>> 3))
    writeIntLE(out, 0, numBits)
    writeIntLE(out, 4, numHashes)
    var w = 0
    while (w < buf.length) {
      val v = buf(w)
      var k = 0
      while (k < 8) {
        out(8 + (w << 3) + k) = ((v >>> (k << 3)) & 0xFF).toByte
        k += 1
      }
      w += 1
    }
    out
  }

  private def writeIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xFF).toByte
    a(off + 1) = ((v >>> 8) & 0xFF).toByte
    a(off + 2) = ((v >>> 16) & 0xFF).toByte
    a(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** Codegen'd membership probe against a [[BloomFilterAgg]] filter.
  * `left` is the serialized filter (BinaryType — in the gate pattern a
  * literal, so every task probes a plan-shipped byte array with zero
  * per-row join work), `right` the same pre-hashed long column the filter
  * was built over. Never a false negative; false positives at the filter's
  * designed rate — callers re-verify positives with an exact join.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(f: Any, h: Any): Any =
    BloomBits.mightContain(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, h) => {
      // one probe-schedule implementation: the generated code calls the
      // same static BloomBits.mightContain the interpreted path uses
      s"${ev.value} = org.apache.spark.sql.graft.BloomBits.mightContain($f, $h);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points (mirrors SketchFunctions / VectorFunctions). */
object BloomFunctions {
  /** Build a Bloom filter over a pre-hashed long column; returns one binary
    * value per group (self-describing: numBits and numHashes travel in the
    * header). */
  def bloomBuild(hashed: Column, numBits: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      BloomFilterAgg(ExpressionUtils.expression(hashed), numBits, numHashes)
        .toAggregateExpression())

  /** Probe a serialized filter. No false negatives; FP at the designed
    * rate. */
  def bloomMightContain(filter: Column, hashed: Column): Column =
    ExpressionUtils.column(
      BloomMightContain(
        ExpressionUtils.expression(filter),
        ExpressionUtils.expression(hashed)))
}

package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL sketch buffer (Karnin–Lang–Liberty, FOCS'16 — public literature):
  * a hierarchy of compactors where level `h` items each stand for `2^h`
  * input rows. Level capacities decay geometrically from `k` at the top
  * (factor 2/3, floor 2), so the whole summary holds O(k + log(n/k))
  * items; a full level is sorted and every other item (random offset)
  * promoted one level up. Compaction preserves TOTAL weight exactly
  * (m items of weight w become m/2 of weight 2w; an odd straggler stays
  * put), so estimated ranks are anchored to the true row count, and the
  * same compaction serves [[KllQuantilesAgg.merge]] — which is what makes
  * the sketch a true bounded-memory distributed aggregate: at most
  * O(k log n) values cross the shuffle per group, versus a full sort for
  * exact quantiles. Normalized rank error for k=200 is ~1.65% at 99%
  * confidence; callers gate at a documented safety margin above that.
  *
  * The compaction coin is a xorshift64 stream carried in the buffer
  * (serialized with it), so results are reproducible for a fixed merge
  * order; across merge orders the CONTENTS vary while the rank-error
  * guarantee holds — downstream checks must assert the guarantee, not the
  * sketch (same contract as [[MisraGriesAgg]] / k14).
  */
final class KllBuffer(val k: Int) {
  var n: Long = 0L
  private var rng: Long = 0x9E3779B97F4A7C15L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])

  private def nextBit(): Boolean = {
    rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
    (rng & 1L) == 1L
  }

  /** Mix the other buffer's rng in so a merged sketch doesn't replay one
    * side's coin stream verbatim. */
  def mixRng(other: Long): Unit = rng ^= java.lang.Long.rotateLeft(other, 31)
  def rngState: Long = rng
  def setRngState(s: Long): Unit = rng = s

  private def cap(h: Int): Int = {
    val depth = levels.length - 1 - h
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
  }

  def totalSize: Int = {
    var s = 0; var h = 0
    while (h < levels.length) { s += levels(h).length; h += 1 }
    s
  }

  private def totalCap: Int = {
    var s = 0; var h = 0
    while (h < levels.length) { s += cap(h); h += 1 }
    s
  }

  def update(v: Double): Unit = { levels(0) += v; n += 1; compress() }

  def compress(): Unit = {
    while (totalSize > totalCap) {
      // total size > total cap ⇒ some level is at/over its capacity;
      // compact the lowest such level (standard KLL schedule)
      var h = 0
      while (levels(h).length < cap(h)) h += 1
      compactLevel(h)
    }
  }

  private def compactLevel(h: Int): Unit = {
    val buf = levels(h)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    if (h + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val even = arr.length & ~1
    val out = levels(h + 1)
    var i = if (nextBit()) 1 else 0
    while (i < even) { out += arr(i); i += 2 }
    buf.clear()
    // odd straggler keeps its level and weight — total weight stays == n
    if (even < arr.length) buf += arr(arr.length - 1)
  }

  def mergeIn(other: KllBuffer): Unit = {
    n += other.n
    mixRng(other.rngState)
    var h = 0
    while (h < other.levels.length) {
      if (h >= levels.length) levels += ArrayBuffer.empty[Double]
      levels(h) ++= other.levels(h)
      h += 1
    }
    compress()
  }

  /** Quantile estimates at `probs`: weighted summary sorted by value,
    * answer for p is the first value whose cumulative weight reaches
    * max(1, ceil(p·n)). Null-free; caller handles n == 0. */
  def quantiles(probs: Array[Double]): Array[Double] = {
    var m = 0; var h = 0
    while (h < levels.length) { m += levels(h).length; h += 1 }
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var i = 0
    h = 0
    while (h < levels.length) {
      val lv = levels(h)
      var j = 0
      while (j < lv.length) { vals(i) = lv(j); wts(i) = 1L << h; i += 1; j += 1 }
      h += 1
    }
    val order = (0 until m).sortBy(vals)
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L; var oi = 0; var ans = vals(order(m - 1))
      var found = false
      while (oi < m && !found) {
        cum += wts(order(oi))
        if (cum >= target) { ans = vals(order(oi)); found = true }
        oi += 1
      }
      ans
    }
  }
}

/** Mergeable quantile sketch aggregate (SURVEY.md §2.1 D6/L4 family): the
  * scale tier for exact percentile queries (q44) — `percentile_approx`'s
  * job with an explicitly-bounded summary and public mergeability math.
  * Returns `array<double>` of estimates at `probs`, NULL for an empty
  * group. See [[KllBuffer]] for the sketch and its guarantee contract;
  * the k15 gate asserts the rank-error bound against exact ranks, never
  * the sketch contents.
  */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, "sketch parameter k must be >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "probs must be fractions in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires a DOUBLE input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = { a.mergeIn(b); a }

  override def eval(buf: KllBuffer): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.quantiles(probs.toArray).map(d => d: Any))

  override def serialize(buf: KllBuffer): Array[Byte] = {
    var size = 8 + 8 + 4
    buf.levels.foreach(lv => size += 4 + 8 * lv.length)
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putLong(buf.rngState)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lv =>
      bb.putInt(lv.length)
      lv.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(k)
    buf.n = bb.getLong
    buf.setRngState(bb.getLong)
    val nl = bb.getInt
    var h = 0
    while (h < nl) {
      if (h >= buf.levels.length) buf.levels += ArrayBuffer.empty[Double]
      val m = bb.getInt
      var i = 0
      while (i < m) { buf.levels(h) += bb.getDouble; i += 1 }
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_quantiles"
}

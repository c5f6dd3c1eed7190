package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (SURVEY.md §2.1 L4/K5): at most `k`
  * (term, count) counters summarizing a string stream of length n with the
  * classic deterministic guarantees, under ANY partitioning / merge order:
  *
  *   - every term with true count > n/k is present in the summary;
  *   - each reported count underestimates the true count by at most n/k.
  *
  * The merge is the Agarwal et al. ("Mergeability of Summaries", PODS'12)
  * rule: sum counters pairwise, then subtract the (k+1)-largest count from
  * all and drop non-positives — which preserves both guarantees, making
  * this a true bounded-memory distributed aggregate: ≤ k counters cross
  * the shuffle per group no matter how many terms the group holds. That is
  * the 100 TB story: exact per-term counts need a term-keyed shuffle of
  * the whole vocabulary; the frequent-terms question needs k counters.
  *
  * Summary CONTENTS beyond the guarantees (exact counter values, which
  * sub-threshold terms survive) depend on merge order, so downstream
  * checks must assert the guarantees, not the exact sketch — see k14.
  * NULL inputs are skipped. Output: array<struct<term,est>> sorted by
  * est desc, term asc.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]] {

  require(k >= 1, "sketch size must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_topk requires a STRING input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  override def update(
      buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      val cur = buf.get(t)
      if (cur != 0L || buf.containsKey(t)) buf.put(t, cur + 1L)
      else if (buf.size() < k) {
        // inputs reuse row memory — copy the bytes before keying on them
        buf.put(UTF8String.fromBytes(t.getBytes), 1L)
      } else {
        // decrement-all: O(k) on a miss, amortized O(1) per input overall
        // (every decrement cancels one previous increment); a production
        // kernel would carry a lazy global offset instead of the loop
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      a: java.util.HashMap[UTF8String, Long],
      b: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    b.forEach { (t, c) =>
      val cur = a.get(t)
      if (cur != 0L || a.containsKey(t)) a.put(t, cur + c) else a.put(t, c)
    }
    if (a.size() > k) {
      // subtract the (k+1)-largest counter from all; drop non-positives
      val counts = new Array[Long](a.size())
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(a.size() - k - 1) // (k+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size())
    var i = 0
    buf.forEach { (t, c) => entries(i) = (t, c); i += 1 }
    val sorted = entries.sortWith { case ((ta, ca), (tb, cb)) =>
      if (ca != cb) ca > cb else ta.compareTo(tb) < 0
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    var size = 4
    buf.forEach { (t, _) => size += 4 + t.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size())
    buf.forEach { (t, c) =>
      val bytes = t.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.put(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_topk"
}

package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels: interpreted vs codegen parity + semantics. */
class TextHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("wordHashes: whitespace runs split like split('\\s+'); empty → empty") {
    val h1 = TextHash.wordHashes(UTF8String.fromString("a  b\tc\n d "))
    assert(h1.numElements() == 4)
    assert(TextHash.wordHashes(UTF8String.fromString("")).numElements() == 0)
    assert(TextHash.wordHashes(UTF8String.fromString("   ")).numElements() == 0)
  }

  test("wordShingleHashes: sorted, distinct, empty when too short") {
    val sh = TextHash.wordShingleHashes(UTF8String.fromString("a b c d"), 3)
    assert(sh.numElements() == 2) // "a b c", "b c d"
    val arr = (0 until 2).map(sh.getLong)
    assert(arr == arr.sorted)
    assert(TextHash.wordShingleHashes(UTF8String.fromString("a b"), 3)
      .numElements() == 0)
    // repeated shingles collapse
    assert(TextHash.wordShingleHashes(UTF8String.fromString("x x x x x"), 3)
      .numElements() == 1)
  }

  test("shingle hashes are order-sensitive (rolling combine, not a bag)") {
    val ab = TextHash.wordShingleHashes(UTF8String.fromString("a b"), 2).getLong(0)
    val ba = TextHash.wordShingleHashes(UTF8String.fromString("b a"), 2).getLong(0)
    assert(ab != ba)
  }

  test("bandHashes: bands count, determinism, band index in the seed") {
    val sig = TextHash.minhash(
      TextHash.wordShingleHashes(UTF8String.fromString("a b c d e f g"), 3), 8)
    val bh = TextHash.bandHashes(sig, 4)
    assert(bh.numElements() == 4)
    val again = TextHash.bandHashes(sig, 4)
    assert((0 until 4).forall(i => bh.getLong(i) == again.getLong(i)))
    // identical CONTENT in different bands must hash differently (the band
    // index seeds the fold) — use a constant signature to force equal runs
    val const = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(8)(7L))
    val cb = TextHash.bandHashes(const, 4)
    assert((0 until 4).map(cb.getLong).distinct.size == 4)
  }

  test("codegen path equals interpreted for all four expressions") {
    val df = Seq("alpha beta gamma delta", "x y", "")
      .toDF("t")
      .select(
        GraftFunctions.word_hashes(col("t")).as("wh"),
        GraftFunctions.word_shingle_hashes(col("t"), 2).as("sh"),
        GraftFunctions.simhash64(GraftFunctions.word_hashes(col("t"))).as("sim"),
        GraftFunctions.minhash_signature(
          GraftFunctions.word_shingle_hashes(col("t"), 2), 8).as("mh"))
    val rows = df.collect()
    val interWh = TextHash.wordHashes(UTF8String.fromString("alpha beta gamma delta"))
    assert(rows(0).getSeq[Long](0) ==
      (0 until interWh.numElements()).map(interWh.getLong))
    assert(rows(0).getSeq[Long](3).length == 8)
    assert(rows(1).getSeq[Long](1).length == 1) // "x y" has exactly one 2-shingle
    assert(rows(2).getSeq[Long](0).isEmpty)
  }

  test("simhash locality: identical equal, near close, disjoint far") {
    def sig(s: String) =
      TextHash.simhash(TextHash.wordHashes(UTF8String.fromString(s)))
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val far = (200 to 240).map(i => s"far$i").mkString(" ")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sig(base) == sig(base))
    assert(ham(sig(base), sig(near)) <= 16)
    assert(ham(sig(base), sig(far)) >= 20)
  }

  test("wordShingleHashesPos: positional order, duplicates kept, same " +
    "per-span hash as the set kernel") {
    def pos(s: String, n: Int) = {
      val a = TextHash.wordShingleHashesPos(UTF8String.fromString(s), n)
      (0 until a.numElements()).map(a.getLong)
    }
    def set(s: String, n: Int) = {
      val a = TextHash.wordShingleHashes(UTF8String.fromString(s), n)
      (0 until a.numElements()).map(a.getLong)
    }
    // "a b a b a": 2-shingles at positions 1..4 = ab, ba, ab, ba — the
    // repeated spans k33 exists to see, which the set kernel collapses
    val p = pos("a b a b a", 2)
    assert(p.length == 4 && p(0) == p(2) && p(1) == p(3) && p(0) != p(1))
    // same combine ⇒ sorted-distinct positional == set kernel exactly
    assert(p.distinct.sorted == set("a b a b a", 2))
    // position order is document order, not hash order
    assert(pos("x y z", 2) ==
      Seq(pos("x y", 2).head, pos("y z", 2).head))
    // too short → empty
    assert(pos("one", 2).isEmpty)
  }

  test("minhash similarity tracks Jaccard on planted near-duplicates") {
    def mh(s: String) = {
      val arr = TextHash.minhash(
        TextHash.wordShingleHashes(UTF8String.fromString(s), 3), 64)
      (0 until 64).map(arr.getLong)
    }
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (1 to 29).map(i => s"w$i").mkString(" ")
    val agree = mh(a).zip(mh(b)).count { case (x, y) => x == y } / 64.0
    assert(agree > 0.7, s"signature agreement $agree should approximate Jaccard ~0.93")
  }
}

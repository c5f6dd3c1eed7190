package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Scalacheck properties over the native text-hash kernels (no Spark jobs —
  * static-method calls, so hundreds of cases run in milliseconds).
  */
object TextHashPropertiesSpec extends Properties("TextHash") {

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
  private val docGen: Gen[List[String]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, wordGen))

  private def utf8(words: List[String]): UTF8String =
    UTF8String.fromString(words.mkString(" "))

  property("wordHashes count == word count; whitespace-insensitive") =
    forAll(docGen) { words =>
      val normal = TextHash.wordHashes(utf8(words))
      val spaced = TextHash.wordHashes(
        UTF8String.fromString(words.mkString("  ") + " "))
      normal.numElements() == words.length &&
        spaced.numElements() == words.length
    }

  property("shingle count <= max(0, words - n + 1); sorted distinct") =
    forAll(docGen, Gen.chooseNum(1, 4)) { (words, n) =>
      val sh = TextHash.wordShingleHashes(utf8(words), n)
      val xs = (0 until sh.numElements()).map(sh.getLong)
      xs.length <= math.max(0, words.length - n + 1) &&
        xs == xs.sorted && xs.distinct.length == xs.length
    }

  property("deterministic: same text, same hashes") = forAll(docGen) { words =>
    val a = TextHash.wordShingleHashes(utf8(words), 3)
    val b = TextHash.wordShingleHashes(utf8(words), 3)
    (0 until a.numElements()).forall(i => a.getLong(i) == b.getLong(i)) &&
      a.numElements() == b.numElements()
  }

  property("minhash signature of identical sets agrees everywhere; " +
    "signature length is k") =
    forAll(docGen.suchThat(_.length >= 3), Gen.chooseNum(1, 32)) { (words, k) =>
      val sh = TextHash.wordShingleHashes(utf8(words), 3)
      val a = TextHash.minhash(sh, k)
      val b = TextHash.minhash(sh, k)
      a.numElements() == k &&
        (0 until k).forall(i => a.getLong(i) == b.getLong(i))
    }

  property("simhash of a permuted token bag is identical (order-free votes)") =
    forAll(docGen.suchThat(_.nonEmpty)) { words =>
      val a = TextHash.simhash(TextHash.wordHashes(utf8(words)))
      val b = TextHash.simhash(TextHash.wordHashes(utf8(words.reverse)))
      a == b
    }

  property("dropping one word moves simhash at most a bounded distance") =
    forAll(docGen.suchThat(_.length >= 20)) { words =>
      val a = TextHash.simhash(TextHash.wordHashes(utf8(words)))
      val b = TextHash.simhash(TextHash.wordHashes(utf8(words.drop(1))))
      java.lang.Long.bitCount(a ^ b) <= 32
    }
}

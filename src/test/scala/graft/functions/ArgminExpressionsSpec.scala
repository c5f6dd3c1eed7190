package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The r19 map-only argmin kernels must be BIT-IDENTICAL to the
  * crossJoin → groupBy → min_by formulations they replaced (the oracle
  * gates hash query results, so "close" is not enough). Each test
  * re-states the old join formulation inline and compares exact values on
  * a deterministic pseudo-random fixture, including the tie-break and
  * null/mismatch edges; interpreted-vs-codegen parity rides the same
  * comparisons (eval via kernel object, codegen via the DataFrame path).
  */
class ArgminExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val nLists = 5

  /** Deterministic "random" doubles — no RNG, reproducible. */
  private def vec(seed: Int): Seq[Double] =
    (0 until dim).map(i => math.sin(seed * 31 + i * 7).abs * 2 - 1)

  private def corpus: DataFrame =
    (1 to 60).map(i => (i.toLong, vec(i))).toDF("id", "v")

  private def centroids: DataFrame =
    (1 to nLists).map(i => (i, vec(i * 100))).toDF("list_id", "centroid")

  /** The OLD assignToNearest: broadcast crossJoin + groupBy(id) min_by. */
  private def joinAssign(rows: DataFrame, cents: DataFrame): DataFrame = {
    val v = col("v").cast("array<double>")
    val score =
      GraftFunctions.dot_product(col("centroid"), col("centroid")) -
        lit(2.0) * GraftFunctions.dot_product(v, col("centroid"))
    rows
      .crossJoin(broadcast(cents))
      .withColumn("__d", score)
      .groupBy(col("id"))
      .agg(min_by(
        struct(col("list_id"), col("v")),
        struct(col("__d"), col("list_id"))).as("__m"))
      .select(col("id"), col("__m.list_id").as("list_id"))
  }

  private def booksCol(cents: Seq[(Int, Int, Seq[Double])]) = {
    import org.apache.spark.sql.types._
    val t = ArrayType(StructType(Seq(
      StructField("m", IntegerType, false),
      StructField("code", IntegerType, false),
      StructField("c", ArrayType(DoubleType, false), false))), false)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(t)
    org.apache.spark.sql.graftbridge.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal(
        conv(cents.sortBy(e => (e._1, e._2))), t))
  }

  test("subspace_argmin == crossJoin+min_by assignment (bit-exact)") {
    val cents = (1 to nLists).map(i => (0, i, vec(i * 100)))
    val got = corpus
      .select(col("id"), element_at(
        GraftFunctions.subspace_argmin(col("v"), booksCol(cents)), 1)
        .as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = joinAssign(corpus, centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    assert(got.size == 60)
  }

  test("subspace_argmin tie-break: equal distance goes to the LOWER code") {
    // two identical centroids under different codes — min_by(struct(d, code))
    // picks the lower code; the kernel's strict < over ascending codes must too
    val cents = Seq((0, 7, vec(1)), (0, 3, vec(1)))
    val got = Seq((1L, vec(5))).toDF("id", "v")
      .select(element_at(
        GraftFunctions.subspace_argmin(col("v"), booksCol(cents)), 1))
      .head().getInt(0)
    assert(got == 3)
  }

  test("subspace_argmin: null vector / wrong length -> null") {
    val cents = (1 to nLists).map(i => (0, i, vec(i * 100)))
    val rows = Seq(
      (1L, Some(vec(1))), (2L, None), (3L, Some(vec(1).take(3)))
    ).toDF("id", "v")
    val got = rows.select(col("id"),
      GraftFunctions.subspace_argmin(col("v"), booksCol(cents)).as("a"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true))
  }

  /** The OLD pqEncodeFrom: explode per (row, subspace) → broadcast join →
    * groupBy(id, m) argmin → groupBy(id) collect.
    */
  private def joinEncode(
      df: DataFrame, codebooks: DataFrame, nSub: Int, sub: Int): DataFrame = {
    val perSub = df
      .select(col("id"), expr(
        s"transform(cast(v AS array<double>), x -> floor(x * 1024))").as("qv"))
      .select(col("id"), explode(expr(
        s"transform(sequence(0, ${nSub - 1}), " +
          s"mi -> struct(mi AS m, slice(qv, mi * $sub + 1, $sub) AS qs))"))
        .as("e"))
      .select(col("id"), col("e.m").as("m"), col("e.qs").as("qs"))
    val dist = "aggregate(zip_with(qs, qsub, (a, b) -> (a - b) * (a - b)), " +
      "0L, (acc, x) -> acc + x)"
    perSub.join(broadcast(codebooks), Seq("m"))
      .withColumn("__d", expr(dist))
      .groupBy("id", "m")
      .agg(min_by(col("code"), struct(col("__d"), col("code"))).as("code"),
        min(col("__d")).as("dmin"))
      .groupBy("id")
      .agg(
        transform(array_sort(collect_list(struct(col("m"), col("code")))),
          e => e.getField("code")).as("codes"),
        sum(col("dmin")).as("dist"))
  }

  test("pq_encode == explode+join+groupBy encode (codes AND distortion)") {
    val nSub = 4
    val sub = dim / nSub
    val nCodes = 3
    val seeds = (0 until nCodes).map(c => (c, vec(c * 50 + 7)))
    val books = seeds.flatMap { case (code, c) =>
      val qc = c.map(x => math.floor(x * 1024.0).toLong)
      (0 until nSub).map(mi => (mi, code, qc.slice(mi * sub, (mi + 1) * sub)))
    }
    val codebooks = books.toDF("m", "code", "qsub")
    val booksLit = {
      import org.apache.spark.sql.types._
      val t = ArrayType(StructType(Seq(
        StructField("m", IntegerType, false),
        StructField("code", IntegerType, false),
        StructField("c", ArrayType(LongType, false), false))), false)
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(t)
      org.apache.spark.sql.graftbridge.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.Literal(
          conv(books.sortBy(e => (e._1, e._2))), t))
    }
    val got = corpus
      .select(col("id"),
        GraftFunctions.pq_encode(col("v"), booksLit, 1024L).as("r"))
      .select(col("id"), col("r.codes").as("codes"), col("r.dist").as("dist"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    val want = joinEncode(corpus, codebooks, nSub, sub)
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.size == 60)
  }

  test("adc_distance == aggregate(zip_with) fold") {
    val nSub = 4
    val nCodes = 3
    val rows = (1 to 40).map { i =>
      (i.toLong, (0 until nSub).map(m => (i + m) % nCodes))
    }.toDF("id", "codes")
    val tbl = (0 until nSub * nCodes).map(i => (i * 17 + 3).toLong)
    val withTbl = rows.withColumn("tbl", typedLit(tbl))
    val got = withTbl
      .select(col("id"), GraftFunctions.adc_distance(col("codes"), col("tbl")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = withTbl
      .withColumn("adist", expr(
        s"aggregate(zip_with(codes, sequence(0, ${nSub - 1}), " +
          s"(c, mi) -> element_at(tbl, mi * $nCodes + c + 1)), " +
          "0L, (acc, x) -> acc + x)"))
      .select(col("id"), col("adist"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("subspace_argmin with non-finite inputs still matches min_by " +
    "(NaN best must be displaceable — ADVICE r19)") {
    // +Inf in the vector: dvc = Inf·0 = NaN against a centroid with a 0
    // there, ±Inf against a nonzero one → mixed NaN/finite distances.
    // min_by(struct(d, code)) sorts NaN LAST; the kernel's comparison
    // must displace a stored NaN best with any later finite candidate.
    val zeroAt0 = 0.0 +: vec(2).tail // code 1: d becomes NaN
    val nonZeroAt0 = 1.0 +: vec(3).tail // code 2: d stays ±Inf (ordered)
    val cents = Seq((1, zeroAt0), (2, nonZeroAt0)).toDF("list_id", "centroid")
    val books = Seq((0, 1, zeroAt0), (0, 2, nonZeroAt0))
    val infVec = Double.PositiveInfinity +: vec(7).tail
    val rows = Seq((1L, infVec), (2L, infVec.map(-_))).toDF("id", "v")
    val got = rows
      .select(col("id"), element_at(
        GraftFunctions.subspace_argmin(col("v"), booksCol(books)), 1)
        .as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = joinAssign(rows, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    assert(got.values.toSet == Set(2), "the finite-distance centroid wins")
  }

  test("adc_distance: a NULL code element yields NULL, like the " +
    "aggregate(zip_with) HOF (ADVICE r19)") {
    val nSub = 4
    val nCodes = 3
    val tbl = (0 until nSub * nCodes).map(i => (i * 17 + 3).toLong)
    val rows = Seq(
      (1L, Seq[Option[Int]](Some(1), Some(2), Some(0), Some(1))),
      (2L, Seq[Option[Int]](Some(1), None, Some(0), Some(1))) // null element
    ).toDF("id", "codes").withColumn("tbl", typedLit(tbl))
    val got = rows
      .select(col("id"),
        GraftFunctions.adc_distance(col("codes"), col("tbl")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    val want = rows
      .withColumn("adist", expr(
        s"aggregate(zip_with(codes, sequence(0, ${nSub - 1}), " +
          s"(c, mi) -> element_at(tbl, mi * $nCodes + c + 1)), " +
          "0L, (acc, x) -> acc + x)"))
      .select(col("id"), col("adist"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(got == want)
    assert(got(2L).isEmpty, "null code element must not read as 0")
  }

  test("broadcast-backed model expression == inlined Literal (values), " +
    "and the plan carries the handle, not the array") {
    import org.apache.spark.sql.types._
    val cents = (1 to nLists).map(i => (0, i, vec(i * 100)))
    val t = ArrayType(StructType(Seq(
      StructField("m", IntegerType, false),
      StructField("code", IntegerType, false),
      StructField("c", ArrayType(DoubleType, false), false))), false)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(t)
    val data = conv(cents.sortBy(e => (e._1, e._2)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bcCol = org.apache.spark.sql.graftbridge.GraftBridge.column(
      BroadcastArrayLiteral(spark.sparkContext.broadcast(data), t))
    // repartition barrier: ConvertToLocalRelation would otherwise eval the
    // whole projection over the Seq-backed LocalRelation at optimization
    // time and leave nothing of the kernel in the plan to assert on
    val viaBc = corpus.repartition(2)
      .select(col("id"), element_at(
        GraftFunctions.subspace_argmin(col("v"), bcCol), 1).as("list_id"))
    val got = viaBc.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = corpus
      .select(col("id"), element_at(
        GraftFunctions.subspace_argmin(col("v"), booksCol(cents)), 1)
        .as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    val plan = viaBc.queryExecution.executedPlan.toString
    assert(plan.contains("model_broadcast"),
      s"plan must reference the broadcast handle:\n$plan")
    // the literal form would inline every centroid element into the plan
    // string; the broadcast form must not
    assert(!plan.contains(vec(100).head.toString),
      "plan must not inline the model array")
  }

  test("interpreted eval equals the codegen DataFrame path") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val cents = (1 to nLists).map(i => (0, i, vec(i * 100)))
    // interpreted: call eval directly on literal children
    val booksExpr = org.apache.spark.sql.graftbridge.GraftBridge
      .expression(booksCol(cents))
    val kernel = SubspaceArgminDouble(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vec(9), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, false)),
      booksExpr)
    val interpreted = kernel.eval(null)
      .asInstanceOf[ArrayData].getInt(0)
    val viaCodegen = Seq((1L, vec(9))).toDF("id", "v")
      .select(element_at(
        GraftFunctions.subspace_argmin(col("v"), booksCol(cents)), 1))
      .head().getInt(0)
    assert(interpreted == viaCodegen)
  }
}

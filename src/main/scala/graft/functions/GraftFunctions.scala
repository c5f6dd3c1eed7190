package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration + Column wrappers for graft's custom Catalyst expressions.
  *
  * Queries receive an externally-built SparkSession (driver contract), so
  * registration is done lazily and idempotently via [[register]] instead of
  * requiring `withExtensions` at build time. [[GraftExtensions]] offers the
  * `SparkSessionExtensions` path for sessions we do control.
  */
object GraftFunctions extends org.apache.spark.internal.Logging {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim"        -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product"       -> (es => DotProduct(es(0), es(1))),
    "l2_norm"           -> (es => L2Norm(es.head)),
    "array_predecessor" -> (es => ArrayPredecessor(es(0), es(1))),
    "word_hashes"       -> (es => WordHashes(es.head)),
    "simhash64"         -> (es => SimHash64(es.head)),
    "sorted_intersect_size" -> (es => SortedIntersectSize(es(0), es(1))),
    "int8_quantize"     -> (es => Int8Quantize(es.head)),
    "subspace_argmin"   -> (es => SubspaceArgminDouble(es(0), es(1))),
    "adc_distance"      -> (es => AdcDistance(es(0), es(1)))
  )

  /** Session-local flag marking that a [[graft.plans.GlobalWindowGuard]]
    * instance is already active, whichever injection path installed it —
    * `GraftExtensions.injectOptimizerRule` (build-time) or [[register]]
    * (`experimental.extraOptimizations`, run-time). Without it a session
    * built with the extensions that also calls register() would run TWO
    * guard instances and double-log every flagged plan (ADVICE r3).
    * The flag check is order-dependent (the extensions builder only runs
    * at first optimizer execution — ADVICE r4), so the log/throw site
    * itself also dedupes via a per-Window-node tag
    * ([[graft.plans.GlobalWindowGuard.Warned]]); a redundant second
    * instance can still end up in the rule list, but it is silent.
    */
  private[graft] val GuardInstalledKey = "graft.lint.globalWindowGuard.installed"

  /** Session-local flag: graft's function builders are installed in this
    * session's registry (set by the first [[register]] call; later calls
    * no-op instead of re-registering every name — ADVICE r5).
    */
  private[graft] val FunctionsInstalledKey = "graft.functions.installed"

  /** Idempotently register all graft functions on an existing session,
    * and install the [[graft.plans.GlobalWindowGuard]] lint rule through
    * the public `experimental.extraOptimizations` hook (the only injection
    * point for sessions graft did not build — the driver contract).
    * The lint-rule side effect is documented here deliberately: register()
    * is graft's single "attach to a foreign session" entry point.
    */
  def register(spark: SparkSession): Unit = {
    val fr = GraftBridge.functionRegistry(spark)
    // The per-session flag (not a functionExists probe — ADVICE r5) makes
    // repeated register() calls true no-ops without the WARN-per-name spam
    // of blind re-registration, while the FIRST call unconditionally
    // installs graft's builders: a pre-existing foreign function under a
    // graft name is REPLACED (with a warning naming it), never silently
    // kept — keeping it would change query semantics with no signal.
    if (!spark.conf.getOption(FunctionsInstalledKey).contains("true")) {
      fns.foreach { case (name, builder) =>
        if (fr.functionExists(FunctionIdentifier(name)))
          logWarning(s"graft register(): replacing pre-existing function " +
            s"'$name' with the graft implementation")
        fr.createOrReplaceTempFunction(name, builder, "built-in")
      }
      spark.conf.set(FunctionsInstalledKey, "true")
    }
    val alreadyActive =
      spark.conf.getOption(GuardInstalledKey).contains("true") ||
        spark.experimental.extraOptimizations
          .exists(_.isInstanceOf[graft.plans.GlobalWindowGuard])
    if (!alreadyActive) {
      // rewrite first, guard second: when the opt-in rewrite fires there is
      // no unpartitioned Window left for the guard to warn about
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          new graft.plans.RewriteGlobalTrailingWindow(spark) :+
          new graft.plans.GlobalWindowGuard(spark)
      spark.conf.set(GuardInstalledKey, "true")
    }
  }

  // Typed Column API (usable without registration).
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  def l2_norm(a: Column): Column =
    GraftBridge.column(L2Norm(GraftBridge.expression(a)))
  def array_predecessor(arr: Column, v: Column): Column =
    GraftBridge.column(
      ArrayPredecessor(GraftBridge.expression(arr), GraftBridge.expression(v)))
  def word_hashes(text: Column): Column =
    GraftBridge.column(WordHashes(GraftBridge.expression(text)))
  def word_shingle_hashes(text: Column, n: Int): Column =
    GraftBridge.column(WordShingleHashes(GraftBridge.expression(text), n))
  def word_shingle_hashes_pos(text: Column, n: Int): Column =
    GraftBridge.column(WordShingleHashesPos(GraftBridge.expression(text), n))
  def minhash_signature(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashes), k))
  def band_hashes(signature: Column, bands: Int): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(signature), bands))
  def simhash64(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
  def bottom_k_sketch(hashes: Column, k: Int): Column =
    GraftBridge.column(
      BottomKSketchAgg(GraftBridge.expression(hashes), k)
        .toAggregateExpression())
  def mg_topk(term: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(term), k).toAggregateExpression())
  def int8_quantize(v: Column): Column =
    GraftBridge.column(Int8Quantize(GraftBridge.expression(v)))
  def subspace_argmin(v: Column, books: Column): Column =
    GraftBridge.column(SubspaceArgminDouble(
      GraftBridge.expression(v), GraftBridge.expression(books)))
  def pq_encode(v: Column, books: Column, scale: Long): Column =
    GraftBridge.column(PqEncodeCodes(
      GraftBridge.expression(v), GraftBridge.expression(books), scale))
  def adc_distance(codes: Column, tbl: Column): Column =
    GraftBridge.column(AdcDistance(
      GraftBridge.expression(codes), GraftBridge.expression(tbl)))
  def kll_quantiles(v: Column, k: Int, probs: Seq[Double]): Column =
    GraftBridge.column(
      KllQuantilesAgg(GraftBridge.expression(v), k, probs).toAggregateExpression())

  /** Spark's own bloom-filter sketch aggregate (the runtime-join-filter
    * machinery, used directly): ORs per-partition filters, so the merge is
    * commutative and the built bytes are partition-order independent.
    * `h` must be a BIGINT column (hash values, e.g. `xxhash64`).
    */
  def bloom_filter_agg(h: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(h),
        Literal(expectedItems), Literal(numBits), 0, 0)
        .toAggregateExpression())
  }

  /** Membership probe against [[bloom_filter_agg]] bytes — one-sided:
    * never a false negative. `filter` must be foldable (a literal /
    * broadcast scalar); the expression deserializes it once per task.
    */
  def bloom_might_contain(filter: Column, h: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    GraftBridge.column(
      BloomFilterMightContain(
        GraftBridge.expression(filter), GraftBridge.expression(h)))
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(spark =>
      new graft.plans.RewriteGlobalTrailingWindow(spark))
    ext.injectOptimizerRule { spark =>
      // builder runs once per session at optimizer construction; flag the
      // session so a later GraftFunctions.register() doesn't add a second
      // guard via experimental.extraOptimizations
      spark.conf.set(GraftFunctions.GuardInstalledKey, "true")
      new graft.plans.GlobalWindowGuard(spark)
    }
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    ext.injectFunction((
      FunctionIdentifier("array_predecessor"),
      new ExpressionInfo(classOf[ArrayPredecessor].getName, "array_predecessor"),
      (es: Seq[Expression]) => ArrayPredecessor(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("word_hashes"),
      new ExpressionInfo(classOf[WordHashes].getName, "word_hashes"),
      (es: Seq[Expression]) => WordHashes(es.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (es: Seq[Expression]) => SortedIntersectSize(es(0), es(1))))
  }
}

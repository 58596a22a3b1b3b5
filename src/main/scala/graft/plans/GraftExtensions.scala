package graft.plans

import graft.functions.{DotProduct, HashedSortedGrams, JaccardSim, MinHashSig, RollingHash, SimHashSig, SortedLongJaccard}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  ArrayAggregate, BloomFilterMightContain, Expression, ExpressionInfo,
  LambdaFunction, Literal, NamedLambdaVariable, ZipWith, Add => CAdd,
  Multiply => CMultiply
}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst rule: rewrite the interpreted higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  * into the native codegen'd [[graft.functions.DotProduct]].
  *
  * HOF lambdas evaluate interpretively (~36 µs per 64-dim pair measured
  * here); the native expression runs inside whole-stage codegen (~100×).
  * Users can keep writing the declarative HOF form — SQL or Column API —
  * and the optimizer swaps in the fast path when the pattern and types
  * match exactly (array<double> inputs, fold from 0.0, multiply-zip,
  * add-fold), preserving sequential left-fold semantics bit-for-bit.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** The two operands are exactly the lambda's declared first/second
    * argument variables (either order — * and + are commutative on
    * doubles, bit-for-bit). Matching by exprId rejects shapes like
    * `(x, y) -> x * x` that reuse one variable, which are NOT dot
    * products.
    */
  private def isArgPair(p: Expression, q: Expression,
      args: Seq[NamedLambdaVariable]): Boolean = (p, q) match {
    case (pv: NamedLambdaVariable, qv: NamedLambdaVariable) if args.length == 2 =>
      (pv.exprId == args(0).exprId && qv.exprId == args(1).exprId) ||
        (pv.exprId == args(1).exprId && qv.exprId == args(0).exprId)
    case _ => false
  }

  /** Finish lambda is the identity `s -> s` (what a 3-argument
    * `aggregate(...)` desugars to). Anything else — e.g. an L2 norm's
    * `s -> sqrt(s)` — must keep its HOF form.
    */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(fv: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      fv.exprId == arg.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object HofDotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(CMultiply(x, y, _), zipArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(CAdd(acc, v, _), foldArgs, _),
            finish)
          if isArgPair(x, y, zipArgs.collect { case n: NamedLambdaVariable => n }) &&
            isArgPair(acc, v, foldArgs.collect { case n: NamedLambdaVariable => n }) &&
            isIdentityFinish(finish) &&
            isDoubleArray(a) && isDoubleArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDotProduct(a, b) => DotProduct(a, b)
    }
}

/** Session extensions registering the graft-native functions and the
  * optimizer rewrite. Install with
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  * after which `SELECT dot_product(a, b)` / `rolling_hash(text)` work in
  * SQL and HOF dot products are auto-accelerated.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    // Catalyst's internal bloom-filter pair (what Spark's own runtime
    // row-level filtering injects), surfaced as SQL-callable functions:
    // bloom_filter_agg(key[, est_items[, num_bits]]) builds the filter as
    // one binary value; might_contain(filter, key) is a codegen'd
    // predicate — no Scala-UDF serialization boundary in fact-table scans.
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(c)       => new BloomFilterAggregate(c)
        case Seq(c, n)    => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b, 0, 0)
        case _ => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1-3 arguments, got ${args.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1))))
    // The dedup-tier signature and similarity expressions, SQL-callable
    // so the temp-view SQL interface spans the whole custom tier (all
    // codegen'd or eval-tight; no Scala-UDF boundary).
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (args: Seq[Expression]) => SimHashSig(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("hashed_sorted_grams"),
      new ExpressionInfo(classOf[HashedSortedGrams].getName, "hashed_sorted_grams"),
      (args: Seq[Expression]) => HashedSortedGrams(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (args: Seq[Expression]) => JaccardSim(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedLongJaccard].getName, "sorted_jaccard"),
      (args: Seq[Expression]) => SortedLongJaccard(args(0), args(1))))
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

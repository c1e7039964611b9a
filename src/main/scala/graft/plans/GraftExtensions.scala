package graft.plans

import graft.functions.{BandKeys64, BigramSet, BitmaskIntersectCount, DotProduct, MaskFromIndices, MinHashSignature64, ShingleHashes, ShingleStrings, SimHash64, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions into every session built with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Unlike `NativeExpressions.register` (imperative, per-session temp
  * functions), injection binds the functions at session construction, so
  * they exist in `spark.newSession()` children and in pure-SQL contexts too.
  * No custom Rule/Strategy is injected — SURVEY.md §4: stock Catalyst plans
  * every operator here; the extension surface carries expressions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_isect"),
      info("graft_isect", classOf[SortedIntersectCount]),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_mask_isect"),
      info("graft_mask_isect", classOf[BitmaskIntersectCount]),
      (args: Seq[Expression]) => BitmaskIntersectCount(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_mask"),
      info("graft_mask", classOf[MaskFromIndices]),
      (args: Seq[Expression]) =>
        MaskFromIndices(args(0), args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[MinHashSignature64]),
      (args: Seq[Expression]) =>
        MinHashSignature64(args(0), args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_bigrams"),
      info("graft_bigrams", classOf[BigramSet]),
      (args: Seq[Expression]) => BigramSet(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", classOf[ShingleHashes]),
      (args: Seq[Expression]) =>
        ShingleHashes(args(0), args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_shingle_strings"),
      info("graft_shingle_strings", classOf[ShingleStrings]),
      (args: Seq[Expression]) =>
        ShingleStrings(args(0), args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("graft_bands"),
      info("graft_bands", classOf[BandKeys64]),
      (args: Seq[Expression]) =>
        BandKeys64(args(0), args(1).eval().asInstanceOf[Int])))
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{BenchMaxCos, GopherCounts, IvfAssign, LangHits, PqAssign, QualityFeatures, VecDot, WordShingles}

/** Engine extension point — register custom Catalyst expressions.
  * Activate with `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`); every operator that can use
  * a native expression probes the function registry and falls back to
  * built-in compositions when the extension is absent, so library code
  * works on vanilla sessions too. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("quality_features"),
      new ExpressionInfo(classOf[QualityFeatures].getName, "quality_features"),
      (children: Seq[Expression]) => QualityFeatures(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("lang_hits"),
      new ExpressionInfo(classOf[LangHits].getName, "lang_hits"),
      (children: Seq[Expression]) => LangHits(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("gopher_counts"),
      new ExpressionInfo(classOf[GopherCounts].getName, "gopher_counts"),
      (children: Seq[Expression]) => GopherCounts(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bench_max_cos"),
      new ExpressionInfo(classOf[BenchMaxCos].getName, "bench_max_cos"),
      (children: Seq[Expression]) =>
        BenchMaxCos(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getName, "pq_assign"),
      (children: Seq[Expression]) =>
        PqAssign(children.head, children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("ivf_assign"),
      new ExpressionInfo(classOf[IvfAssign].getName, "ivf_assign"),
      (children: Seq[Expression]) =>
        IvfAssign(children.head, children(1), children(2))))
  }
}

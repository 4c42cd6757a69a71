package graft.engine.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: a deployment opts in with
  *   spark.sql.extensions=graft.engine.expr.GraftExtensions
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * and every graft native expression resolves by name in SQL and
  * `expr(...)`. Sessions that can't set extensions call
  * [[GraftFunctions.ensureRegistered]] instead — same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val infoClass: Map[String, String] = Map(
    "graft_cosine" -> classOf[CosineSimilarity].getName,
    "graft_intersect_count" -> classOf[IntersectCount].getName,
    "graft_kmv" -> classOf[KmvSketch].getName)

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(infoClass(name), name),
        builder))
    }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration for the engine's native
  * expressions — makes `vec_dot` / `vec_cosine` usable from
  * `spark.sql(...)` strings, not just the Column API.
  *
  * Wire via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * (done in [[graft.Engine]]) or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "vec_dot(a, b) takes two array arguments")
          DotProduct(children.head, children(1))
        }
      )
    )
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt}

/** SQL registration for the engine's codegen vector expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API
  * (§2.11: FunctionRegistry route).
  *
  * Two entry points:
  *  - [[register]] mutates an existing session's registry (tests, REPLs);
  *  - [[GraftExtensions]] is a `spark.sql.extensions`-loadable injector
  *    (`.config("spark.sql.extensions", "graft.functions.GraftExtensions")`)
  *    — the supported hook for cluster deployments.
  */
object GraftFunctions {

  private def magnitude(v: Expression): Expression = Sqrt(DotProductFloat(v, v))

  private[functions] def fns: Seq[(String, Seq[Expression] => Expression)] = vecFns ++
    PipelineSqlFunctions.fns // text/dedup/sampling pipeline kernels (§2.12)

  private def vecFns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (args => DotProductFloat(args(0), args(1))),
    "hamming_dist" -> (args => HammingDistPacked(args(0), args(1))),
    "pack_sign_bits" -> (args => PackSignBits(args(0))),
    "simhash64" -> (args => SimHash64(args(0))),
    "nfc_normalize" -> (args => NfcNormalize(args(0))),
    // composites built as raw Catalyst trees (the Column->Expression
    // bridge leaves unresolved nodes behind when used inside a registry
    // builder); epsilon matches VectorFunctions.CosineEps so SQL and
    // Column callers cannot diverge
    "vec_magnitude" -> (args => magnitude(args(0))),
    "vec_cosine" -> (args => Divide(
      DotProductFloat(args(0), args(1)),
      Add(Multiply(magnitude(args(0)), magnitude(args(1))),
        Literal(VectorFunctions.CosineEps)))))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
      builder)
  }
}

/** `spark.sql.extensions` injector (must be a class with a no-arg ctor) —
  * same function table as [[GraftFunctions.register]], one source of truth. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions._

/** SparkSessionExtensions installer: registers the library's native
  * expressions in the SQL FunctionRegistry, so the same codegen'd
  * operators are callable from `spark.sql` text as from the Column
  * API — one implementation, two surfaces.
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Functions: `vec_dot(a, b)`, `vec_norm(a)`,
  * `vec_lsh_bucket(a, planes)`, `text_rolling_hash(s)`,
  * `seeded_mix_hash(seed, s)` — the integer arguments must be literals
  * (they parameterize codegen, exactly like `approx_percentile`'s
  * accuracy).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-order float dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - sequential-order L2 norm"),
      (args: Seq[Expression]) => L2Norm(args(0))))
    ext.injectFunction((FunctionIdentifier("vec_lsh_bucket"),
      info("vec_lsh_bucket",
        "vec_lsh_bucket(a, planes) - random-hyperplane sign bucket"),
      (args: Seq[Expression]) =>
        LshBucket(args(0), intLit(args(1), "planes"))))
    ext.injectFunction((FunctionIdentifier("text_rolling_hash"),
      info("text_rolling_hash",
        "text_rolling_hash(s) - 64-bit poly-31 rolling hash"),
      (args: Seq[Expression]) => RollingHash(args(0))))
    ext.injectFunction((FunctionIdentifier("seeded_mix_hash"),
      info("seeded_mix_hash",
        "seeded_mix_hash(seed, s) - seeded poly-31 + fmix64 hash"),
      (args: Seq[Expression]) =>
        SeededMixHash(intLit(args(0), "seed"), args(1))))
  }
}

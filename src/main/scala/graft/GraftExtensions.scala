package graft

import org.apache.spark.sql.{GraftSql, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.expr.{TextShingles, TextTokens, VecDot, VecL2Sq}

/** SQL surface for graft's native kernels (SURVEY.md §2.11): registered
  * either at session build time via
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or into a live
  * session with [[GraftExtensions.register]]. Afterwards plain Spark SQL
  * can call them:
  *
  * {{{
  *   SELECT vec_l2sq(a.vec, b.vec)          -- codegen'd distance fold
  *   SELECT text_tokens(text)               -- [a-z0-9]+ run tokens
  *   SELECT text_shingles(text, 3)          -- distinct word 3-grams
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction(GraftSql.functionDescription(name, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_l2sq" -> (args => VecL2Sq(args(0), args(1))),
    "vec_dot" -> (args => VecDot(args(0), args(1))),
    "text_tokens" -> (args => TextTokens(args.head)),
    "text_shingles" -> (args =>
      TextShingles(args(0), intLit(args(1), "text_shingles n"))))

  /** Register the kernel functions into an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      GraftSql.registerFunction(spark, name, builder)
    }
}

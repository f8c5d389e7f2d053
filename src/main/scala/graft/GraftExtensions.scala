package graft

import graft.functions.Nonce
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: installs the engine's custom
  * functions at session build time (instead of per-session runtime
  * registration), so SQL users get them on any session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * Kept deliberately small: per SURVEY.md §4 no custom optimizer Rule or
  * SparkStrategy is justified — every operator has an efficient plan with
  * vanilla Catalyst (the one candidate, a range-join strategy for O-J4, is
  * avoided by the union+window as-of implementation).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("nonce"),
      new ExpressionInfo(classOf[Nonce].getName, "nonce"),
      (exprs: Seq[Expression]) =>
        Nonce(exprs.headOption.collect {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
        }.getOrElse(42L))))
  }
}

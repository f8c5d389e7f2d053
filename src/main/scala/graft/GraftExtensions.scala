package graft

import graft.functions.{DotProduct, MinHashSig, Nonce, SignBandCodes, SimHashSig}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: installs the engine's custom
  * functions at session build time (instead of per-session runtime
  * registration), so SQL users get the FULL graft function surface on any
  * session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * The operators themselves self-register what they need (idempotently),
  * so this path is for SQL-first users; both routes resolve to the same
  * codegen'd Expressions. Kept deliberately free of optimizer Rules and
  * SparkStrategies: per SURVEY.md §4 every operator has an efficient plan
  * with vanilla Catalyst (the one candidate, a range-join strategy for
  * O-J4, is avoided by the union+window as-of implementation).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(cls: Class[_], name: String) = new ExpressionInfo(cls.getName, name)

  private def checkArity(exprs: Seq[Expression], n: Int, sig: String): Unit =
    graft.functions.Arity.check(exprs, n, sig)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("nonce"),
      info(classOf[Nonce], "nonce"),
      (exprs: Seq[Expression]) => {
        if (exprs.length > 1)
          throw new IllegalArgumentException(
            s"wrong argument count: expected nonce([seed]), got ${exprs.length} arguments")
        Nonce(exprs.headOption.collect {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
        }.getOrElse(42L))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot"),
      (exprs: Seq[Expression]) => {
        checkArity(exprs, 2, "graft_dot(a, b)")
        DotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_band_codes"),
      info(classOf[SignBandCodes], "graft_band_codes"),
      (exprs: Seq[Expression]) => {
        checkArity(exprs, 3, "graft_band_codes(vec, planes, bits)")
        SignBandCodes(exprs(0), exprs(1), exprs(2))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info(classOf[SimHashSig], "graft_simhash"),
      (exprs: Seq[Expression]) => {
        checkArity(exprs, 1, "graft_simhash(sh)")
        SimHashSig(exprs(0))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info(classOf[MinHashSig], "graft_minhash"),
      (exprs: Seq[Expression]) => {
        checkArity(exprs, 2, "graft_minhash(sh, n)")
        val n = exprs(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_minhash(sh, n): n must be an integer literal, got $other")
        }
        require(n >= 1 && n <= 1024, s"graft_minhash: n=$n out of [1, 1024]")
        MinHashSig(exprs(0), n)
      }))
  }
}

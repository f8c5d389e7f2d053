package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared SQL-facing arity guard for the injected/registered function
  * builders: a builder that indexes exprs(i) on a wrong-arity call would
  * surface as IndexOutOfBoundsException deep in analysis — fail instead
  * with the expected signature in the message.
  */
private[graft] object Arity {
  def check(exprs: Seq[Expression], n: Int, sig: String): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"wrong argument count: expected $sig, got ${exprs.length} argument(s)")
}

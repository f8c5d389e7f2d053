package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Literal, Nondeterministic}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd nondeterministic nonce expression (O-X9): 5 chars from [A-Z0-9],
  * the semantics of the reference's get_nonce
  * (v2022/etl-containers/aggregates/src/helper_functions.py:25-36) — used
  * there to de-collide S3 object keys. Spark's task-file naming already
  * avoids collisions, so this survives as the UDF-surface exercise: a native
  * leaf Expression with doGenCode, partition-seeded like rand().
  */
case class Nonce(seed: Long) extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def stateful: Boolean = true

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed + partitionIndex)

  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    UTF8String.fromString(Nonce.make(rng))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rngRef = ctx.addMutableState("java.util.Random", "nonceRng")
    ctx.addPartitionInitializationStatement(
      s"$rngRef = new java.util.Random(${seed}L + partitionIndex);")
    ev.copy(
      code = code"""
        UTF8String ${ev.value} = UTF8String.fromString(
          graft.functions.Nonce.make($rngRef));""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = this
}

object Nonce {
  final val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  /** Shared by interpreted + generated code paths. */
  def make(rng: java.util.Random): String = {
    val sb = new java.lang.StringBuilder(5)
    var i = 0
    while (i < 5) { sb.append(Alphabet.charAt(rng.nextInt(36))); i += 1 }
    sb.toString
  }

  /** Register as SQL function `nonce([seed])`; use via expr("nonce(42)"). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nonce",
      exprs => Nonce(exprs.headOption.collect {
        case Literal(v: Long, _) => v
        case Literal(v: Int, _) => v.toLong
      }.getOrElse(42L)),
      "scala_udf")
}

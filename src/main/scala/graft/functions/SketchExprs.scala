package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature sketch expressions over a shingle array — one codegen'd
  * pass per document instead of explode + 64-way aggregate:
  *
  * The explode/agg formulation shuffles one 64-column row per (doc,
  * partition) through a hash aggregate; these expressions fold the whole
  * signature in a tight loop over the document's own shingle array, making
  * the signature stage map-only (zero shuffle) — at 100 TB the difference
  * between re-partitioning the corpus and streaming it.
  *
  * Hashing uses Spark's own XXH64 primitive over the shingle's UTF-8 bytes
  * with the hash index as seed, so signatures are deterministic and
  * engine-portable to any XXH64 implementation.
  */
object SketchExprs {

  @inline def hashShingle(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** minhash_i(doc) = min over shingles of xxh64(shingle, seed = i), for
  * i in [0, numHashes); returns array<long> of length numHashes.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      // null shingles are skipped, matching the null-tolerant xxhash64
      // aggregate formulation these expressions replaced
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var h = 0
        while (h < numHashes) {
          val hv = SketchExprs.hashShingle(s, h.toLong)
          if (hv < sig(h)) sig(h) = hv
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val hv = ctx.freshName("hv")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if ($v.isNullAt($i)) continue;
         |  UTF8String $s = $v.getUTF8String($i);
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $hv = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |                       $s.numBytes(), (long) $h);
         |    if ($hv < $sig[$h]) $sig[$h] = $hv;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash: per shingle hash (seed 0), each bit votes ±1; the
  * signature sets the bits with a positive count.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SketchExprs.hashShingle(arr.getUTF8String(i), 0L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if ($v.isNullAt($i)) continue;
         |  UTF8String $s = $v.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |                     $s.numBytes(), 0L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchFunctions {
  /** Register graft_minhash(sh, n) / graft_simhash(sh); idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash")
    if (!registry.functionExists(id)) {
      registry.createOrReplaceTempFunction("graft_simhash",
        exprs => SimHashSig(exprs(0)), "scala_udf")
      registry.createOrReplaceTempFunction("graft_minhash",
        exprs => {
          // fail at analysis with a pointed message, not a cast error (and
          // never let NULL collapse to numHashes = 0 silently)
          val n = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"graft_minhash(sh, n): n must be an integer literal, got $other")
          }
          require(n >= 1 && n <= 1024, s"graft_minhash: n=$n out of [1, 1024]")
          MinHashSig(exprs(0), n)
        }, "scala_udf")
    }
  }
}

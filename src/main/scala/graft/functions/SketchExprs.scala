package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable-arithmetic string hashing shared by the sketch expressions AND
  * their DuckDB oracle SQL (the `lshPlanesArith` trick applied to strings):
  * every value stays inside plain BIGINT arithmetic that any engine
  * evaluates identically, so MinHash/SimHash signatures — and therefore LSH
  * buckets and the final near-dup pairs — are oracle-recomputable end to
  * end. xxhash64 was abandoned here precisely because DuckDB cannot
  * recompute it.
  *
  * Construction (p = 2^31 - 1, the Mersenne prime):
  * - base(s)   = fold of h -> (h * 31 + codepoint) mod p over the string's
  *   Unicode code points, seeded with 17. Products are bounded by
  *   p * 31 + cp < 2^36 — no 64-bit overflow, so `%` in SQL (which errors
  *   on BIGINT overflow in DuckDB rather than wrapping) is exact.
  * - mix(b, i) = (a_i * b + b_i) mod p with a_i = ((i+1) * 2654435761) mod p
  *   (Knuth's multiplicative constant; nonzero for all i < p - 1) and
  *   b_i = ((i+1) * 40503) mod p — the classic universal-hash family.
  *   a_i * b < p^2 < 2^62: overflow-free in signed 64-bit.
  *
  * Code-point iteration matches DuckDB's
  * `list_transform(string_split(s, ''), ch -> unicode(ch))` for all BMP
  * text (the corpus tokenizer lowercases and splits on whitespace, so
  * shingle strings carry no combining sequences in practice).
  */
object PortableHash {
  val P: Long = 2147483647L

  /** Seed-17 fold of (h * 31 + codePoint) mod P over the string. */
  def base(s: UTF8String): Long = {
    val str = s.toString
    var h = 17L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** i-th universal-family hash of a base value; in [0, P). */
  def mix(b: Long, i: Int): Long = {
    val a = ((i + 1).toLong * 2654435761L) % P
    val c = ((i + 1).toLong * 40503L) % P
    (a * b + c) % P
  }
}

/** minhash_i(doc) = min over shingles of mix(base(shingle), i), for
  * i in [0, numHashes); returns array<long> of length numHashes. The base
  * hash is computed once per shingle; the 64 mixes are two multiplies each.
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
      // null shingles are skipped, matching the null-tolerant aggregate
      // formulation these expressions replaced
      if (!arr.isNullAt(i)) {
        val b = PortableHash.base(arr.getUTF8String(i))
        var h = 0
        while (h < numHashes) {
          val hv = PortableHash.mix(b, h)
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
      val b = ctx.freshName("b")
      val hv = ctx.freshName("hv")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if ($v.isNullAt($i)) continue;
         |  long $b = graft.functions.PortableHash.base($v.getUTF8String($i));
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $hv = graft.functions.PortableHash.mix($b, $h);
         |    if ($hv < $sig[$h]) $sig[$h] = $hv;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash: bit j of the signature is set when the parity votes
  * sum(mix(base(shingle), j) mod 2 == 1 ? +1 : -1) over the document's
  * shingles come out positive. Using the parity of 64 universal-family
  * hashes (rather than the 64 bits of one hash) keeps every bit an
  * independent portable-arithmetic value the oracle recomputes exactly.
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
        val b = PortableHash.base(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if ((PortableHash.mix(b, j) & 1L) == 1L) counts(j) += 1
          else counts(j) -= 1
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
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if ($v.isNullAt($i)) continue;
         |  long $b = graft.functions.PortableHash.base($v.getUTF8String($i));
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((graft.functions.PortableHash.mix($b, $j) & 1L) == 1L) {
         |      $counts[$j]++;
         |    } else {
         |      $counts[$j]--;
         |    }
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
        exprs => {
          Arity.check(exprs, 1, "graft_simhash(sh)")
          SimHashSig(exprs(0))
        }, "scala_udf")
      registry.createOrReplaceTempFunction("graft_minhash",
        exprs => {
          Arity.check(exprs, 2, "graft_minhash(sh, n)")
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

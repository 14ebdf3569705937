package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared JVM kernel for the minhash signature: lowercase → whitespace
  * tokens → k-token shingles → xxhash64(seed 42, identical to the
  * `xxhash64` SQL function via Spark's XXH64) → 64 (a·h+b) mod P
  * minima in one tight loop.
  *
  * Exists because the declarative formulation (transform/aggregate
  * higher-order functions) is evaluated interpreted — 64 boxed array
  * traversals per document. This kernel is one pass, no boxing, and the
  * hash family is bit-identical to graft.text.Dedup.signatureCol.
  */
object MinHashKernel {
  val P: Long = 2147483647L // 2^31-1, matches Dedup.P
  val NumHashes = 64
  val ShingleK = 3

  /** (a, b) pairs — MUST stay in sync with Dedup.perms (same LCG). */
  val perms: Array[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 33 }
    Array.fill(NumHashes)((next() % (P - 1) + 1, next() % P))
  }
  private val as: Array[Long] = perms.map(_._1)
  private val bs: Array[Long] = perms.map(_._2)

  private def hashShingle(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
  }

  /** Mirrors Dedup.shinglesCol: tokens = lower.trim split " +";
    * docs shorter than k collapse to one whole-text shingle.
    * Lower/trim delegate to UTF8String's own methods so the
    * tokenization is bit-identical to the Column spelling on every
    * JVM (String.toLowerCase is locale-sensitive — tr-TR maps ASCII
    * 'I' to dotless 'ı' where Spark's ASCII fast path yields 'i' —
    * and String.trim strips all ≤ 0x20 where Spark trims spaces
    * only). */
  // shingle text built by a ShingleK-driven join (not a hardcoded
  // 3-token interpolation): the arrays above size by ShingleK, so a
  // constant change would have thrown (k=2: toks(i+2) OOB) or silently
  // built wrong-width shingles (k=4) while Dedup.shinglesCol moved
  private def shingleAt(toks: Array[String], i: Int): String = {
    val sb = new java.lang.StringBuilder(toks(i))
    var j = 1
    while (j < ShingleK) { sb.append(' ').append(toks(i + j)); j += 1 }
    sb.toString
  }

  def shingleHashes(text: UTF8String): Array[Long] = {
    val toks = text.trim.toLowerCase.toString.split(" +")
    if (toks.length >= ShingleK) {
      val out = new Array[Long](toks.length - ShingleK + 1)
      var i = 0
      while (i < out.length) {
        out(i) = hashShingle(shingleAt(toks, i))
        i += 1
      }
      out
    } else Array(hashShingle(toks.mkString(" ")))
  }

  /** The shingle STRINGS (for exact-Jaccard verify / inverted index) —
    * same tokenization as [[shingleHashes]]. */
  def shingles(text: UTF8String): ArrayData = {
    val toks = text.trim.toLowerCase.toString.split(" +")
    val out: Array[AnyRef] =
      if (toks.length >= ShingleK)
        Array.tabulate(toks.length - ShingleK + 1)(i =>
          UTF8String.fromString(shingleAt(toks, i)))
      else Array(UTF8String.fromString(toks.mkString(" ")))
    new GenericArrayData(out)
  }

  def signature(text: UTF8String): ArrayData = {
    val hs = shingleHashes(text)
    val sig = Array.fill(NumHashes)(P)
    var i = 0
    while (i < hs.length) {
      // pmod(xxhash64, P) — xxhash64 can be negative
      val m = hs(i) % P
      val h = if (m < 0) m + P else m
      var j = 0
      while (j < NumHashes) {
        val v = (as(j) * h + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Native minhash-signature expression: ARRAY<BIGINT>(64) per document,
  * evaluated by [[MinHashKernel]] in both interpreted and codegen paths
  * (codegen emits a single static call — the kernel IS the loop). */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.signature(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashKernel.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Native k-token shingle generator (ARRAY<STRING>), sharing
  * MinHashKernel's tokenization — the fast path for the inverted-index
  * and exact-Jaccard-verify operators. */
case class Shingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.shingles(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashKernel.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

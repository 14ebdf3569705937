package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared JVM kernel for the 64-bit SimHash fingerprint: lowercase →
  * whitespace tokens (the same tokenization as [[MinHashKernel]]) →
  * per-token 64-bit MurmurHash3 (two 32-bit string hashes packed) →
  * ±1 bit-sign accumulation → majority fingerprint, one tight loop.
  *
  * Replaces the library's last hot-path dedup UDF: the Scala UDF took
  * an ARRAY<STRING> column, paying an ArrayData→Seq conversion per row
  * and breaking the scan's codegen span; this kernel takes the raw
  * text column as one static call (the same (b)-tier shape as
  * [[MinHashKernel]]), bit-identical results (spec-pinned against the
  * UDF formulation).
  */
object SimHashKernel {
  def hash64(s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Fingerprint over an explicit token sequence — the public
    * algorithm (kept callable for specs and interop; every occurrence
    * contributes, NOT distinct tokens). */
  def simhashTokens(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = hash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** text → fingerprint in one pass (tokenization identical to
    * [[MinHashKernel.shingleHashes]]'s token step and to the Column
    * spelling `split(lower(trim(text)), " +")`). Lower/trim go through
    * UTF8String's OWN methods, not java.lang.String's: Spark's
    * `lower()` uses an ASCII fast path plus default-locale slow path
    * and `trim()` strips spaces only, while String.toLowerCase is
    * locale-sensitive even for ASCII (tr-TR maps 'I'→dotless 'ı') and
    * String.trim strips all ≤ 0x20 — delegating makes the kernel
    * bit-identical to the Column spelling on EVERY JVM by
    * construction, not just on corpora without the divergent cases. */
  def simhash(text: UTF8String): Long =
    simhashTokens(text.trim.toLowerCase.toString.split(" +").toSeq)
}

/** Native simhash64 expression: BIGINT fingerprint per document,
  * evaluated by [[SimHashKernel]] in both interpreted and codegen
  * paths (codegen emits a single static call — no locals, so two
  * instances can share a generated function). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHashKernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

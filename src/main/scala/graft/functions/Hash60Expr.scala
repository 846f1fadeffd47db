package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the portable 60-bit hash
  * `conv(substring(md5(x), 1, 15), 16, 10)`: the first 60 bits of the MD5
  * digest of the UTF-8 bytes, as a non-negative BIGINT.
  *
  * Identical value by construction — the first 15 hex characters of the
  * digest ARE its first 7.5 bytes, i.e. `(first-8-bytes-as-BE-long) >>> 4`
  * — but computed without materializing the 32-char hex string and parsing
  * it back through base-16 `conv`. This is the per-shingle/per-token inner
  * primitive of the whole dedup/sampling family (minhash shingles, simhash
  * tokens, decontamination grams, hash sampling), so the saved string
  * round-trip multiplies by corpus token count at scale. Bit parity with
  * the composed form is asserted in Hash60Spec and end-to-end by every
  * hash60-based oracle row.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == DataTypes.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 expects string/binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Hash60.first60(s.getBytes)
    case b: Array[Byte] => Hash60.first60(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Hash60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val bytes = if (child.dataType == StringType) ".getBytes()" else ""
    defineCodeGen(ctx, ev, c => s"$helper.first60($c$bytes)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long. */
  def first60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

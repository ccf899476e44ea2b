package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native codegen'd HLL register coordinate for one value: packs
  * `(bucket << 8) | rank` into a LONG, where bucket/rank follow EXACTLY
  * the portable md5-top-60-bit contract of [[graft.analytics.Hll]]:
  *
  *  - `h` = first 15 hex chars of `md5(bytes)` as a base-16 long
  *    (= big-endian digest bytes 0..7 `>>> 4`);
  *  - `bucket` = top `p` bits of `h`; `w` = the remaining `60-p` bits;
  *  - `rank` = `(60-p+1) - length(bin(w))`, i.e. the MSB position of `w`
  *    via `Long.numberOfLeadingZeros` — exact integer arithmetic, no
  *    strings, no libm.
  *
  * This is the §2.11 promotion of the register kernel: the composed
  * built-in spelling (`conv(substring(md5(..),1,15),16,10)` +
  * `length(bin(w))`) allocates a 32-char hex string, a substring, a
  * base-16 parse, and a binary string PER VALUE — measured ~2.5× slower
  * over a profile melt. The VALUE contract is bit-identical
  * (`HllRegisterSpec` cross-checks against the string spelling row by
  * row), so every DuckDB oracle keeps hashing with the md5 SQL mirror.
  *
  * Input is BINARY (callers cast, matching the old `md5(c.cast(binary))`
  * byte semantics for every input type); output rank fits in the low 8
  * bits for any p ≥ 0 (rank ≤ 61), so the pack is lossless.
  */
case class HllRegister(child: Expression, p: Int)
    extends UnaryExpression {

  private val wBits = 60 - p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_register expects binary input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HllRegister.pack(v.asInstanceOf[Array[Byte]], wBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"graft.functions.HllRegister.pack($b, $wBits)")

  override protected def withNewChildInternal(newChild: Expression): HllRegister =
    copy(child = newChild)
}

object HllRegister {

  // MessageDigest is not thread-safe; one per task thread, reset per value
  // (Spark's own Md5 expression pays a getInstance PER ROW via
  // commons-codec — this is strictly cheaper)
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `(bucket << 8) | rank` for one value's UTF-8/binary bytes. */
  def pack(bytes: Array[Byte], wBits: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h >>>= 4 // top 60 bits = first 15 hex chars of the digest
    val bucket = h >>> wBits
    val w = h & ((1L << wBits) - 1)
    val rank =
      if (w == 0L) wBits + 1
      else wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (bucket << 8) | rank.toLong
  }

  /** Column API over a binary column: packed `(bucket << 8) | rank`. */
  def hllRegister(c: Column, p: Int): Column =
    ColumnShim.column(HllRegister(ColumnShim.expression(c), p))
}

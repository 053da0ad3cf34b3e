package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HLL register derivation from md5 BYTES (the round-15 "Not yet
  * optimized" #1): the oracle-mode sketch paths derived (bucket, rho)
  * from the md5 HEX RENDERING — a 32-char string allocation plus
  * substring/conv/bin string arithmetic per hashed value. The digest's
  * bytes carry the same bits: bucket is byte 0, and rho is the leading
  * zero BIT count of bytes 1..15 plus one. This expression digests once
  * and returns both packed into one int, `(bucket << 7) | rho`
  * (rho ≤ 121 fits 7 bits) — zero string work, one fused codegen call.
  *
  * Bit-equivalence to the hex chain (pinned by `FunctionsSpec`
  * "hll packed bytes form == the hex-chain definition"):
  *   - `pack >> 7`  == `conv(substring(h, 1, 2), 16, 10)` — byte 0 IS
  *     the first two hex chars;
  *   - `pack & 127` == [[graft.operators.Sketches]]' limb rho: with the
  *     first set bit of the 120-bit remainder at position p (0-based),
  *     hi > 0 gives 61 − bitlen(hi) = p + 1 and hi == 0, lo > 0 gives
  *     121 − bitlen(lo) = p + 1; all-zero pins 121 = 120 + 1;
  *   - `lower(lpad(hex(pack >> 7), 2, '0'))` == `substring(h, 1, 2)` —
  *     the persisted-state hex spelling, rebuilt only where a state
  *     schema actually stores it.
  *
  * The "|hll" salt is baked in (every register derivation shares it), so
  * the child is the RAW stringified value, exactly what the old
  * `md5(concat(value, '|hll'))` projection consumed.
  */
object HashFunctions {

  private val hllSalt: Array[Byte] = "|hll".getBytes("UTF-8")

  private val tlMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** (bucket << 7) | rho of md5(v || "|hll") — see the object scaladoc. */
  def hllPack(v: UTF8String): Int = {
    val md = tlMd5.get()
    md.reset()
    md.update(v.getBytes)
    md.update(hllSalt)
    val d = md.digest()
    val bucket = d(0) & 0xff
    var rho = 121 // all-zero remainder (p ~ 2^-120) pins the max rank
    var i = 1
    while (i < 16) {
      val b = d(i) & 0xff
      if (b != 0) {
        rho = (i - 1) * 8 + (Integer.numberOfLeadingZeros(b) - 24) + 1
        i = 16
      } else i += 1
    }
    (bucket << 7) | rho
  }

  /** Column form over any value (stringified exactly like the old
    * `md5(concat(value.cast("string"), "|hll"))` projection; NULL in,
    * NULL out — the null-bucket group rides through unchanged). */
  def hllPackCol(value: Column): Column =
    Bridge.column(HllPack(Bridge.expression(value.cast("string"))))

  /** Raw 16-byte md5 digest — bit-identical to `unhex(md5(v))`, minus
    * the 32-char hex rendering and its re-parse. The gram-hash join
    * keys (contamination family, dup_gram_fraction, exact-dedup
    * fingerprints) pay this per gram/document occurrence. */
  def md5Bin(v: UTF8String): Array[Byte] = {
    val md = tlMd5.get()
    md.reset()
    md.update(v.getBytes)
    md.digest()
  }

  def md5BinCol(value: Column): Column =
    Bridge.column(Md5Bin(Bridge.expression(value.cast("string"))))

  /** First digest byte as 0..255 — bit-equivalent to
    * `conv(substring(md5(v), 1, 2), 16, 10)` (and partitions values
    * exactly like `substring(md5(v), 1, 2)`): the DSIR hashed-feature
    * bucket, paid per token occurrence. */
  def md5Byte0(v: UTF8String): Int = {
    val md = tlMd5.get()
    md.reset()
    md.update(v.getBytes)
    md.digest()(0) & 0xff
  }

  def md5Byte0Col(value: Column): Column =
    Bridge.column(Md5Byte0(Bridge.expression(value.cast("string"))))
}

/** Input-type contract for the md5-digest expressions: the eval/codegen
  * bodies consume UTF8String, so a non-string child must fail at ANALYSIS
  * time, not as a runtime ClassCastException (the `*Col` helpers always
  * cast, but the case classes are constructible directly — round-15
  * advice, low). No ExpectsInputTypes: Spark 4 keeps AbstractDataType
  * `private[sql]` (the [[DotProduct]] note). */
private[functions] trait StringInputCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")
}

case class HllPack(child: Expression) extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_hll_pack"

  override def nullSafeEval(a: Any): Any =
    HashFunctions.hllPack(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.hllPack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Md5Bin(child: Expression) extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_md5_bin"

  override def nullSafeEval(a: Any): Any =
    HashFunctions.md5Bin(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.md5Bin($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Md5Byte0(child: Expression) extends UnaryExpression with StringInputCheck {

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_md5_byte0"

  override def nullSafeEval(a: Any): Any =
    HashFunctions.md5Byte0(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.md5Byte0($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

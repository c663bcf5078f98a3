package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * RFC 4122 name-based UUID (version 5, SHA-1) in the DNS namespace —
 * the deterministic point identity the reference assigns to every snippet:
 * `uuid.uuid5(uuid.NAMESPACE_DNS, str(func_id))` (`/root/reference/bcb_utils.py:54`)
 * and `uuid.uuid5(uuid.NAMESPACE_DNS, clone_type+code_name)`
 * (`/root/reference/poj_utils.py:62`).
 *
 * The JVM only ships v3 (MD5) via `UUID.nameUUIDFromBytes`, so v5 is
 * implemented directly: SHA-1(namespace_bytes ++ utf8(name)), then the
 * version nibble is forced to 5 and the variant bits to RFC 4122.
 */
object Uuid5Ops {
  private val NamespaceDns: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  def uuid5(name: UTF8String): UTF8String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(NamespaceDns)
    md.update(name.getBytes)
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      val v = h(i) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16))
      sb.append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** uuid5(name): string -> canonical lower-case UUID string. Deterministic. */
case class Uuid5(child: Expression) extends UnaryExpression {
  override def prettyName: String = "uuid5"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uuid5 expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Uuid5Ops.uuid5(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Uuid5Ops.uuid5($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

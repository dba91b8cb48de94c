package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility signal (SURVEY §2 L70): `deflate_len(text)` — the
  * DEFLATE-compressed byte length of a string, evaluated inside
  * whole-stage codegen. `deflate_len(t) / octet_length(t)` is the
  * compression-ratio quality filter of the Gopher/C4 lineage: highly
  * repetitive machine-generated text compresses far below the ~0.4–0.7
  * band natural language occupies, and boilerplate/spam sits at the
  * extremes. A pure function of the bytes (zlib level 6, raw stream),
  * so it is deterministic, partitioning-invariant, and needs no state.
  */
object Compress {

  // one native zlib state per executor thread, reset() between rows —
  // allocating/ending a Deflater per row would dominate short strings
  // and churn native memory in the codegen hot loop
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue() = new java.util.zip.Deflater(6, true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](8192)
  }

  /** Deflated size of `bytes` at level 6 (raw, no zlib header). */
  def deflatedLen(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }

  def deflatedLenUtf8(s: UTF8String): Long = deflatedLen(s.getBytes)
}

/** `deflate_len(str)` — registered via [[graft.GraftExtensions]]. */
case class DeflatedLenExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len needs string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(v: Any): Any =
    Compress.deflatedLenUtf8(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflatedLenUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflatedLenExpr =
    copy(child = newChild)
}

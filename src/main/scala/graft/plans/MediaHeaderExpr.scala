package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real (non-stub) media-container header parsing from a binary column:
  * format detection by magic bytes plus the dimensional metadata each
  * container carries in its fixed header — no codec library needed, just
  * the published container layouts:
  *
  *  - PNG  (\x89PNG\r\n\x1a\n): IHDR width/height, big-endian u32 at 16/20
  *  - GIF  (GIF87a/GIF89a): logical screen w/h, little-endian u16 at 6/8
  *  - BMP  (BM): BITMAPINFOHEADER w/h, little-endian i32 at 18/22
  *  - JPEG (\xff\xd8): scan segments for SOF0/1/2 → height/width u16 BE
  *  - WAV  (RIFF….WAVE): fmt chunk channels u16 LE at 22, sample rate
  *    u32 LE at 24 (surfaced as width=sample_rate, height=channels)
  *
  * Returns `struct<format string, width int, height int>`; unknown or
  * truncated payloads yield ("unknown", -1, -1). A pure projection — the
  * 100 TB shape is scan → header-parse → filter/partition by format,
  * with full decode deferred to [[graft.functions.Multimodal]] codecs.
  */
case class MediaHeaderExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = MediaHeaderExpr.Schema
  override def nullIntolerant: Boolean = true

  // fail at ANALYSIS, not with an executor ClassCastException mid-job —
  // same contract as DotF/BottomKLongs
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_media_header requires a BINARY column, got ${other.sql}")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("mediaheader", this, classOf[MediaHeaderExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(b: Array[Byte]): InternalRow =
    nullSafeEval(b).asInstanceOf[InternalRow]

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def beU32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3))
  private def beU16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))

  private def result(fmt: String, w: Long, h: Long): InternalRow =
    InternalRow(UTF8String.fromString(fmt), w.toInt, h.toInt)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      result("png", beU32(b, 16), beU32(b, 20))
    else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      result("gif", leU16(b, 6), leU16(b, 8))
    else if (n >= 26 && b(0) == 'B' && b(1) == 'M')
      result("bmp", leU32(b, 18), leU32(b, 22))
    else if (n >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      // walk JPEG segments: 0xff <marker> <len u16 BE> …; SOF0/1/2 carry
      // precision u8, height u16, width u16
      var i = 2
      var out: InternalRow = null
      while (out == null && i + 3 < n) {
        if (u8(b, i) != 0xff) i += 1
        else {
          val marker = u8(b, i + 1)
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
            if (i + 9 <= n) out = result("jpeg", beU16(b, i + 7), beU16(b, i + 5))
            else i = n
          } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else if (i + 3 < n) i += 2 + beU16(b, i + 2)
          else i = n
        }
      }
      if (out != null) out else result("jpeg", -1, -1)
    } else if (n >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      result("wav", leU32(b, 24), leU16(b, 22))
    else result("unknown", -1, -1)
  }

  override protected def withNewChildInternal(c: Expression): MediaHeaderExpr =
    copy(child = c)
  override def prettyName: String = "graft_media_header"
}

object MediaHeaderExpr {
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  def mediaHeader(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      MediaHeaderExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Header-magic media-kind sniff as a codegen'd expression — the
  * ROUTING tier of the dispatch story: [[graft.ops.Multimodal.sniffMedia]]
  * is the per-partition DECODE tier (it actually parses the matched
  * container); this expression answers only "which decoder would run"
  * from the first bytes, so a SQL user can split a mixed binary column
  * by kind (`GROUP BY graft_sniff_kind(payload)`, partition a lake by
  * it, route to modality-specific passes) without ever leaving
  * whole-stage codegen.
  *
  * Magic set (all public container signatures):
  *   - `audio`: RIFF....WAVE
  *   - `video`: ISO-BMFF `ftyp` at offset 4
  *   - `image`: BMP `BM`, PNG \x89PNG\r\n\x1a\n, JPEG \xFF\xD8\xFF,
  *     GIF87a/GIF89a, TIFF `II*\0` / `MM\0*`
  *   - anything else: `unknown`; null payload: null.
  *
  * Agreement contract with the decode tier, spec-pinned: on every
  * container this library WRITES (wavBytes, bmpBytes, ImageIO PNG,
  * spec-conformant MP4) the two tiers name the same kind; the decode
  * tier can additionally demote a magic-matched-but-unparseable image
  * to `unknown` (it tried the full reader), which is exactly the
  * difference between routing and decoding.
  */
case class SniffKind(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    SniffKind.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SniffKind.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): SniffKind =
    copy(child = newChild)
}

object SniffKind {
  private val Audio = UTF8String.fromString("audio")
  private val Video = UTF8String.fromString("video")
  private val Image = UTF8String.fromString("image")
  private val Unknown = UTF8String.fromString("unknown")

  /** Static kernel shared by eval and generated code. */
  def compute(b: Array[Byte]): UTF8String = {
    def at(o: Int, s: String): Boolean = {
      if (o + s.length > b.length) return false
      var i = 0
      while (i < s.length) {
        if (b(o + i) != s.charAt(i).toByte) return false
        i += 1
      }
      true
    }
    val n = b.length
    if (n >= 12 && at(0, "RIFF") && at(8, "WAVE")) Audio
    else if (n >= 12 && at(4, "ftyp")) Video
    else if (n >= 2 && at(0, "BM")) Image
    else if (n >= 8 && (b(0) & 0xff) == 0x89 && at(1, "PNG") &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) Image
    else if (n >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) Image
    else if (at(0, "GIF87a") || at(0, "GIF89a")) Image
    else if (n >= 4 && ((at(0, "II") && b(2) == 42 && b(3) == 0) ||
      (at(0, "MM") && b(2) == 0 && b(3) == 42))) Image
    else Unknown
  }

  /** Column-level entry point. */
  def apply(bin: Column): Column =
    GraftSqlShim.column(SniffKind(GraftSqlShim.expression(bin)))
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Payload codecs (reference: zlib-compressed GridFS/S3 blobs,
  * `stores/gridfs.py:265-266`, `stores/aws.py:413-419`; gzip JSONL,
  * `open_data.py:643`).
  *
  * `CodegenFallback` is deliberate: the cost is the codec itself, not
  * expression dispatch — a generated-code wrapper around Deflater would
  * buy nothing. Null-safe unary expressions over `BinaryType`.
  */
abstract class BinaryCodec extends UnaryExpression with CodegenFallback
    with Serializable {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${child.dataType.simpleString}")
}

case class ZlibDeflate(child: Expression) extends BinaryCodec {
  override def prettyName: String = "zlib_deflate"
  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[Array[Byte]]
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(32, in.length / 2))
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ZlibInflate(child: Expression) extends BinaryCodec {
  override def prettyName: String = "zlib_inflate"
  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[Array[Byte]]
    val i = new java.util.zip.Inflater()
    i.setInput(in)
    val out = new java.io.ByteArrayOutputStream(math.max(32, in.length * 2))
    val buf = new Array[Byte](4096)
    while (!i.finished()) {
      val n = i.inflate(buf)
      if (n == 0 && !i.finished() && (i.needsInput() || i.needsDictionary()))
        throw new java.util.zip.DataFormatException(
          if (i.needsDictionary()) "zlib stream requires a preset dictionary"
          else "truncated zlib input")
      out.write(buf, 0, n)
    }
    i.end()
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class GzipCompress(child: Expression) extends BinaryCodec {
  override def prettyName: String = "gzip_compress"
  override def nullSafeEval(v: Any): Any = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(v.asInstanceOf[Array[Byte]]); gz.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class GzipDecompress(child: Expression) extends BinaryCodec {
  override def prettyName: String = "gzip_decompress"
  override def nullSafeEval(v: Any): Any = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

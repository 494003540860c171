package graft.functions

import java.io.ByteArrayOutputStream

import com.github.luben.zstd.Zstd
import net.jpountz.lz4.{LZ4FrameInputStream, LZ4FrameOutputStream}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Payload compression (SURVEY §2 S8): the reference compresses the
  * envelope payload with LZ4F or Zstd before publishing
  * (borealis-indexer/src/main.rs:366-375 payload_compress_lz4/zstd;
  * decompress at borealis-consumer/src/main.rs:270-271). Spark's
  * classpath already ships lz4-java and zstd-jni (its shuffle codecs),
  * so the same wire formats are reproduced exactly: LZ4 Frame and the
  * Zstd frame format (self-describing, so decompression needs no
  * out-of-band length).
  */
object Compression {
  def lz4Compress(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new LZ4FrameOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  def lz4Decompress(data: Array[Byte]): Array[Byte] = {
    val in = new LZ4FrameInputStream(new java.io.ByteArrayInputStream(data))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  def zstdCompress(data: Array[Byte]): Array[Byte] = Zstd.compress(data, 3)

  def zstdDecompress(data: Array[Byte]): Array[Byte] = {
    val size = Zstd.getFrameContentSize(data)
    require(size >= 0 && size <= Int.MaxValue, s"bad zstd frame size $size")
    Zstd.decompress(data, size.toInt)
  }
}

abstract class BinaryCodecExpression extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
}

case class Lz4Compress(child: Expression) extends BinaryCodecExpression {
  override def nullSafeEval(v: Any): Any = Compression.lz4Compress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Lz4Compress = copy(c)
  override def prettyName: String = "lz4_compress"
}

case class Lz4Decompress(child: Expression) extends BinaryCodecExpression {
  override def nullSafeEval(v: Any): Any = Compression.lz4Decompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Lz4Decompress = copy(c)
  override def prettyName: String = "lz4_decompress"
}

case class ZstdCompress(child: Expression) extends BinaryCodecExpression {
  override def nullSafeEval(v: Any): Any = Compression.zstdCompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): ZstdCompress = copy(c)
  override def prettyName: String = "zstd_compress"
}

case class ZstdDecompress(child: Expression) extends BinaryCodecExpression {
  override def nullSafeEval(v: Any): Any = Compression.zstdDecompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): ZstdDecompress = copy(c)
  override def prettyName: String = "zstd_decompress"
}

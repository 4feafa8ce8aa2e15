package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The real-codec decoder on the [[Multimodal.Decoder]] seam, exercised
  * on payload bytes it did NOT fabricate: deterministic synthetic
  * PNG/BMP/GIF images are encoded with `javax.imageio` writers, shipped
  * through the full distributed `decodeFeatures` pipeline, and the
  * decoded header dimensions must equal the constructed ones. This
  * retires the "plumbing proven, payload fake" asterisk: the seam has
  * carried a decoder that actually parses real image formats.
  */
class ImageIoDecoderSpec extends AnyFunSuite with SharedSpark {

  /** Deterministic w×h image: pixel(x, y) is pure arithmetic. */
  private def image(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 31 + y * 17) % 255) << 16 | ((x ^ y) % 255) << 8 | ((x + y) % 255))
    img
  }

  private def encodeImg(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    assert(ImageIO.write(img, format, out), s"JDK has no $format writer")
    out.toByteArray
  }

  test("decodes real PNG/BMP/GIF headers: width/height/frames from the bytes") {
    val cases = Seq((17, 9, "png"), (64, 48, "bmp"), (5, 123, "gif"), (1, 1, "png"))
    for ((w, h, fmt) <- cases) {
      val bytes = encodeImg(image(w, h), fmt)
      val f = Multimodal.ImageIoDecoder.decode(42L, bytes)
      assert(f.width == w && f.height == h,
        s"$fmt ${w}x$h decoded as ${f.width}x${f.height}")
      assert(f.n_frames == 1 && f.n_bytes == bytes.length && f.doc_id == 42L)
    }
    // PNG magic, as parsed from real encoder output
    assert(Multimodal.ImageIoDecoder.decode(1L, encodeImg(image(3, 3), "png")).first_byte == 0x89)
  }

  test("total on non-image and truncated payloads (no throw, zero dims)") {
    val text = Multimodal.ImageIoDecoder.decode(7L, "not an image".getBytes("UTF-8"))
    assert(text.n_bytes == 12 && text.width == 0 && text.height == 0 && text.n_frames == 0)
    // a PNG cut off mid-header: reader recognized, decode must still not throw
    val png = encodeImg(image(32, 32), "png")
    val truncated = Multimodal.ImageIoDecoder.decode(8L, png.take(12))
    assert(truncated.n_bytes == 12 && truncated.width == 0)
    val empty = Multimodal.ImageIoDecoder.decode(9L, Array.empty[Byte])
    assert(empty.n_bytes == 0 && empty.width == 0 && empty.n_frames == 0)
  }

  test("end-to-end through the distributed decodeFeatures pipeline on real payloads") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a mixed corpus: real images of varying dims + one corrupt + one text blob
    val dims = (1 to 40).map(i => (i.toLong, 8 + i % 23, 8 + (i * 7) % 31))
    val payloads = dims.map { case (id, w, h) => (id, encodeImg(image(w, h), "png")) } ++
      Seq((98L, "just text".getBytes("UTF-8")), (99L, Array.empty[Byte]))
    val df = payloads.toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("synthetic").as("origin"), length(col("payload")).as("content_hint")))
      .repartition(7)
    val feats = Multimodal.decodeFeatures(df, Multimodal.ImageIoDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, w, h) <- dims) {
      assert(feats(id).width == w && feats(id).height == h,
        s"doc $id: expected ${w}x$h, got ${feats(id).width}x${feats(id).height}")
    }
    assert(feats(98L).width == 0 && feats(99L).n_bytes == 0)
    assert(feats.size == payloads.size)
  }
}

package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{Decoder, MediaFeatures}
import org.scalatest.funsuite.AnyFunSuite

/** Executable contract for the multimodal [[Multimodal.Decoder]] seam —
  * run ANY new decoder implementation (a real JNI/FFmpeg/ImageIO one
  * included) through [[DecoderContractSpec.conformance]] before plugging
  * it into the pipeline. The contract is what the distributed plumbing
  * silently relies on: purity (task retries / speculative execution
  * recompute partitions and must reproduce bytes), partition-invariance
  * (the same corpus under any repartitioning yields the same feature
  * set), totality on empty payloads (one truncated blob must not abort a
  * 10^10-row job), and closure-serializability.
  */
class DecoderContractSpec extends AnyFunSuite with SharedSpark {

  /** The reusable conformance harness: registers the four contract
    * checks for a decoder under the given name.
    */
  def conformance(name: String, decoder: Decoder): Unit = {
    test(s"$name: deterministic — same (id, bytes) twice gives identical features") {
      val payloads = Seq(
        (1L, "hello media".getBytes("UTF-8")),
        (2L, Array.fill[Byte](1000)(42)),
        (3L, Array[Byte](-1, -128, 0, 127)))
      for ((id, bytes) <- payloads)
        assert(decoder.decode(id, bytes) == decoder.decode(id, bytes.clone()),
          s"$name is not a pure function of (id, bytes)")
    }

    test(s"$name: total on empty payloads — returns a well-formed zero-byte row") {
      val f = decoder.decode(7L, Array.empty[Byte])
      assert(f.doc_id == 7L && f.n_bytes == 0,
        s"$name must survive a zero-byte payload with n_bytes=0, got $f")
    }

    test(s"$name: partition-invariant and serializable through decodeFeatures") {
      import spark.implicits._
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val one = Multimodal.decodeFeatures(
        Multimodal.withPayload(docs).repartition(1), decoder)
        .collect().sortBy(_.doc_id).toSeq
      val many = Multimodal.decodeFeatures(
        Multimodal.withPayload(docs).repartition(7), decoder)
        .collect().sortBy(_.doc_id).toSeq
      assert(one == many,
        s"$name produced different features under different partitionings")
      assert(one.nonEmpty)
    }
  }

  conformance("FakeDecoder", Multimodal.FakeDecoder)

  // the REAL codec-backed implementation (JDK imageio) through the same
  // harness — the seam's contract holds for a decoder that actually
  // parses bytes (ImageIoDecoderSpec covers genuine image payloads;
  // here the corpus is text blobs, which it must survive as total rows)
  conformance("ImageIoDecoder (real codec)", Multimodal.ImageIoDecoder)

  // drop-in proof: a second, structurally different implementation built
  // only against the trait passes the same harness and flows through the
  // same pipeline — the shape a codec-backed decoder would take
  private object XorDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      var x = 0; var i = 0
      while (i < bytes.length) { x ^= bytes(i) & 0xff; i += 1 }
      MediaFeatures(id, bytes.length, x, width = x % 320,
        height = (x * 3) % 240, n_frames = bytes.length % 8 + 1)
    }
  }
  conformance("XorDecoder (drop-in)", XorDecoder)
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (opaque-binary) column plumbing.
  *
  * North-star extension: treat image/audio/video payloads as `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * per-partition batch stage. The Spark-side plumbing — schema, batch
  * shape, partition-parallel execution — is real and tested, and the
  * [[Decoder]] seam carries two implementations: [[ImageIoDecoder]], a
  * REAL JDK-imageio-backed decoder that parses PNG/GIF/BMP headers
  * (exercised on generated genuine image payloads in ImageIoDecoderSpec),
  * and [[FakeDecoder]], the deterministic SQL-replayable stand-in the
  * gated mm1/mm2 queries default to (a DuckDB oracle cannot decode a
  * PNG; the fake's arithmetic it can replay bit-exactly).
  *
  * Scale design: payloads never shuffle — metadata extraction is a
  * projection; anything needing grouping first reduces to (id, features).
  * The decode stage is `mapPartitions` over an iterator (the Scala analog
  * of arrow-batched `mapInPandas`), so one task holds one payload batch at
  * a time regardless of executor count.
  */
object Multimodal {

  /** A decoded-media feature row. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, first_byte: Int, width: Int, height: Int, n_frames: Int)

  /** The decoder seam: a real JNI/FFmpeg/ImageIO-backed implementation
    * drops in here without touching the pipeline ([[decodeFeatures]]
    * takes any instance). The contract an implementation MUST satisfy —
    * pinned executable by DecoderContractSpec's conformance harness, run
    * any new decoder through it:
    *
    *  - **pure / deterministic**: the result is a function of
    *    (id, bytes) alone — no wall clock, no RNG, no per-task state —
    *    so Spark may recompute a partition after task retry or executor
    *    loss and the output is identical (non-determinism here silently
    *    corrupts any downstream dedup/join under speculative execution);
    *  - **partition-invariant**: follows from purity — the same corpus
    *    under any repartitioning yields the same feature SET;
    *  - **total on empty payloads**: zero-byte media must return a
    *    well-formed row (n_bytes = 0), never throw — at pipeline scale
    *    one truncated blob in 10^10 must not abort the job (the
    *    corrupted-embedding posture applied to media);
    *  - **serializable**: the instance ships inside the mapPartitions
    *    closure to every executor.
    */
  trait Decoder extends Serializable {
    /** Would be: decode(bytes) -> pixel/sample buffer -> features. */
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures
  }

  /** STUB decoder — deterministic fake in place of a real codec (no
    * codec libs in this container): sizes derived from the payload
    * bytes themselves, trivially satisfying the [[Decoder]] contract
    * (and proven against it in DecoderContractSpec).
    */
  object FakeDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      MediaFeatures(id, n, first, width = n % 640, height = (n * 7) % 480, n_frames = n % 16 + 1)
    }
  }

  /** REAL codec-backed decoder on the [[Decoder]] seam: JDK
    * `javax.imageio` (PNG/GIF/BMP/JPEG readers ship with the JRE — zero
    * new dependencies, no display, no network). This is the proof the
    * seam carries an implementation that actually parses bytes it did
    * not fabricate: width/height come from the image header, n_frames
    * from the reader's frame count (GIF animations > 1).
    *
    * Contract posture (DecoderContractSpec runs this through the same
    * conformance harness as the stub):
    *
    *  - **pure**: a fresh reader per call over a memory-cached stream
    *    (no temp-file cache, no shared state); the decode is a function
    *    of the byte array alone;
    *  - **total**: undecodable or truncated payloads — including the
    *    text blobs the documents table carries — return a well-formed
    *    row with width/height/n_frames = 0 instead of throwing (the
    *    one-corrupt-blob-in-10^10 posture);
    *  - **serializable**: a stateless object.
    *
    * [[FakeDecoder]] stays the DEFAULT for the gated mm1/mm2 queries
    * because its arithmetic is SQL-replayable (the DuckDB oracle can't
    * decode PNGs); this decoder is the production drop-in, exercised
    * end-to-end on generated real PNG/GIF payloads in
    * ImageIoDecoderSpec.
    */
  object ImageIoDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      if (n == 0) return MediaFeatures(id, 0, 0, 0, 0, 0)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) MediaFeatures(id, n, first, 0, 0, 0)
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            val frames =
              try reader.getNumImages(true)
              catch { case _: Exception => 1 }
            MediaFeatures(id, n, first, w, h, frames)
          } catch {
            // header claims an image but the payload is truncated/corrupt
            case _: Exception => MediaFeatures(id, n, first, 0, 0, 0)
          } finally reader.dispose()
        }
      } finally iis.close()
    }
  }

  /** Attach an opaque binary payload column (here: utf-8 bytes of `text`
    * stand in for a media blob) plus typed metadata.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents
      // a NULL payload is "no media", not a zero-byte medium: the decode
      // contract is total on EMPTY payloads (DecoderContractSpec) but a
      // null byte array has nothing to decode — excluded here, mirrored
      // by the oracle's WHERE (the r13 hostile probe NPE'd the decoder
      // on a null-text document otherwise)
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          col("source").as("origin"),
          col("n_chars").as("content_hint")).as("meta"))

  /** Partition-parallel decode over the payload batch, through the
    * [[Decoder]] seam (default: the stub). Returns a typed Dataset with
    * the extracted features; one task holds one payload batch at a time
    * regardless of which decoder is plugged in.
    */
  def decodeFeatures(payloads: DataFrame,
                     decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder.decode(id, bytes) })
  }

  /** Frame sampling: chunk the payload into fixed-size frames and keep
    * every `stride`-th — the access pattern of video keyframe extraction,
    * with the same plumbing (pos-indexed explode, per-frame metadata)
    * a real decoder stage would feed. Runs as pure column algebra:
    * chunking is a `sequence` + `substr` transform, so it distributes
    * with zero shuffles and scales per-row.
    */
  def sampleFrames(documents: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("text")) / lit(frameBytes.toDouble)).cast("int")
    // empty docs: sequence(0, -1) counts DOWN in Spark ([0, -1]) and would
    // emit a bogus frame_idx=0 row — guard with an empty array, exactly
    // like NgramJaccard.charNgrams guards short texts
    val framed = documents.select(
      col("doc_id"),
      posexplode(when(length(col("text")) > 0, transform(
        sequence(lit(0), nFrames - 1),
        i => col("text").substr(i * frameBytes + 1, lit(frameBytes))
      )).otherwise(array().cast("array<string>"))).as(Seq("frame_idx", "frame")))
    framed
      .filter(col("frame_idx") % stride === 0)
      .select(
        col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        graft.functions.RollingHash(col("frame")).as("frame_hash"))
  }

  /** The formats the mm3 gate round-robins over — every codec here ships
    * in the JRE, so the gate exercises three REAL encoders/decoders with
    * zero new dependencies.
    */
  private val Mm3Formats = Array("png", "gif", "bmp")

  /** Deterministic genuine-image synthesis for the real-decoder gate:
    * dims, format, frame count, and fill color are arithmetic on the
    * doc_id ALONE (the manifest DuckDB replays — see
    * [[realDecodeOracle]]), but the BYTES are whatever the JDK codec
    * emits: a genuine PNG/BMP, or a genuine multi-frame GIF (1 + id%4
    * frames) so the decoder's frame counting is exercised past 1.
    * Pure function of id — partition- and retry-invariant by
    * construction.
    */
  private[ext] def encodeImage(id: Long): Array[Byte] = {
    val w = (1 + Math.floorMod(id, 31L)).toInt
    val h = (1 + Math.floorMod(id * 7L, 23L)).toInt
    val fmt = Mm3Formats(Math.floorMod(id, 3L).toInt)
    val nFrames = if (fmt == "gif") (1 + Math.floorMod(id, 4L)).toInt else 1
    def frame(f: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = Math.floorMod(id * 2654435761L + f * 65537L, 0x1000000L).toInt
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (nFrames == 1) {
      javax.imageio.ImageIO.write(frame(0), fmt, bos)
    } else {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until nFrames).foreach { f =>
          writer.writeToSequence(new javax.imageio.IIOImage(frame(f), null, null), null)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose(); ios.close()
      }
    }
    bos.toByteArray
  }

  /** The REAL-decoder gate (mm3): synthesize genuine image payloads from
    * the documents table's id set, stage them through a parquet
    * binary-column round trip (the way a production corpus would carry
    * them), decode with [[ImageIoDecoder]] — the JDK codec parsing bytes
    * a JDK codec emitted, through the same seam the stub rides — and
    * emit the decoded header facts. The DuckDB oracle replays the
    * MANIFEST arithmetic (dims/format/frames as functions of doc_id), so
    * any decoder that fails to parse the genuine bytes (width/height 0)
    * hash-mismatches loudly. Everything is id-derived: hostile-value
    * corpora can't perturb it (keys are protected), and the payload
    * never shuffles — encode is a map, decode is a map, the only wide op
    * is the final presentation sort.
    *
    * `format` is a byte-level magic sniff (PNG 0x89 / GIF 'G' / BMP 'B')
    * of the STAGED payload's first byte — captured from the raw bytes
    * before codec parsing, so it proves the encode→parquet→stage round
    * trip delivered the intended container, not the codec's own
    * identification; the columns that actually exercise the decoder's
    * parse are width/height/n_frames, which come from the image header
    * and zero out if the genuine bytes fail to parse (the r14 advisor's
    * vacuity note, wording tightened per the r16 advisor).
    *
    * The result materializes EAGERLY (unsorted localCheckpoint, sorted
    * lazily — the cache-release contract) and the staging dir is deleted
    * before return: callers pass a per-invocation dir, so two processes
    * on the same sf never share (and never accumulate) staging files.
    */
  def realDecode(documents: DataFrame, stagingDir: String): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodeImage(id))))
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(stagingDir)
    val staged = spark.read.parquet(stagingDir)
    val decoded = decodeFeatures(staged, ImageIoDecoder).toDF()
      .select(
        col("doc_id"),
        when(col("first_byte") === lit(0x89), lit("png"))
          .when(col("first_byte") === lit(0x47), lit("gif"))
          .when(col("first_byte") === lit(0x42), lit("bmp"))
          .otherwise(lit("undecoded")).as("format"),
        col("width"), col("height"), col("n_frames"))
      .localCheckpoint(true)
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    decoded.orderBy(col("doc_id"))
  }

  /** Manifest replay for [[realDecode]] — pure id arithmetic, no image
    * knowledge: if the engine's decoded headers match this, the encode →
    * parquet → decode path reproduced the manifest from genuine bytes.
    */
  val realDecodeOracle: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'bmp' END AS format,
      |  CAST(1 + doc_id % 31 AS INT) AS width,
      |  CAST(1 + (doc_id * 7) % 23 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1 + doc_id % 4 ELSE 1 END AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** DuckDB's range() *table* function rejects correlated arguments, but
    * the scalar range() *list* function takes them — unnest it per doc, so
    * the frame count is exact for any document length (no fixed bound to
    * outgrow) and empty docs produce zero rows, matching the Spark guard.
    */
  def sampleFramesOracle(frameBytes: Int, stride: Int): String =
    s"""WITH idx AS (
       |  SELECT doc_id, text,
       |    unnest(range(0, CAST(ceil(length(text) / $frameBytes.0) AS BIGINT))) AS i
       |  FROM documents),
       |framed AS (
       |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
       |    substr(text, CAST(i AS INT) * $frameBytes + 1, $frameBytes) AS frame
       |  FROM idx)
       |SELECT doc_id, frame_idx,
       |  CAST(length(frame) AS INT) AS frame_len,
       |  ${graft.functions.RollingHash.oracleSql("frame")} AS frame_hash
       |FROM framed WHERE frame_idx % $stride = 0""".stripMargin

  /** Oracle for the fake-decode pipeline (the fake is arithmetic on byte
    * length + first byte, so SQL can replay it). Byte semantics
    * throughout: `encode(text)` is the UTF-8 payload (a bare
    * `CAST(text AS BLOB)` rejects non-ASCII in DuckDB), and the first
    * BYTE comes from the hex form — `ascii(substr(text,1,1))` returns
    * the first CODEPOINT, which diverges from the engine's first byte on
    * multi-byte text (r13 unicode parity probe).
    */
  val oracle: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
      |            ELSE CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT) END AS INT) AS first_byte,
      |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
      |  CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
      |FROM documents WHERE text IS NOT NULL""".stripMargin
}

package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video payloads travel as opaque
  * `BinaryType` columns next to typed metadata (SURVEY.md §2.4 E4).
  *
  * The Spark-side plumbing — schema, batch iteration, partition-local
  * decode — is real, and since round 10 so is the IMAGE codec for PNG:
  * [[pngEncode]]/[[pngDecodeFeatures]]/[[pngHalve]] run the JDK's own
  * `javax.imageio` (public standard library, no external dependencies),
  * verified end-to-end by e4f's SQL oracle (PNG is lossless, so decoded
  * pixels are exact functions of the generator). The header-byte STUBS
  * below remain for the formats the JDK doesn't ship (video containers,
  * lossy audio); swap [[stubDecode]] for e.g. TwelveMonkeys/JCodec on the
  * executor classpath without touching any query.
  *
  * Scale notes: decode runs inside `mapPartitions` (one JVM-local pass, no
  * shuffle); payloads >~100 MB should be pointer-style (path + offset in the
  * binary column's place) so Parquet row groups stay balanced.
  */
object Multimodal {

  /** Typed metadata produced by decoding one payload. */
  final case class MediaMeta(widthPx: Int, heightPx: Int, frames: Int)

  val metaSchema: StructType = StructType(Seq(
    StructField("width_px", IntegerType, nullable = false),
    StructField("height_px", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))

  /** STUB decoder: a real implementation parses the container header.
    * The fake derives dimensions from the first payload bytes so it is
    * deterministic, cheap, and exercises the full batch path. */
  def stubDecode(payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    MediaMeta(widthPx = b0 + 16, heightPx = b1 + 16, frames = payload.length % 8 + 1)
  }

  /** STUB transform: a real implementation decodes, resizes to `maxDim`,
    * and re-encodes; the fake truncates the payload proportionally so batch
    * shape, schema, and size accounting are all exercised for real. */
  def stubResize(payload: Array[Byte], maxDim: Int): Array[Byte] = {
    val meta = stubDecode(payload)
    val scale = math.min(1.0, maxDim.toDouble / math.max(meta.widthPx, meta.heightPx))
    payload.take(math.max(1, (payload.length * scale * scale).toInt))
  }

  /** Partition-local binary→binary transform (`resize`): payloads in,
    * payloads out, schema preserved plus the new size column. */
  def resize(df: DataFrame, maxDim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("resized_bytes", LongType, nullable = true)))
    val rows = df.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Row(r.getLong(0), null, null) // null in, null out
        else {
          val resized = stubResize(payload, maxDim)
          Row(r.getLong(0), resized, resized.length.toLong)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame index
    * up to the stub-decoded frame count, exploded to one row per kept frame.
    * Pure column expressions — no shuffle, no UDF. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.select(
        col("doc_id"),
        explode(sequence(
          lit(0),
          (length(col("payload")) % 8 + 1) - 1, // stubDecode.frames - 1
          lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))

  /** Feature extraction: Shannon entropy of the payload's byte histogram —
    * a cheap, codec-free signal (compressed/encrypted media sits near 8 bits,
    * text far lower). Partition-local pass; the histogram is order-free and
    * the bin loop is fixed-order, so the result is exactly deterministic. */
  def byteEntropy(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("entropy_bits", DoubleType, nullable = true)))
    val rows = df.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Row(r.getLong(0), null) // null in, null out
        else {
          val hist = new Array[Long](256)
          payload.foreach(b => hist(b & 0xff) += 1)
          val n = payload.length.toDouble
          var h = 0.0
          var i = 0
          while (i < 256) {
            if (hist(i) > 0) { val p = hist(i) / n; h -= p * (math.log(p) / math.log(2)) }
            i += 1
          }
          Row(r.getLong(0), h)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** 16-bit block-mean PERCEPTUAL hash of a binary payload — the pHash
    * shape used for image near-dup dedup: the payload is cut into 16
    * equal-span byte blocks and bit `b` is set when block `b`'s mean byte
    * value exceeds the whole payload's mean. Small local edits flip few
    * blocks, so near-identical payloads collide. Partition-local pass
    * (real pHash's DCT would slot in here unchanged); all-integer sums and
    * one double division per block keep it exactly reproducible. */
  def perceptualHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash16", LongType, nullable = true)))
    val rows = df.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null || payload.isEmpty) Row(r.getLong(0), null)
        else {
          val n = payload.length
          val sums = new Array[Long](16)
          val counts = new Array[Long](16)
          var total = 0L
          var i = 0
          while (i < n) {
            val b = ((i.toLong * 16) / n).toInt // block of 0-based byte i (long math: i*16 overflows Int past ~128 MiB)
            val v = payload(i) & 0xff
            sums(b) += v; counts(b) += 1; total += v
            i += 1
          }
          val mean = total.toDouble / n
          var hash = 0L
          var blk = 0
          while (blk < 16) {
            if (counts(blk) > 0 && sums(blk).toDouble / counts(blk) > mean)
              hash |= 1L << blk
            blk += 1
          }
          Row(r.getLong(0), hash)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------ REAL codec

  /** REAL image codec — `javax.imageio` (the JDK's own standard library,
    * present in every Java runtime; no external image dependencies). PNG
    * is LOSSLESS, so encode→decode round-trips pixels exactly: features
    * computed from DECODED pixels are pure functions of the generator,
    * which is what lets a SQL oracle verify a real codec end-to-end
    * (e4f). The lossy/exotic-format stubs above remain for formats the
    * JDK doesn't ship; this path proves the partition-local plumbing
    * carries a true decoder. */
  def pngEncode(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    imageIoNoDiskCache
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image features: dimensions + per-channel pixel sums (exact
    * integer arithmetic — the oracle recomputes them from the generator). */
  final case class PngFeatures(
      width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** ImageIO's default stream cache spools every encode/decode through a
    * temp FILE on disk — pure overhead for the few-KB in-memory payloads
    * here (e4f makes ~4 codec passes per doc). Disabled once per JVM. */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def pngDecodeFeatures(bytes: Array[Byte]): PngFeatures = {
    imageIoNoDiskCache
    // ImageIO.read signals "no reader accepts these bytes" with NULL, not
    // an exception — surface a diagnosable error instead of a bare NPE
    // deep inside a task
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"payload of ${bytes.length} bytes is not a decodable image (no ImageIO reader accepted it)")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    PngFeatures(img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Nearest-neighbour 2× downsample THROUGH the real codec: decode,
    * pick every second pixel (deterministic integer resample — AWT's
    * interpolating scalers are not bit-pinned across platforms),
    * re-encode. Both directions exercise the true PNG codec. */
  def pngHalve(bytes: Array[Byte]): Array[Byte] = {
    imageIoNoDiskCache
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"payload of ${bytes.length} bytes is not a decodable image (no ImageIO reader accepted it)")
    val (w, h) = ((img.getWidth + 1) / 2, (img.getHeight + 1) / 2)
    pngEncode(w, h, (x, y) => img.getRGB(x * 2, y * 2))
  }

  /** Decode of a `(doc_id LONG, payload BINARY)` frame into
    * `(doc_id, payload_bytes, payload_sha, width_px, height_px, frames)`.
    *
    * The stub "decode" is pure header-byte arithmetic, so — like
    * [[sampleFrames]] — it stays in codegen'd column expressions: `sha2`
    * for the content hash, `hex`+`conv` to read unsigned header bytes.
    * (A real codec would live behind `mapPartitions` like [[resize]] and
    * [[byteEntropy]], where per-partition decoder setup amortises.) */
  def decodeMeta(df: DataFrame): DataFrame = {
    def byteAt(pos: Int) = // unsigned byte value, 0 when past end-of-payload
      coalesce(nullif(conv(hex(substring(col("payload"), pos, 1)), 16, 10), lit("")), lit("0"))
        .cast("int")
    // a NULL payload must yield NULL metadata across the board — the
    // past-end-of-payload "0" coalesce would otherwise fabricate a 16×16
    // image for a row that has no media at all
    def ifPresent(c: org.apache.spark.sql.Column) =
      when(col("payload").isNotNull, c)
    df.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("payload_bytes"),
      lower(sha2(col("payload"), 256)).as("payload_sha"),
      ifPresent(byteAt(1) + 16).as("width_px"),
      ifPresent(byteAt(2) + 16).as("height_px"),
      (pmod(length(col("payload")), lit(8)) + 1).cast("int").as("frames"))
  }
}

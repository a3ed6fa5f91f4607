package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and batch feature extraction with the
  * partitioning/schema shape a real decoder would use.
  *
  * The decode step itself is a clearly-marked deterministic STUB (the
  * image/audio codecs are not in this container); everything around it —
  * schema, encoders, mapPartitions batching, output shape — is real and
  * tested. Swapping in a real decoder is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried alongside every blob. */
  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("source_uri", StringType)))

  case class Blob(id: Long, content: Array[Byte], mime: String)
  case class Features(id: Long, byte_len: Long, n_frames: Int, features: Array[Float])

  /** Attach a binary payload + metadata struct to a DataFrame (here the
    * payload is the UTF-8 text itself — stands in for image bytes).
    */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(payloadCol).cast("binary").as("content"),
      struct(lit(mime).as("mime"),
        length(col(payloadCol).cast("binary")).cast("long").as("byte_len"),
        concat(lit("mem://"), col(idCol)).as("source_uri")).as("meta"))

  /** ======== STUB ========
    * Deterministic fake decoder: "decodes" a blob into a fixed-size
    * feature vector from a byte histogram, and a frame count from the
    * byte length. A real implementation would invoke the codec here; the
    * signature, batching (one codec init per partition, not per row), and
    * output schema are exactly what the real one needs.
    */
  def decodeStub(bytes: Array[Byte], dims: Int = 16): Array[Float] = {
    val hist = new Array[Float](dims)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % dims) += 1f; i += 1 }
    if (bytes.length > 0) { var j = 0; while (j < dims) { hist(j) /= bytes.length; j += 1 } }
    hist
  }

  /** Partition-batched feature extraction over binary blobs. The codec
    * (stub) is initialized once per partition — the shape that matters at
    * scale, where decoder init (model load, JNI context) dominates.
    */
  def extractFeatures(blobs: Dataset[Blob], frameBytes: Int = 64): Dataset[Features] = {
    implicit val enc = Encoders.product[Features]
    blobs.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map { b =>
        val feats = decodeStub(b.content)
        Features(b.id, b.content.length.toLong,
          math.max(1, (b.content.length + frameBytes - 1) / frameBytes), feats)
      }
    }
  }

  case class Resized(id: Long, byte_len: Long, resized: String)

  /** ======== STUB ========
    * Deterministic fake resize kernel: area-average the byte stream down
    * to `outLen` buckets (bucket of byte i = `i·outLen div len`, value =
    * integer mean of the bucket's bytes; sparse buckets of short blobs
    * are 0). A real implementation would decode + bilinear-resample here;
    * the bucket boundaries, integer-exact averaging, and empty-input
    * convention are the contract a real kernel must keep.
    */
  def resizeStub(bytes: Array[Byte], outLen: Int): Array[Int] = {
    val sum = new Array[Long](outLen)
    val cnt = new Array[Long](outLen)
    var i = 0
    while (i < bytes.length) {
      val k = (i.toLong * outLen / bytes.length).toInt
      sum(k) += (bytes(i) & 0xff); cnt(k) += 1; i += 1
    }
    Array.tabulate(outLen)(k => if (cnt(k) == 0) 0 else (sum(k) / cnt(k)).toInt)
  }

  /** Partition-batched resize over blobs — same mapPartitions shape as
    * [[extractFeatures]] (kernel init once per partition). Empty blobs
    * resize to the empty string, mirroring tokenCount's blank convention.
    * The resized vector rides as a comma-joined string (like q35's
    * features) so engines hash it identically.
    */
  def resize(blobs: Dataset[Blob], outLen: Int = 8): Dataset[Resized] = {
    implicit val enc = Encoders.product[Resized]
    blobs.mapPartitions { it =>
      // real impl: val kernel = Codec.open() — once per partition
      it.map { b =>
        val r = if (b.content.isEmpty) ""
          else resizeStub(b.content, outLen).mkString(",")
        Resized(b.id, b.content.length.toLong, r)
      }
    }
  }

  /** Deterministic frame sampling for "video" blobs: every `stride`-th
    * frame window of `frameBytes` bytes, as its own row (explode shape —
    * downstream per-frame models join on (id, frame_no)). One frame per
    * full `frameBytes·stride` span, minimum one (short blobs yield their
    * prefix). Byte offsets throughout — `length`/`substr` on BinaryType
    * count bytes. Integer arithmetic only (Column `/` is double division;
    * an earlier draft fed a double into `sequence`, which fails analysis).
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val span = frameBytes * stride
    val n = greatest(floor(length(col("content")) / span).cast("int"), lit(1))
    df.select(col("id"),
      posexplode(
        transform(sequence(lit(0), n - 1),
          i => col("content").substr(i * span + 1, lit(frameBytes))))
        .as(Seq("frame_no", "frame_bytes")))
  }
}

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

  case class PHash(id: Long, byte_len: Long, phash: Long)

  /** Average-hash (aHash) perceptual fingerprint over the resize-stub
    * buckets: bit k is set iff bucket mean m_k is >= the mean of all
    * bucket means (integer-exact as `bits·m_k >= Σm`). The standard
    * cheap image near-dup fingerprint — with a real resize kernel in
    * [[resizeStub]]'s place this IS pHash-family image dedup; the
    * hashing shape is standard. Empty blobs hash to 0 (documented
    * convention, like [[resize]]). `bits` <= 32 so the hash stays in
    * the positive long range.
    *
    * DEMO / per-insert shape only: at <= 32 bits a corpus-wide pair
    * search bands into 4-bit values (16 buckets) and candidate mass
    * grows as n²/2^bandBits — measured 16× per 10× at sf1. The
    * production corpus-wide path is the 128-bit family
    * ([[pHash128Image]] for real images, [[aHash128Stub]] for opaque
    * byte payloads) + [[phash128Pairs]], measured linear to 2M images
    * (PERF_r9 §1); q155's gate rides it. Keep this form for single-blob
    * fingerprints and per-insert probes against a small window.
    */
  def aHash(blobs: Dataset[Blob], bits: Int = 32): Dataset[PHash] = {
    require(bits > 0 && bits <= 32, s"bits $bits must be in (0, 32]")
    implicit val enc = Encoders.product[PHash]
    blobs.mapPartitions { it =>
      it.map { b =>
        if (b.content.isEmpty) PHash(b.id, 0L, 0L)
        else {
          val m = resizeStub(b.content, bits)
          val s = m.map(_.toLong).sum
          var h = 0L
          var k = 0
          while (k < bits) {
            if (m(k).toLong * bits >= s) h |= (1L << k); k += 1
          }
          PHash(b.id, b.content.length.toLong, h)
        }
      }
    }
  }

  /** Hamming-threshold pairs over perceptual hashes via pigeonhole
    * banding: split the hash into `maxDist + 1` equal bit-bands — two
    * hashes within `maxDist` must agree on at least one whole band — and
    * equi-join on (band, band value), so candidate generation is a plain
    * shuffle join (never all-pairs) and only candidates pay the exact
    * `bit_count(xor)` verify. Same recall-complete construction as
    * [[Dedup]]'s SimHash pigeonhole and [[Barcodes]]' slice prefilter.
    *
    * Output: id_a < id_b, hash_a, hash_b, hamming (<= maxDist).
    */
  def phashPairs(
      hashes: DataFrame, bits: Int, maxDist: Int,
      maxCandidatePairs: Option[Long] = None): DataFrame = {
    val nBands = maxDist + 1
    require(bits % nBands == 0,
      s"bits $bits must divide into ${nBands} bands")
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    val bands = (0 until nBands).map(bn => struct(lit(bn).as("band"),
      shiftrightunsigned(col("phash"), bn * bandBits)
        .bitwiseAND(lit(mask)).as("bval")))
    val posting0 = hashes
      .select(col("id"), col("phash"), explode(array(bands: _*)).as("b"))
      .select(col("id"), col("phash"), col("b.band"), col("b.bval"))
    val posting = if (maxCandidatePairs.isDefined)
      posting0.localCheckpoint(false) else posting0
    maxCandidatePairs.foreach { budget =>
      // same pigeonhole-bucket circuit breaker as Dedup.simhashPairs:
      // Σ over (band, bval) of c·(c−1)/2 is the exact self-join mass —
      // a degenerate hash distribution (near-identical byte histograms,
      // e.g. a template corpus) fails fast instead of writing it
      val c = col("_c").cast("decimal(38,0)")
      Dedup.requireCandidateBudget("phashPairs",
        posting.groupBy("band", "bval").agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(c * (c - lit(1))),
            lit(0).cast("decimal(38,0)")).cast("decimal(38,0)")),
        budget,
        "Raise `bits` (a more discriminative perceptual hash), lower " +
          "maxDist (fewer, smaller bands), or pre-shard the corpus — " +
          "this hash distribution piles blobs into few buckets.")
    }
    val a = posting.select(col("id").as("id_a"), col("phash").as("hash_a"),
      col("band"), col("bval"))
    val b = posting.select(col("id").as("id_b"), col("phash").as("hash_b"),
      col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hash_a", "hash_b")
      .distinct()
      .withColumn("hamming",
        bit_count(col("hash_a").bitwiseXOR(col("hash_b"))).cast("long"))
      .filter(col("hamming") <= maxDist)
  }

  /** Decoded grayscale image: row-major luma values in [0, 255]. */
  case class ImagePixels(width: Int, height: Int, gray: Array[Int])

  /** The codec seam the stubs stand in for. Implementations must be
    * deterministic and Serializable (they ride into mapPartitions
    * closures, initialized once per partition by construction).
    */
  trait ImageCodec extends Serializable {
    /** None = not a decodable image (corrupt, truncated, wrong mime). */
    def decode(bytes: Array[Byte]): Option[ImagePixels]
  }

  /** REAL image decoder on the pure-JDK `javax.imageio` stack (PNG,
    * BMP, GIF, JPEG — no native libs, available in any Spark executor
    * JVM). Luma is the exact integer BT.601 form
    * (299·R + 587·G + 114·B + 500) / 1000 — deterministic across
    * platforms, no float rounding. With this plugged into
    * [[resizeImage]]/[[aHashImage]], the q104/q155/q251-shaped
    * pipelines run production-real at zero plan change: the gate
    * queries keep the byte-stub (their corpus is text bytes and the
    * oracle must reproduce the arithmetic); `MultimodalCodecSpec`
    * exercises this path on in-memory PNGs.
    */
  object ImageIoCodec extends ImageCodec {
    def decode(bytes: Array[Byte]): Option[ImagePixels] = {
      if (bytes == null || bytes.isEmpty) return None
      // plugin readers throw RuntimeExceptions (IllegalArgument, AIOOBE,
      // CMMException...) on malformed images, not just IOException — a
      // corrupt blob must become None, never a task-killing throw
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val gray = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            gray(y * w + x) = (299 * r + 587 * g + 114 * b + 500) / 1000
            x += 1
          }
          y += 1
        }
        Some(ImagePixels(w, h, gray))
      }
    }
  }

  /** Real-image resize: decode via `codec`, then EXACT integer area
    * averaging onto an `outW`×`outH` grid (pixel (x,y) belongs to cell
    * (x·outW div w, y·outH div h); cell value = integer mean) — the
    * same arithmetic contract as [[resizeStub]], now over real pixels.
    * Undecodable blobs resize to the empty string (the [[resize]]
    * empty-blob convention), so corrupt images surface as empties
    * downstream instead of vanishing. Same mapPartitions shape (codec
    * init once per partition).
    */
  def resizeImage(
      blobs: Dataset[Blob], outW: Int = 8, outH: Int = 8,
      codec: ImageCodec = ImageIoCodec): Dataset[Resized] = {
    implicit val enc = Encoders.product[Resized]
    blobs.mapPartitions { it =>
      it.map { b =>
        // decode() guards null content; the metadata must too
        val len = if (b.content == null) 0L else b.content.length.toLong
        val r = codec.decode(b.content) match {
          case None => ""
          case Some(p) =>
            val sum = new Array[Long](outW * outH)
            val cnt = new Array[Long](outW * outH)
            var y = 0
            while (y < p.height) {
              val cy = (y.toLong * outH / p.height).toInt
              var x = 0
              while (x < p.width) {
                val k = cy * outW + (x.toLong * outW / p.width).toInt
                sum(k) += p.gray(y * p.width + x); cnt(k) += 1
                x += 1
              }
              y += 1
            }
            Array.tabulate(outW * outH)(k =>
              if (cnt(k) == 0) 0 else (sum(k) / cnt(k)).toInt).mkString(",")
        }
        Resized(b.id, len, r)
      }
    }
  }

  /** Real-image average-hash: the classic 8×8 aHash (64-bit) over
    * [[resizeImage]]'s integer cell means — bit k set iff
    * 64·m_k >= Σm, exactly [[aHash]]'s integer rule over real pixels.
    * Undecodable blobs hash to 0 (the stub family's empty convention).
    * Output feeds [[phashPairs]] unchanged (bits = 64 splits into
    * maxDist+1 bands whenever (maxDist+1) divides 64).
    */
  def aHashImage(
      blobs: Dataset[Blob], codec: ImageCodec = ImageIoCodec): Dataset[PHash] = {
    implicit val enc = Encoders.product[PHash]
    blobs.mapPartitions { it =>
      it.map { b =>
        val len = if (b.content == null) 0L else b.content.length.toLong
        codec.decode(b.content) match {
          case None => PHash(b.id, len, 0L)
          case Some(p) =>
            val sum = new Array[Long](64)
            val cnt = new Array[Long](64)
            var y = 0
            while (y < p.height) {
              val cy = (y.toLong * 8 / p.height).toInt
              var x = 0
              while (x < p.width) {
                val k = cy * 8 + (x.toLong * 8 / p.width).toInt
                sum(k) += p.gray(y * p.width + x); cnt(k) += 1
                x += 1
              }
              y += 1
            }
            val m = Array.tabulate(64)(k =>
              if (cnt(k) == 0) 0L else sum(k) / cnt(k))
            val s = m.sum
            var h = 0L
            var k = 0
            while (k < 64) { if (m(k) * 64 >= s) h |= (1L << k); k += 1 }
            PHash(b.id, len, h)
        }
      }
    }
  }

  case class PHash128(
      id: Long, byte_len: Long, hash_hi: Long, hash_lo: Long)

  /** 128-bit perceptual hash: aHash (8×8 mean-threshold, low word)
    * concatenated with dHash (9×8 horizontal-gradient, high word) —
    * two DECORRELATED integer-exact fingerprints in one decode+pixel
    * pass. The width is the scale knob PERF_r8 §3 measured the need
    * for: 64-bit hashes under maxDist 3 band into 16-bit values, and
    * bucket mass saturates as n²/2^16 once the corpus passes ~0.5M
    * images (measured 1.6·n → 15.5·n from 50k to 500k); 128 bits band
    * into 32-bit values — 2^32 buckets — pushing the same saturation
    * point out by 2^16. dHash is mean-shift invariant like aHash
    * (a global luma shift moves both sides of every comparison), so
    * planted brightness near-dups stay hamming ≈ 0 across all 128 bits.
    * Undecodable blobs hash to (0, 0), the stub family's convention.
    */
  def pHash128Image(
      blobs: Dataset[Blob], codec: ImageCodec = ImageIoCodec): Dataset[PHash128] = {
    implicit val enc = Encoders.product[PHash128]
    blobs.mapPartitions { it =>
      it.map { b =>
        val len = if (b.content == null) 0L else b.content.length.toLong
        codec.decode(b.content) match {
          case None => PHash128(b.id, len, 0L, 0L)
          case Some(p) =>
            // one pixel pass, two integer area-average grids: 8×8 for
            // aHash, 9×8 (one extra column) for dHash's horizontal diffs
            val sumA = new Array[Long](64); val cntA = new Array[Long](64)
            val sumD = new Array[Long](72); val cntD = new Array[Long](72)
            var y = 0
            while (y < p.height) {
              val cy = (y.toLong * 8 / p.height).toInt
              var x = 0
              while (x < p.width) {
                val v = p.gray(y * p.width + x)
                sumA(cy * 8 + (x.toLong * 8 / p.width).toInt) += v
                cntA(cy * 8 + (x.toLong * 8 / p.width).toInt) += 1
                sumD(cy * 9 + (x.toLong * 9 / p.width).toInt) += v
                cntD(cy * 9 + (x.toLong * 9 / p.width).toInt) += 1
                x += 1
              }
              y += 1
            }
            val mA = Array.tabulate(64)(k =>
              if (cntA(k) == 0) 0L else sumA(k) / cntA(k))
            val s = mA.sum
            var lo = 0L
            var k = 0
            while (k < 64) { if (mA(k) * 64 >= s) lo |= (1L << k); k += 1 }
            val mD = Array.tabulate(72)(k =>
              if (cntD(k) == 0) 0L else sumD(k) / cntD(k))
            var hi = 0L
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                if (mD(r * 9 + c + 1) > mD(r * 9 + c))
                  hi |= (1L << (r * 8 + c))
                c += 1
              }
              r += 1
            }
            PHash128(b.id, len, hi, lo)
        }
      }
    }
  }

  /** ======== STUB ========
    * [[pHash128Image]]'s codec-less twin for corpora whose "image" blobs
    * are opaque byte streams (TESTDATA carries text bytes as stand-in
    * payloads): the same two decorrelated 64-bit words — mean-threshold
    * (aHash) low word over 64 one-dimensional byte buckets, gradient
    * (dHash) high word over 65 buckets — built from the raw byte stream
    * instead of decoded pixels. Bucket of byte i is `i·K div L` (K = 64
    * resp. 65); bucket value is the integer mean of its bytes; buckets
    * with no bytes (L < K) contribute no bit and are excluded from the
    * threshold sum, and a gradient bit needs both adjacent buckets
    * non-empty. Empty blobs hash to (0, 0), the stub family's
    * convention. Swap [[pHash128Image]] in for real images — the band
    * join ([[phash128Pairs]]) and everything downstream are identical.
    */
  def aHash128Stub(blobs: Dataset[Blob]): Dataset[PHash128] = {
    implicit val enc = Encoders.product[PHash128]
    blobs.mapPartitions { it =>
      it.map { b =>
        val bytes = if (b.content == null) Array.empty[Byte] else b.content
        val n = bytes.length
        if (n == 0) PHash128(b.id, 0L, 0L, 0L)
        else {
          val sumA = new Array[Long](64); val cntA = new Array[Long](64)
          val sumD = new Array[Long](65); val cntD = new Array[Long](65)
          var i = 0
          while (i < n) {
            val v = bytes(i) & 0xff
            val ka = (i.toLong * 64 / n).toInt
            val kd = (i.toLong * 65 / n).toInt
            sumA(ka) += v; cntA(ka) += 1
            sumD(kd) += v; cntD(kd) += 1
            i += 1
          }
          val mA = new Array[Long](64)
          var sm = 0L
          var k = 0
          while (k < 64) {
            if (cntA(k) > 0) { mA(k) = sumA(k) / cntA(k); sm += mA(k) }
            k += 1
          }
          var lo = 0L
          k = 0
          while (k < 64) {
            if (cntA(k) > 0 && mA(k) * 64 >= sm) lo |= (1L << k)
            k += 1
          }
          var hi = 0L
          k = 0
          while (k < 64) {
            if (cntD(k) > 0 && cntD(k + 1) > 0 &&
                sumD(k + 1) / cntD(k + 1) > sumD(k) / cntD(k))
              hi |= (1L << k)
            k += 1
          }
          PHash128(b.id, n.toLong, hi, lo)
        }
      }
    }
  }

  /** [[phashPairs]] for 128-bit (hash_hi, hash_lo) fingerprints:
    * pigeonhole bands over the 128-bit concatenation (lo = bits 0–63,
    * hi = bits 64–127), exact two-word hamming verify on candidates.
    * `maxDist + 1` must divide 128 with bands no wider than one word
    * (maxDist >= 1), so every band lands whole in one of the two words
    * and band extraction stays a shift+mask.
    *
    * Output: id_a < id_b, hamming (<= maxDist).
    */
  def phash128Pairs(
      hashes: DataFrame, maxDist: Int,
      maxCandidatePairs: Option[Long] = None): DataFrame = {
    val nBands = maxDist + 1
    require(maxDist >= 1 && 128 % nBands == 0 && 128 / nBands <= 64,
      s"maxDist $maxDist: 128 bits must split into maxDist+1 <= 64-bit bands")
    val bandBits = 128 / nBands
    val mask = if (bandBits == 64) lit(-1L)
      else lit((1L << bandBits) - 1)
    val bands = (0 until nBands).map { bn =>
      val off = bn * bandBits
      val word = if (off < 64) col("hash_lo") else col("hash_hi")
      struct(lit(bn).as("band"),
        shiftrightunsigned(word, off % 64).bitwiseAND(mask).as("bval"))
    }
    val posting0 = hashes
      .select(col("id"), col("hash_hi"), col("hash_lo"),
        explode(array(bands: _*)).as("b"))
      .select(col("id"), col("hash_hi"), col("hash_lo"),
        col("b.band"), col("b.bval"))
    val posting = if (maxCandidatePairs.isDefined)
      posting0.localCheckpoint(false) else posting0
    maxCandidatePairs.foreach { budget =>
      val c = col("_c").cast("decimal(38,0)")
      Dedup.requireCandidateBudget("phash128Pairs",
        posting.groupBy("band", "bval").agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(c * (c - lit(1))),
            lit(0).cast("decimal(38,0)")).cast("decimal(38,0)")),
        budget,
        "This hash distribution piles blobs into few buckets (low-" +
          "texture corpus); lower maxDist or pre-shard the corpus.")
    }
    val a = posting.select(col("id").as("id_a"),
      col("hash_hi").as("_ha"), col("hash_lo").as("_la"),
      col("band"), col("bval"))
    val b = posting.select(col("id").as("id_b"),
      col("hash_hi").as("_hb"), col("hash_lo").as("_lb"),
      col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "_ha", "_la", "_hb", "_lb")
      .distinct()
      .withColumn("hamming",
        (bit_count(col("_ha").bitwiseXOR(col("_hb"))) +
          bit_count(col("_la").bitwiseXOR(col("_lb")))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
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

  case class FrameEnergy(id: Long, frame_no: Long, energy: Long)

  /** Voice-activity-detection segmentation over "audio" blobs — the
    * silence-splitting pass an audio-training pipeline runs before
    * transcription/embedding: sample frames ([[sampleFrames]]), compute
    * per-frame energy (integer mean byte value — the stub stand-in for
    * RMS amplitude; a real decoder slots into the same mapPartitions),
    * and merge consecutive voiced frames (energy >= `silenceBelow`)
    * into segments via the gaps-and-islands key (frame_no −
    * row_number, the q224 streak idiom — one keyed window, no
    * self-join).
    *
    * Output: one row per voiced segment — (id, seg_no 1-based by
    * start, start_frame, end_frame, n_frames).
    */
  def vadSegments(
      df: DataFrame, frameBytes: Int = 64, stride: Int = 4,
      silenceBelow: Long): DataFrame = {
    val frames = sampleFrames(df, frameBytes, stride)
    implicit val enc = Encoders.product[FrameEnergy]
    implicit val encIn =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.BINARY)
    val energies = frames
      .select(col("id").cast("long").as("id"),
        col("frame_no").cast("long").as("frame_no"), col("frame_bytes"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: [[vadSegmentsAudio]] — same seam, real decoder
        it.map { case (id, fno, bytes) =>
          if (bytes == null || bytes.isEmpty) FrameEnergy(id, fno, 0L)
          else {
            var s = 0L; var i = 0
            while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
            FrameEnergy(id, fno, s / bytes.length)
          }
        }
      }.toDF()
    segmentVoiced(energies, silenceBelow)
  }

  /** Gaps-and-islands merge of voiced frames into segments (frame_no −
    * row_number island key, the q224 streak idiom — one keyed window,
    * no self-join) — shared by the byte-stub [[vadSegments]] and the
    * real-codec [[vadSegmentsAudio]] so the two paths cannot drift.
    * Input: (id, frame_no, energy). Output: (id, seg_no 1-based by
    * start, start_frame, end_frame, n_frames).
    */
  private def segmentVoiced(
      energies: DataFrame, silenceBelow: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val voiced = energies.filter(col("energy") >= silenceBelow)
    val wIsl = Window.partitionBy("id").orderBy("frame_no")
    val seg = voiced
      .withColumn("_isl", col("frame_no") - row_number().over(wIsl))
      .groupBy("id", "_isl")
      .agg(min(col("frame_no")).as("start_frame"),
        max(col("frame_no")).as("end_frame"),
        count(lit(1)).as("n_frames"))
    seg
      .withColumn("seg_no", row_number().over(
        Window.partitionBy("id").orderBy("start_frame")).cast("long"))
      .select("id", "seg_no", "start_frame", "end_frame", "n_frames")
  }

  /** Decoded PCM audio: interleaved samples mixed down to MONO by
    * integer channel average (Java truncating division), 16-bit range
    * [-32768, 32767] (8-bit input is centered to that range ×256).
    */
  case class AudioPcm(sampleRate: Int, channels: Int, mono: Array[Int])

  trait AudioCodec extends Serializable {
    /** None = not decodable audio (corrupt, truncated, wrong format). */
    def decode(bytes: Array[Byte]): Option[AudioPcm]
  }

  /** REAL audio decoder for RIFF/WAVE PCM (the uncompressed-audio
    * interchange format) — a pure-JDK chunk-walking parser, the
    * [[ImageIoCodec]] precedent applied to audio (reference scope:
    * id3c stores specimen metadata, not audio; this is the
    * training-data-pipeline half of the library). Supports PCM
    * (format 1) at 8-bit unsigned / 16-bit signed little-endian, any
    * channel count (mixed to mono); anything else — malformed RIFF,
    * float/ADPCM formats, truncated chunks — is None, never a throw.
    */
  object WavPcmCodec extends AudioCodec {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

    def decode(bytes: Array[Byte]): Option[AudioPcm] = {
      if (bytes == null || bytes.length < 44) return None
      if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      var pos = 12
      var channels = 0; var rate = 0; var bits = 0
      var dataAt = -1; var dataLen = 0
      while (pos + 8 <= bytes.length) {
        val id = tag(bytes, pos)
        val sz = le32(bytes, pos + 4)
        // subtraction form: `pos + 8 + sz` overflows Int for a corrupt
        // ~2^31 size field and would wrap PAST this guard (review r8)
        if (sz < 0 || sz > bytes.length - pos - 8) return None // truncated
        if (id == "fmt " && sz >= 16) {
          if (le16(bytes, pos + 8) != 1) return None // PCM only
          channels = le16(bytes, pos + 10)
          rate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
        } else if (id == "data") { dataAt = pos + 8; dataLen = sz }
        pos += 8 + sz + (sz & 1) // chunks pad to even
      }
      if (channels <= 0 || rate <= 0 || dataAt < 0) return None
      if (bits != 8 && bits != 16) return None
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * channels
      val nFrames = dataLen / frameBytes
      val mono = new Array[Int](nFrames)
      var f = 0
      while (f < nFrames) {
        var s = 0; var c = 0
        while (c < channels) {
          val at = dataAt + f * frameBytes + c * bytesPerSample
          s += (if (bits == 16) le16(bytes, at).toShort.toInt
                else ((bytes(at) & 0xff) - 128) * 256)
          c += 1
        }
        mono(f) = s / channels
        f += 1
      }
      Some(AudioPcm(rate, channels, mono))
    }
  }

  /** [[vadSegments]] with the REAL codec: decode each blob's PCM once
    * per row inside the same mapPartitions seam, cut it into
    * `frameSamples`-sample frames, energy = integer RMS
    * (isqrt(Σ s² / n) — deterministic: integer division before the
    * exact integer square root), then the SHARED gaps-and-islands
    * segmentation. Undecodable blobs contribute zero frames, so they
    * surface as audio with no voiced segments — the [[resizeImage]]
    * empty-blob convention.
    */
  def vadSegmentsAudio(
      blobs: Dataset[Blob], frameSamples: Int = 1024,
      silenceBelow: Long = 1L,
      codec: AudioCodec = WavPcmCodec): DataFrame = {
    require(frameSamples > 0, s"frameSamples $frameSamples must be > 0")
    implicit val enc = Encoders.product[FrameEnergy]
    val energies = blobs.mapPartitions { it =>
      it.flatMap { b =>
        codec.decode(b.content) match {
          case None => Iterator.empty
          case Some(pcm) =>
            val n = pcm.mono.length
            Iterator.range(0, n / frameSamples + (if (n % frameSamples > 0) 1 else 0))
              .map { fno =>
                val from = fno * frameSamples
                val to = math.min(from + frameSamples, n)
                var sq = 0L; var i = from
                while (i < to) {
                  val s = pcm.mono(i).toLong; sq += s * s; i += 1
                }
                FrameEnergy(b.id, fno.toLong, isqrt(sq / (to - from)))
              }
        }
      }
    }.toDF()
    segmentVoiced(energies, silenceBelow)
  }

  /** Exact integer floor square root (Math.sqrt seeds, integer
    * fix-up — immune to double rounding at the 2^52 boundary).
    */
  private[operators] def isqrt(x: Long): Long = {
    if (x < 0) return 0L
    var r = math.sqrt(x.toDouble).toLong
    while (r > 0 && r * r > x) r -= 1
    while ((r + 1) * (r + 1) <= x) r += 1
    r
  }

  case class FrameHash(id: Long, frame_no: Long, phash: Long)

  /** Scene-cut detection over "video" blobs — the shot-segmentation
    * pass a video-training pipeline runs before per-scene sampling:
    * sample frames ([[sampleFrames]]), fingerprint each with the
    * [[aHash]] construction, and mark a cut wherever consecutive
    * frames' hashes differ by more than `cutDist` hamming bits (the
    * classic perceptual-hash shot-boundary heuristic; with a real
    * decoder in [[resizeStub]]'s place this is production shot
    * detection).
    *
    * Shape: frame explode (per-row, no shuffle) → partition-batched
    * hashing (one kernel init per partition, like [[extractFeatures]])
    * → ONE keyed window per video (`lag` over frame_no — never a
    * global window). Frames never shuffle their bytes: the window
    * carries only (id, frame_no, phash).
    *
    * Output: (id, frame_no, phash, dist — hamming to previous frame,
    * NULL on each video's first frame; is_cut — dist > cutDist, false
    * on first frames).
    */
  def sceneCuts(
      df: DataFrame, frameBytes: Int = 64, stride: Int = 4,
      bits: Int = 16, cutDist: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bits > 0 && bits <= 32, s"bits $bits must be in (0, 32]")
    val frames = sampleFrames(df, frameBytes, stride)
    implicit val enc = Encoders.product[FrameHash]
    implicit val encIn =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.BINARY)
    val hashed = frames
      .select(col("id").cast("long").as("id"),
        col("frame_no").cast("long").as("frame_no"), col("frame_bytes"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() — once per partition
        it.map { case (id, fno, bytes) =>
          if (bytes == null || bytes.isEmpty) FrameHash(id, fno, 0L)
          else {
            val m = resizeStub(bytes, bits)
            val s = m.map(_.toLong).sum
            var h = 0L; var k = 0
            while (k < bits) {
              if (m(k).toLong * bits >= s) h |= (1L << k); k += 1
            }
            FrameHash(id, fno, h)
          }
        }
      }.toDF()
    val w = Window.partitionBy("id").orderBy("frame_no")
    hashed
      .withColumn("dist",
        bit_count(col("phash").bitwiseXOR(lag(col("phash"), 1).over(w)))
          .cast("long"))
      .withColumn("is_cut", coalesce(col("dist") > cutDist, lit(false)))
  }
}

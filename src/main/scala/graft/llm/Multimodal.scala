package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque BINARY columns with a typed metadata struct alongside
  * (`modality`, byte size, decoded dimensions).
  *
  * The metadata codecs are REAL for all three modalities:
  * [[decodeImageHeader]] reads width/height via `javax.imageio`,
  * [[decodeAudioHeader]] reads rate/channels/frames from WAV/AIFF/AU via
  * `javax.sound.sampled` (both JDK stdlib), and [[decodeMp4Header]]
  * walks the ISO BMFF box tree directly for MP4 width/height/frame-count
  * (no video lib exists anywhere in the JDK; the container metadata is a
  * specified binary format, so the engine parses it itself). All three
  * are header-only — cost is O(header) per row at any scale. IMAGES
  * additionally get a full PIXEL path ([[transformImages]]: real
  * decode → nearest-neighbor resize → real PNG re-encode, gated at
  * pixel depth by q205's arithmetic-raster oracle); PCM/video SAMPLE
  * decoding stays out of scope (that genuinely needs a codec library);
  * payloads that don't parse (e.g. the text-byte stand-ins in the
  * fixture corpus) fall back to the deterministic [[fakeDecode]] stub,
  * keeping the pipeline total. The Spark-side
  * plumbing is what the tests check: binary schema, batched
  * per-partition processing (the Scala analog of `mapInPandas` — one
  * iterator pass per partition, no per-row task overhead), and typed
  * metadata projection.
  */
object Multimodal {

  /** A decoded-media record: replace [[fakeDecode]]'s body with a real codec
    * to make this production-grade; nothing else changes. */
  final case class MediaMeta(id: Long, modality: String, numBytes: Long,
                             width: Int, height: Int, nFrames: Int)

  /** Attach a binary payload column + modality tag to any df (here the
    * payload is the UTF-8 text bytes — a stand-in for real image bytes). */
  def withBinaryPayload(df: DataFrame, idCol: String, srcCol: String,
                        modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(srcCol).cast("binary").as("payload"),
      lit(modality).as("modality"))

  /** STUB codec: deterministic pseudo-dimensions from payload size/content.
    * A real implementation would decode image headers here. */
  def fakeDecode(id: Long, modality: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val w = (n % 640 + 1).toInt
    val h = ((n / 640) % 480 + 1).toInt
    val f = if (modality == "video") (n % 30 + 1).toInt else 1
    MediaMeta(id, modality, n, w, h, f)
  }

  /** REAL image codec (header-only): width/height from the payload's
    * actual image header via `javax.imageio`. Returns None when no
    * installed reader recognizes the bytes — the caller falls back to the
    * stub so a corrupt row degrades instead of failing the partition.
    * Header-only reads never materialize the pixel raster, so a 50 MB
    * JPEG costs the same few KB of I/O as a thumbnail. */
  // ImageIO defaults to a DISK-backed temp-file cache for every
  // createImageInputStream call — per-row file create/delete in a decode
  // stage (measured as most of q60's 7.8× wall at 32× data). Payloads
  // are already in memory; use memory-cache streams. JVM-global, set
  // once at class load.
  javax.imageio.ImageIO.setUseCache(false)

  def decodeImageHeader(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis, true); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } finally iis.close()
      // ImageIO readers throw RuntimeExceptions (IllegalArgument, CMM,
      // IndexOutOfBounds) on malformed headers, not just IOException —
      // NonFatal keeps the "corrupt row degrades, never fails the
      // partition" contract total.
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio codec (header-only): sample rate / channels / frame count
    * from a WAV/AIFF/AU payload via `javax.sound.sampled` (JDK stdlib).
    * Frame count maps onto MediaMeta as nFrames; `width` carries the
    * sample rate and `height` the channel count, matching the "typed
    * dims" contract the downstream pipeline reads. */
  def decodeAudioHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length == 0) return None
    // WAV fast path: parse the RIFF container directly (the q88 box-walker
    // approach). javax.sound's AudioSystem entry points funnel EVERY call
    // through a synchronized JVM-global provider lookup
    // (JDK13Services.getProviders), which serializes all executor threads
    // of a decode stage — measured as a flat ~16 s wall on the q87 chain
    // at 32× data regardless of partitioning. RIFF/WAVE is a
    // fully-specified fixed binary layout; AIFF/AU and other formats
    // still take the javax.sound path below.
    parseWavHeader(payload).orElse {
      try {
        val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val af = fmt.getFormat
        val frames = fmt.getFrameLength
        Some((af.getSampleRate.toInt, af.getChannels,
          if (frames >= 0) frames else 0))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Direct RIFF/WAVE header parse: (sampleRate, channels, frames) from
    * the `fmt ` chunk + `data` chunk size (frames = dataSize/blockAlign).
    * Chunk-walks with bounds checks; anything malformed → None. */
  def parseWavHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u16(o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def tag(o: Int, s: String): Boolean =
      o + 4 <= p.length && (0 until 4).forall(i => p(o + i) == s.charAt(i).toByte)
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var rate = -1; var ch = -1; var blockAlign = -1; var dataSize = -1L
    while (off + 8 <= p.length && (rate < 0 || dataSize < 0)) {
      val sz = u32(off + 4)
      if (tag(off, "fmt ") && off + 8 + 16 <= p.length) {
        ch = u16(off + 10)
        rate = u32(off + 12).toInt
        blockAlign = u16(off + 20)
      } else if (tag(off, "data")) dataSize = sz
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + sz.toInt + (sz.toInt & 1)
      if (sz < 0 || sz > p.length) return None
    }
    if (rate > 0 && ch > 0 && blockAlign > 0 && dataSize >= 0)
      Some((rate, ch, (dataSize / blockAlign).toInt))
    else None
  }

  /** REAL video metadata codec (header-only): width/height/frame-count
    * from an MP4 payload by walking the ISO BMFF box tree — no JDK or
    * external video library exists, but the container METADATA is a
    * fully-specified binary format, so the engine parses it directly:
    * `ftyp` guard → `moov` → per-`trak`: `hdlr` handler `vide`, `tkhd`
    * width/height (16.16 fixed-point), `stbl/stsz` sample count (= frame
    * count). Every offset is bounds-checked; anything malformed → None
    * and the caller's stub fallback. Pixel DECODING stays out of scope
    * (that genuinely needs a codec library); this makes the video
    * modality's metadata path as real as image/audio's. */
  def decodeMp4Header(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload == null || payload.length < 16) return None
    def u32(o: Int): Long =
      if (o + 4 > payload.length) -1L
      else ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def typ(o: Int): String =
      if (o + 4 > payload.length) "" else new String(payload, o, 4, "ISO-8859-1")

    // children of a container box as (type, payloadStart, payloadEnd)
    def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var o = from
      while (o + 8 <= to) {
        val size = u32(o)
        if (size < 8 || o + size > to) return out.result()  // malformed: stop
        out += ((typ(o + 4), o + 8, o + size.toInt))
        o += size.toInt
      }
      out.result()
    }

    val top = boxes(0, payload.length)
    if (top.headOption.forall(_._1 != "ftyp")) return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    val traks = boxes(moov._2, moov._3).filter(_._1 == "trak")
    traks.flatMap { case (_, s, e) =>
      val kids = boxes(s, e)
      val mdia = kids.find(_._1 == "mdia")
      val isVideo = mdia.exists { case (_, ms, me) =>
        boxes(ms, me).exists { case (t, hs, he) =>
          t == "hdlr" && he - hs >= 12 && typ(hs + 8) == "vide" }
      }
      val tkhd = kids.find(_._1 == "tkhd")
      val frames = mdia.toSeq.flatMap { case (_, ms, me) =>
        for {
          (_, is, ie) <- boxes(ms, me).filter(_._1 == "minf")
          (_, bs, be) <- boxes(is, ie).filter(_._1 == "stbl")
          (t, zs, ze) <- boxes(bs, be) if t == "stsz" && ze - zs >= 12
        } yield u32(zs + 8).toInt
      }.headOption
      tkhd match {
        // v0 tkhd payload: width/height are 16.16 fixed at offsets 76/80
        case Some((_, ts, te)) if isVideo && te - ts >= 84 =>
          val w = (u32(ts + 76) >> 16).toInt
          val h = (u32(ts + 80) >> 16).toInt
          if (w > 0 && h > 0) Some((w, h, frames.getOrElse(0))) else None
        case _ => None
      }
    }.headOption
  }

  /** Deterministic minimal-MP4 synthesis — the encoder counterpart of
    * [[decodeMp4Header]] (ftyp + moov/trak/tkhd/hdlr(vide)/stbl/stsz),
    * for end-to-end encode→decode gates. */
  def synthMp4(width: Int, height: Int, frames: Int): Array[Byte] = {
    def u32(v: Long) = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array
    def box(t: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      u32(8L + body.length) ++ t.getBytes("ISO-8859-1") ++ body
    }
    val tkhd = box("tkhd", new Array[Byte](76),
      u32(width.toLong << 16), u32(height.toLong << 16))
    val hdlr = box("hdlr", new Array[Byte](8), "vide".getBytes("ISO-8859-1"))
    val stsz = box("stsz", new Array[Byte](4), u32(0), u32(frames.toLong))
    val mdia = box("mdia", hdlr, box("minf", box("stbl", stsz)))
    box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0)) ++
      box("moov", box("trak", tkhd, mdia))
  }

  /** Deterministic 16-bit PCM WAV synthesis through the real
    * `javax.sound.sampled` ENCODER — the counterpart of
    * [[decodeAudioHeader]] for end-to-end encode→decode gates. Sample
    * content is a fixed byte ramp; only the header parameters matter. */
  def synthWav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    // canonical 44-byte RIFF/WAVE header + PCM16LE payload, written
    // directly: AudioSystem.write pays the same synchronized JVM-global
    // provider lookup as the decode side (see decodeAudioHeader) —
    // per-row encodes serialized across every executor thread. The
    // emitted container is the identical canonical layout the JDK's
    // WAVE writer produces (MultimodalSpec round-trips it through the
    // javax.sound reader to prove it).
    val blockAlign = channels * 2
    val dataSize = frames * blockAlign
    val out = new Array[Byte](44 + dataSize)
    def tag(o: Int, s: String): Unit =
      (0 until 4).foreach(i => out(o + i) = s.charAt(i).toByte)
    def u16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def u32(o: Int, v: Long): Unit = (0 until 4).foreach(i =>
      out(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    tag(0, "RIFF"); u32(4, 36L + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); u32(16, 16L); u16(20, 1 /* PCM */); u16(22, channels)
    u32(24, sampleRate.toLong); u32(28, sampleRate.toLong * blockAlign)
    u16(32, blockAlign); u16(34, 16 /* bits */)
    tag(36, "data"); u32(40, dataSize.toLong)
    var i = 0
    while (i < dataSize) { out(44 + i) = (i * 31).toByte; i += 1 }
    out
  }

  /** Dispatch: real header codecs for all three modalities — image via
    * ImageIO, audio via javax.sound, video via the ISO BMFF box walker
    * [[decodeMp4Header]] — with the deterministic stub as fallback for
    * payloads that don't parse. */
  def decode(id: Long, modality: String, payload: Array[Byte]): MediaMeta =
    modality match {
      case "image" => decodeImageHeader(payload) match {
        case Some((w, h)) => MediaMeta(id, modality, payload.length.toLong, w, h, 1)
        case None         => fakeDecode(id, modality, payload)
      }
      case "audio" => decodeAudioHeader(payload) match {
        case Some((rate, ch, frames)) =>
          MediaMeta(id, modality, payload.length.toLong, rate, ch, frames)
        case None => fakeDecode(id, modality, payload)
      }
      case "video" => decodeMp4Header(payload) match {
        case Some((w, h, frames)) =>
          MediaMeta(id, modality, payload.length.toLong, w, h, frames)
        case None => fakeDecode(id, modality, payload)
      }
      case _ => fakeDecode(id, modality, payload)
    }

  /** Batched decode over partitions — the mapInPandas-shaped path: each
    * partition is processed as one iterator (batch), keeping codec setup
    * cost per-partition rather than per-row.
    *
    * The input is REPARTITIONED up to the session's shuffle parallelism
    * when it arrives narrower: a codec stage is CPU-bound per row, and a
    * compactly-written source (one parquet file under
    * maxPartitionBytes) would otherwise funnel every decode through one
    * task — measured 46× wall at 32× data on the q87 audio chain before
    * this. The repartition shuffles only (id, modality, payload) rows,
    * which the decode pass must move anyway. */
  def decodeBatched(df: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val slim = df.select(col("id"), col("modality"), col("payload"))
    val wide = if (slim.rdd.getNumPartitions < p) slim.repartition(p) else slim
    wide.as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (ImageIO reader caches
        // are JVM-global; nothing further to set up for the image path)
        it.map { case (id, mod, bytes) => decode(id, mod, bytes) }
      }
  }

  /** Frame sampling plumbing for video-like payloads: emit every k-th
    * "frame index" as its own row (posexplode over a generated index array —
    * pure plan, no driver loop). */
  def sampleFrames(meta: DataFrame, everyK: Int): DataFrame =
    meta.select(col("id"), col("nFrames"),
        posexplode(sequence(lit(0), col("nFrames") - 1)).as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % everyK === 0)
      .select("id", "frame_idx")

  /** Resize stage over METADATA only (cheap planning pass for payloads
    * the engine won't re-encode — video/audio; images have the real
    * pixel path in [[transformImages]]): proportional fit into a
    * maxW x maxH box, ceil-rounded, never upscaled — the standard
    * thumbnailing contract. NOTE the rounding difference from
    * [[fitDims]]: this ceil-rounds (metadata estimate), fitDims
    * floor-rounds (must match the oracle's truncating division). */
  def resizeMeta(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    meta
      .withColumn("resized_width", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_height", ceil(col("height") * scale).cast("int"))
  }

  /** A pixel-transformed image row: original and fitted dimensions plus
    * the re-encoded PNG payload. */
  final case class ImageOut(id: Long, in_w: Int, in_h: Int,
                            out_w: Int, out_h: Int, payload: Array[Byte])

  /** Deterministic synthetic PNG — REAL encoder (`javax.imageio`), pixel
    * values pure integer arithmetic of (id, x, y):
    * R=(id+3x+5y)%256, G=(2id+x+y)%256, B=(7id+11x+13y)%256. Because
    * the raster is arithmetic, an ORACLE can re-derive any downstream
    * pixel computation without decoding anything — the q87 synthWav
    * encode-under-oracle recipe at pixel level. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + 3L * x + 5L * y) % 256).toInt
        val g = ((2L * id + x + y) % 256).toInt
        val b = ((7L * id + 11L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Integer thumbnail-fit dimensions: proportional fit into maxW×maxH,
    * never upscaled, floor 1. The scale is the exact RATIONAL
    * min(maxW/w, maxH/h) applied with truncating integer division only
    * — no float, so DuckDB `//` replays it bit-for-bit (the same
    * cross-engine contract as the q201 fixed-point trainer). */
  def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxW > 0 && maxH > 0)
    if (w <= maxW && h <= maxH) (w, h)
    else {
      val widthLimits = w.toLong * maxH >= h.toLong * maxW
      val (num, den) = if (widthLimits) (maxW, w) else (maxH, h)
      (math.max(1, (w.toLong * num / den).toInt),
        math.max(1, (h.toLong * num / den).toInt))
    }
  }

  /** PIXEL-LEVEL image transform: REAL decode (`ImageIO.read` — the full
    * raster, not the header), nearest-neighbor resize to [[fitDims]]
    * with integer source mapping sx = x·w/outW (truncating — the only
    * resampling an oracle can replay exactly; bilinear would tie the
    * gate to AWT's filter internals), REAL re-encode as PNG. PNG is
    * lossless, so the output raster is a pure arithmetic function of
    * the input raster — which is what lets q205's DuckDB oracle check
    * actual pixels through two real codec round trips. */
  def resizePng(payload: Array[Byte], maxW: Int, maxH: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "resizePng: payload is not a decodable image")
    encodePng(nearestNeighbor(img, maxW, maxH))
  }

  private def nearestNeighbor(img: java.awt.image.BufferedImage,
                              maxW: Int, maxH: Int): java.awt.image.BufferedImage = {
    val (iw, ih) = (img.getWidth, img.getHeight)
    val (ow, oh) = fitDims(iw, ih, maxW, maxH)
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * ih / oh).toInt
      var x = 0
      while (x < ow) {
        out.setRGB(x, y, img.getRGB((x.toLong * iw / ow).toInt, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    out
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Position-weighted raster signature of an encoded image:
    * Σ_pixels (pos+1)·(R·65536 + G·256 + B), pos in row-major order —
    * order-sensitive (a transposed or shuffled raster changes it),
    * integer-exact, and derivable by an oracle when the pixels are
    * arithmetic ([[synthPng]]). Decodes with the REAL codec, so a lossy
    * or corrupted encode upstream changes the value. */
  def pngPixelSignature(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "pngPixelSignature: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var sig = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sig += (y.toLong * w + x + 1) * (img.getRGB(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    sig
  }

  /** Batched pixel-transform stage over a (id, payload) frame — the
    * mapInPandas-shaped path, same repartition-up guard as
    * [[decodeBatched]] (a transform stage is CPU-bound per row; a
    * single-file source would otherwise funnel every decode through one
    * task). Each row: real decode → nearest-neighbor fit into
    * maxW×maxH → real PNG re-encode. */
  def transformImages(df: DataFrame, maxW: Int, maxH: Int,
                      partitions: Int = 0): Dataset[ImageOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val slim = df.select(col("id"), col("payload"))
    val wide = if (slim.rdd.getNumPartitions < p) slim.repartition(p) else slim
    wide.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"transformImages: undecodable payload, id=$id")
        val resized = nearestNeighbor(img, maxW, maxH)
        ImageOut(id, img.getWidth, img.getHeight,
          resized.getWidth, resized.getHeight, encodePng(resized))
      }
    }
  }

  /** Feature-extraction stage STUB: a deterministic `dim`-dim float
    * embedding derived from the payload bytes (per-dimension xxhash64 of
    * payload + dim index, scaled to [-1, 1]). A real model server / ONNX
    * batch would slot in here; everything downstream (ANN, near-dup,
    * clustering over [[graft.llm.Similarity]]) consumes the column
    * unchanged. */
  def fakeEmbedding(payload: Column, dim: Int): Column =
    array((0 until dim).map { d =>
      (xxhash64(lit(d), payload).cast("double") / lit(Long.MaxValue.toDouble))
        .cast("float")
    }: _*)
}

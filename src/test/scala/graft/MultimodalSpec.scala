package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: payload schema, batched decode, frame
  * sampling (codec itself is stubbed per the build brief — the Spark-side
  * shape is what's under test). */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a" * 1000), (2L, "b" * 64), (3L, "c" * 2000)
  ).toDF("doc_id", "text")

  test("withBinaryPayload produces (id, payload binary, modality)") {
    val p = Multimodal.withBinaryPayload(docs, "doc_id", "text", "image")
    assert(p.schema("payload").dataType.typeName == "binary")
    val r = p.filter($"id" === 1).head
    assert(r.getAs[Array[Byte]]("payload").length == 1000)
  }

  test("decodeBatched: numBytes exact, dimensions deterministic") {
    val meta = Multimodal.decodeBatched(
      Multimodal.withBinaryPayload(docs, "doc_id", "text", "video")).toDF()
    val m = meta.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(m(1L).getAs[Long]("numBytes") == 1000L)
    assert(m(1L).getAs[Int]("width") == (1000 % 640 + 1))
    assert(m(1L).getAs[Int]("height") == ((1000 / 640) % 480 + 1))
    assert(m(1L).getAs[Int]("nFrames") == (1000 % 30 + 1))
  }

  test("image modality decodes REAL dimensions from PNG/JPEG bytes, stub fallback otherwise") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, x * 31 + y)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = imageBytes(17, 9, "png")
    val jpg = imageBytes(33, 21, "jpg")
    val rows = Seq(
      (1L, png, "image"),               // real PNG -> header dims
      (2L, jpg, "image"),               // real JPEG -> header dims
      (3L, "not an image".getBytes("UTF-8"), "image"),  // garbage -> stub
      (4L, png, "video")                // non-image modality -> stub always
    ).toDF("id", "payload", "modality")
    val m = Multimodal.decodeBatched(rows).collect().map(x => x.id -> x).toMap
    assert((m(1L).width, m(1L).height, m(1L).nFrames) == (17, 9, 1))
    assert((m(2L).width, m(2L).height) == (33, 21))
    assert(m(1L).numBytes == png.length.toLong)
    val g = "not an image".getBytes("UTF-8").length.toLong
    assert((m(3L).width, m(3L).height) == ((g % 640 + 1).toInt, ((g / 640) % 480 + 1).toInt))
    assert(m(4L).width == (png.length % 640 + 1))  // video ignores the image codec
    // header-only contract: a truncated PNG (header intact, data gone) still reads dims
    val truncated = png.take(64)
    assert(Multimodal.decodeImageHeader(truncated).contains((17, 9)))
  }

  test("audio modality decodes REAL rate/channels/frames from WAV bytes, stub fallback otherwise") {
    import javax.sound.sampled._
    def wavBytes(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = (i * 31).toByte)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val wav = wavBytes(16000f, 2, 1234)
    val rows = Seq(
      (1L, wav, "audio"),
      (2L, "definitely not audio bytes".getBytes("UTF-8"), "audio"),
      (3L, wav, "video")   // video modality ignores the audio codec
    ).toDF("id", "payload", "modality")
    val m = Multimodal.decodeBatched(rows).collect().map(x => x.id -> x).toMap
    assert((m(1L).width, m(1L).height, m(1L).nFrames) == (16000, 2, 1234))
    assert(m(1L).numBytes == wav.length.toLong)
    val g = "definitely not audio bytes".getBytes("UTF-8").length
    assert(m(2L).width == (g % 640 + 1))                 // garbage -> stub dims
    assert(m(3L).nFrames == (wav.length % 30 + 1))       // video -> stub frames
    // cross-validation both ways: the engine's direct RIFF writer emits a
    // container the JDK reader parses to the same parameters, and the
    // JDK writer's container parses through the engine's direct reader
    val ours = Multimodal.synthWav(12000, 1, 777)
    val jdk = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(ours))
    assert((jdk.getFormat.getSampleRate.toInt, jdk.getFormat.getChannels,
      jdk.getFrameLength) == ((12000, 1, 777)))
    assert(Multimodal.parseWavHeader(wav).contains((16000, 2, 1234)))
  }

  test("video modality decodes REAL dims/frames from MP4 boxes, stub fallback otherwise") {
    def u32(v: Long) = java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array
    def mp4box(t: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      u32(8L + body.length) ++ t.getBytes("ISO-8859-1") ++ body
    }
    // minimal valid tree: ftyp + moov{trak{tkhd(v0: 76B then 16.16 w/h),
    // mdia{hdlr(vide), minf{stbl{stsz(count)}}}}}
    val tkhd = mp4box("tkhd",
      new Array[Byte](76), u32(640L << 16), u32(360L << 16))
    val hdlr = mp4box("hdlr", new Array[Byte](8), "vide".getBytes("ISO-8859-1"))
    val stsz = mp4box("stsz", new Array[Byte](4), u32(0), u32(321))
    val mdia = mp4box("mdia", hdlr, mp4box("minf", mp4box("stbl", stsz)))
    val mp4 = mp4box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0)) ++
      mp4box("moov", mp4box("trak", tkhd, mdia))
    assert(Multimodal.decodeMp4Header(mp4).contains((640, 360, 321)))
    val rows = Seq(
      (1L, mp4, "video"),
      (2L, "not an mp4 at all, just text".getBytes("UTF-8"), "video"),
      (3L, mp4.take(40), "video")   // truncated moov: falls back, no crash
    ).toDF("id", "payload", "modality")
    val m = Multimodal.decodeBatched(rows).collect().map(x => x.id -> x).toMap
    assert((m(1L).width, m(1L).height, m(1L).nFrames) == (640, 360, 321))
    val g = "not an mp4 at all, just text".getBytes("UTF-8").length
    assert(m(2L).width == (g % 640 + 1))
    assert(m(3L).nFrames == (40 % 30 + 1))
    // audio-only mp4 (hdlr 'soun') must NOT report video dims
    val soun = mp4box("mdia", mp4box("hdlr", new Array[Byte](8), "soun".getBytes("ISO-8859-1")))
    val audioMp4 = mp4box("ftyp", "isom".getBytes("ISO-8859-1"), u32(0)) ++
      mp4box("moov", mp4box("trak", tkhd, soun))
    assert(Multimodal.decodeMp4Header(audioMp4).isEmpty)
  }

  test("resizeMeta: proportional fit, ceil-rounded, never upscales") {
    val meta = Seq((1L, 640, 480), (2L, 100, 50), (3L, 1280, 240))
      .toDF("id", "width", "height")
    val r = Multimodal.resizeMeta(meta, 320, 240).collect()
      .map(x => x.getLong(0) -> (x.getAs[Int]("resized_width"), x.getAs[Int]("resized_height"))).toMap
    assert(r(1) == (320, 240))   // exact half scale
    assert(r(2) == (100, 50))    // smaller than box: untouched
    assert(r(3) == (320, 60))    // width-bound: 0.25 scale
  }

  test("fakeEmbedding is deterministic, dim-sized, in [-1,1]") {
    val p = Multimodal.withBinaryPayload(docs, "doc_id", "text", "image")
    val e1 = p.select($"id", Multimodal.fakeEmbedding($"payload", 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val e2 = p.select($"id", Multimodal.fakeEmbedding($"payload", 16).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(e1 == e2)
    assert(e1.values.forall(v => v.size == 16 && v.forall(f => f >= -1f && f <= 1f)))
    assert(e1(1L) != e1(2L))  // different payloads -> different vectors
  }

  test("pixel transform: PNG round trip is lossless, NN resample matches " +
      "the arithmetic raster, corrupt payloads fail loudly") {
    // 4x2 synth image decoded back: every pixel equals the arithmetic def
    val png = Multimodal.synthPng(9L, 4, 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until 2; x <- 0 until 4) {
      val expect = (((9L + 3 * x + 5 * y) % 256) << 16 |
        ((2 * 9L + x + y) % 256) << 8 | ((9L * 7 + 11 * x + 13 * y) % 256)).toInt
      assert((img.getRGB(x, y) & 0xffffff) == expect, s"pixel ($x,$y)")
    }
    // fitDims: untouched when inside the box; exact rational fit outside
    assert(Multimodal.fitDims(8, 6, 10, 10) == (8, 6))
    assert(Multimodal.fitDims(24, 6, 10, 10) == (10, 2))
    assert(Multimodal.fitDims(6, 24, 10, 10) == (2, 10))
    assert(Multimodal.fitDims(1000, 1, 10, 10) == (10, 1))   // floor 1 guard
    // resize 4x2 -> fit 2x2 box: out 2x1, sx = x*4/2, sy = y*2/1
    val sig = Multimodal.pngPixelSignature(Multimodal.resizePng(png, 2, 2))
    def pix(x: Int, y: Int) = ((9L + 3 * x + 5 * y) % 256) * 65536 +
      ((2 * 9L + x + y) % 256) * 256 + ((9L * 7 + 11 * x + 13 * y) % 256)
    assert(sig == 1L * pix(0, 0) + 2L * pix(2, 0))
    // the signature is position-weighted: a transposed raster differs
    val tall = Multimodal.synthPng(9L, 2, 4)
    assert(Multimodal.pngPixelSignature(tall) != Multimodal.pngPixelSignature(
      Multimodal.synthPng(9L, 4, 2)))
    // an undecodable payload raises instead of producing garbage rows
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    intercept[Exception](Multimodal.transformImages(bad, 10, 10).collect())
    // distributed path == local arithmetic on the fixture-shaped frame
    val framed = Seq((3L, Multimodal.synthPng(3L, 16, 12)),
      (4L, Multimodal.synthPng(4L, 8, 6))).toDF("id", "payload")
    val out = Multimodal.transformImages(framed, 10, 10).collect()
      .map(o => o.id -> ((o.in_w, o.in_h), (o.out_w, o.out_h))).toMap
    assert(out(3L) == ((16, 12), (10, 7)) && out(4L) == ((8, 6), (8, 6)))
  }

  test("sampleFrames emits every k-th frame index") {
    val meta = Multimodal.decodeBatched(
      Multimodal.withBinaryPayload(docs, "doc_id", "text", "video")).toDF()
    val frames = Multimodal.sampleFrames(meta, everyK = 5)
    val f1 = frames.filter($"id" === 1).select("frame_idx")
      .collect().map(_.getInt(0)).sorted.toSeq
    val n1 = 1000 % 30 + 1  // 11 frames -> 0,5,10
    assert(f1 == (0 until n1 by 5).toSeq)
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow

/** Adversarial-input suite for the media header decoders (round-4 VERDICT
  * item): random byte mutations of VALID WAV/MP4/PNG/GIF/JPEG headers plus
  * crafted hostile headers (declared sizes beyond the buffer, sub-header
  * box sizes, zero timescale, largesize overflow). The contract under
  * test: `decode` and the per-format decoders are TOTAL — they return
  * None / decode_ok=false on garbage, terminate, and never throw or index
  * out of bounds. The round-3 self-review found two bugs of exactly this
  * class by hand (WAV walker Int overflow, truncated-fmt garbage decode);
  * this generator locks the class.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(result.passed, result.status.toString)
  }

  private val byteGen: Gen[Byte] = Gen.chooseNum(-128, 127).map(_.toByte)
  private val tailGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, byteGen).map(_.toArray))

  /** One valid payload of a random modality. */
  private val validGen: Gen[(String, Array[Byte])] = for {
    w <- Gen.chooseNum(1, 4096)
    h <- Gen.chooseNum(1, 4096)
    tail <- tailGen
    channels <- Gen.chooseNum(1, 8)
    rate <- Gen.chooseNum(8000, 192000)
    ts <- Gen.chooseNum(1, 1000000)
    dur <- Gen.chooseNum(0L, 1000000000L)
    p <- Gen.oneOf(
      ("image", Multimodal.pngBytes(w, h, tail)),
      ("image", Multimodal.gifBytes(math.min(w, 65535), math.min(h, 65535), tail)),
      ("image", Multimodal.jpegBytes(math.min(w, 65535), math.min(h, 65535), tail)),
      ("audio", Multimodal.wavBytes(channels, rate, tail)),
      ("video", Multimodal.mp4Bytes(w, h, ts, dur, tail)))
  } yield p

  /** Random structural mutation of a payload: byte flips, truncation,
    * junk extension, and 32-bit size-field smashes (0xFFFFFFFF / 0 /
    * 0x80000000 at arbitrary offsets — the size/length fields every
    * container format carries).
    */
  private def mutatedGen: Gen[(String, Array[Byte])] = for {
    (kind, base) <- validGen
    mutated <- Gen.oneOf(
      // flip 1-8 random bytes
      for {
        n <- Gen.chooseNum(1, 8)
        idxs <- Gen.listOfN(n, Gen.chooseNum(0, base.length - 1))
        vals <- Gen.listOfN(n, byteGen)
      } yield {
        val b = base.clone()
        idxs.zip(vals).foreach { case (i, v) => b(i) = (b(i) ^ v).toByte }
        b
      },
      // truncate at a random index (headers cut mid-field)
      Gen.chooseNum(0, base.length).map(base.take),
      // extend with junk (trailing garbage after valid structure)
      tailGen.map(base ++ _),
      // smash a 32-bit field with a hostile size at a random aligned offset
      for {
        off <- Gen.chooseNum(0, math.max(0, base.length - 4))
        v <- Gen.oneOf(0xFFFFFFFFL, 0L, 0x80000000L, 1L, 7L)
      } yield {
        val b = base.clone()
        b(off) = ((v >>> 24) & 0xFF).toByte
        b(off + 1) = ((v >>> 16) & 0xFF).toByte
        b(off + 2) = ((v >>> 8) & 0xFF).toByte
        b(off + 3) = (v & 0xFF).toByte
        b
      })
  } yield (kind, mutated)

  test("decoders are total under random mutations of valid headers") {
    check(Prop.forAll(mutatedGen) { case (kind, bytes) =>
      // per-format decoders: must return an Option, never throw
      Multimodal.decodeImage(bytes)
      Multimodal.decodeWav(bytes)
      Multimodal.decodeMp4(bytes)
      // full dispatch under every kind label (kind can lie about payload)
      Seq("image", "audio", "video").forall { k =>
        val f = Multimodal.decode(MediaRow(1L, k, bytes))
        // failed decodes are isolated rows, sane fields either way
        f.n_bytes == bytes.length && f.width >= 0 && f.height >= 0 &&
          f.channels >= 0 && f.sample_rate >= 0 && f.duration_ms >= 0L
      }
    })
  }

  test("decoders are total on arbitrary byte noise") {
    val noiseGen = Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, byteGen).map(_.toArray))
    check(Prop.forAll(noiseGen) { bytes =>
      Multimodal.decodeImage(bytes)
      Multimodal.decodeWav(bytes)
      Multimodal.decodeMp4(bytes)
      Seq("image", "audio", "video").forall(k =>
        !Multimodal.decode(MediaRow(1L, k, bytes)).decode_ok ||
          bytes.length >= 10) // tiny buffers can never decode_ok
    })
  }

  test("crafted hostile containers terminate cleanly") {
    def be32At(b: Array[Byte], i: Int, v: Long): Unit = {
      b(i) = ((v >>> 24) & 0xFF).toByte; b(i + 1) = ((v >>> 16) & 0xFF).toByte
      b(i + 2) = ((v >>> 8) & 0xFF).toByte; b(i + 3) = (v & 0xFF).toByte
    }
    def le32At(b: Array[Byte], i: Int, v: Long): Unit = {
      b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >>> 8) & 0xFF).toByte
      b(i + 2) = ((v >>> 16) & 0xFF).toByte; b(i + 3) = ((v >>> 24) & 0xFF).toByte
    }
    // WAV: declared fmt chunk size 0xFFFFFFFF — Long walk must terminate,
    // never wrap negative (the round-3 overflow class)
    val wavHuge = Multimodal.wavBytes(2, 44100, Array.fill[Byte](16)(0))
    le32At(wavHuge, 16, 0xFFFFFFFFL) // fmt ckSize
    assert(Multimodal.decodeWav(wavHuge).isEmpty)
    // WAV: fmt chunk declared shorter than the 16 PCM fields
    val wavShortFmt = Multimodal.wavBytes(2, 44100, Array.empty)
    le32At(wavShortFmt, 16, 15L)
    assert(Multimodal.decodeWav(wavShortFmt).isEmpty)
    // WAV: data chunk size huge (beyond buffer) — declared duration still
    // reported (real probes trust the header), no overflow
    val wavHugeData = Multimodal.wavBytes(2, 44100, Array.fill[Byte](4)(0))
    le32At(wavHugeData, 40, 0xFFFFFFF0L) // data ckSize
    val d = Multimodal.decodeWav(wavHugeData)
    assert(d.isDefined && d.get._3 > 0L, "declared-size duration, no crash")

    // MP4: box with size < header (sub-8) must stop the walk, not loop
    val mp4Tiny = Multimodal.mp4Bytes(64, 48, 1000, 5000, Array.empty)
    be32At(mp4Tiny, 16, 5L) // moov size -> 5
    Multimodal.decodeMp4(mp4Tiny) // must terminate; result irrelevant
    // MP4: size 0 (box-to-end) at the top with a declared inner overflow
    val mp4Zero = Multimodal.mp4Bytes(64, 48, 1000, 5000, Array.empty)
    be32At(mp4Zero, 16, 0L)
    Multimodal.decodeMp4(mp4Zero)
    // MP4: largesize marker with a Long.MaxValue payload size
    val mp4Large = Multimodal.mp4Bytes(64, 48, 1000, 5000, Array.fill[Byte](16)(0))
    be32At(mp4Large, 16, 1L) // moov size -> largesize marker
    // bytes 24..31 (inside what was mvhd size) become the 64-bit size
    be32At(mp4Large, 24, 0x7FFFFFFFL); be32At(mp4Large, 28, 0xFFFFFFFFL)
    assert(Multimodal.decodeMp4(mp4Large).isEmpty, "overflowing largesize box rejected")
    // MP4: zero timescale must be a failed decode, not a divide-by-zero
    val mp4ZeroTs = Multimodal.mp4Bytes(64, 48, 1000, 5000, Array.empty)
    be32At(mp4ZeroTs, 32 + 12, 0L) // mvhd timescale
    assert(Multimodal.decodeMp4(mp4ZeroTs).isEmpty)

    // JPEG: segment length < 2 (self-referential loop guard)
    val jpegLoop = Multimodal.jpegBytes(64, 48, Array.empty)
    jpegLoop(4) = 0; jpegLoop(5) = 0 // APP0 length -> 0
    assert(Multimodal.decodeJpeg(jpegLoop).isEmpty)
  }
}

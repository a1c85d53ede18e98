package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based fuzzing of the pure-JVM codecs: thousands of mutated
  * WAV/PPM/BMP payloads — truncations, bit flips, resized declared
  * chunk/size fields, spliced garbage, and pure noise — asserting the
  * NEVER-THROW contract (`ok = false` is the only acceptable failure
  * mode; at 100 TB a corrupt blob must cost one flagged row, not a task
  * retry storm). This makes the round-7 class of bugs (a declared chunk
  * size near 2³¹ wrapping an Int cursor negative) un-reintroducible:
  * the size-field mutation writes arbitrary 32-bit values into every
  * plausible header/size position. Pure JVM — no SparkSession.
  */
class CodecFuzzSpec extends AnyFunSuite {

  /** Deterministic Gen sampling (PropertySpec's pattern — the
    * scalatestplus bridge is not on the classpath). */
  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(1234L)
    (1 to n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  // ---- valid-payload generators -------------------------------------

  private val wavGen: Gen[Array[Byte]] = for {
    rate <- Gen.oneOf(8000, 16000, 44100)
    n <- Gen.chooseNum(0, 400)
    k <- Gen.chooseNum(1, 97)
  } yield AudioCodec.encodeWav(rate, n, i => ((i * k) % 65536) - 32768)

  private val ppmGen: Gen[Array[Byte]] = for {
    w <- Gen.chooseNum(1, 24)
    h <- Gen.chooseNum(1, 24)
    k <- Gen.chooseNum(0, 255)
  } yield ImageCodec.encodePpm(w, h, i => (i * 31 + k) % 256)

  private val bmpGen: Gen[Array[Byte]] = for {
    w <- Gen.chooseNum(1, 24)
    h <- Gen.chooseNum(1, 24)
    k <- Gen.chooseNum(0, 255)
  } yield ImageCodec.encodeBmp(w, h, i => (i * 31 + k) % 256)

  // ---- mutators ------------------------------------------------------

  private val mutatorGen: Gen[Array[Byte] => Array[Byte]] = Gen.oneOf(
    // truncate anywhere, including to zero
    Gen.chooseNum(0.0, 1.0).map(f => (b: Array[Byte]) =>
      b.take((b.length * f).toInt)),
    // flip 1–8 random bits
    for {
      nFlips <- Gen.chooseNum(1, 8)
      picks <- Gen.listOfN(nFlips, Gen.chooseNum(0, Int.MaxValue - 1))
    } yield (b: Array[Byte]) => {
      val out = b.clone()
      if (out.nonEmpty) picks.foreach { p =>
        val i = p % out.length
        out(i) = (out(i) ^ (1 << (p % 8))).toByte
      }
      out
    },
    // resize a declared chunk/size field: write an arbitrary 32-bit LE
    // value (incl. huge/negative-as-unsigned) at an arbitrary offset —
    // hits RIFF/data sizes, BMP header dims and the PPM header digits
    for {
      pos <- Gen.chooseNum(0, Int.MaxValue - 1)
      v <- Gen.oneOf(Gen.chooseNum(Int.MinValue, Int.MaxValue),
        Gen.oneOf(0, -1, 1, Int.MaxValue, Int.MinValue, 0x7ffffff0))
    } yield (b: Array[Byte]) => {
      val out = b.clone()
      if (out.length >= 4) {
        val p = pos % (out.length - 3)
        out(p) = (v & 0xff).toByte
        out(p + 1) = ((v >> 8) & 0xff).toByte
        out(p + 2) = ((v >> 16) & 0xff).toByte
        out(p + 3) = ((v >> 24) & 0xff).toByte
      }
      out
    },
    // splice random garbage into the middle
    for {
      pos <- Gen.chooseNum(0, Int.MaxValue - 1)
      junk <- Gen.listOfN(16, Gen.chooseNum(-128, 127))
    } yield (b: Array[Byte]) => {
      val p = if (b.isEmpty) 0 else pos % b.length
      b.take(p) ++ junk.map(_.toByte) ++ b.drop(p)
    })

  private def mutated(valid: Gen[Array[Byte]]): Gen[Array[Byte]] = for {
    base <- valid
    nMut <- Gen.chooseNum(1, 3)
    ms <- Gen.listOfN(nMut, mutatorGen)
  } yield ms.foldLeft(base)((b, m) => m(b))

  private val noiseGen: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 200)
    bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127))
  } yield bs.map(_.toByte).toArray

  // ---- the never-throw properties ------------------------------------

  test("AudioCodec.decode never throws on 2000 mutated WAVs + 500 noise blobs") {
    forSamples(mutated(wavGen), 2000) { b =>
      val m = AudioCodec.decode(42L, b)
      if (m.ok) assert(m.n_samples >= 0 && m.frames.length <= AudioCodec.maxFrames)
    }
    forSamples(noiseGen, 500)(b => AudioCodec.decode(43L, b))
  }

  test("ImageCodec.decode + thumbnail never throw on 2000 mutated PPM/BMP + 500 noise blobs") {
    forSamples(mutated(Gen.oneOf(ppmGen, bmpGen)), 2000) { b =>
      val m = ImageCodec.decode(7L, b)
      if (m.ok) assert(m.width > 0 && m.height > 0)
      val t = ImageCodec.thumbnail(7L, b, 4)
      assert(t.length <= 16)
    }
    forSamples(noiseGen, 500) { b =>
      ImageCodec.decode(8L, b)
      ImageCodec.thumbnail(8L, b, 4)
    }
  }

  test("valid payloads still decode ok after zero mutations (generator sanity)") {
    forSamples(wavGen, 100)(b => assert(AudioCodec.decode(1L, b).ok))
    forSamples(ppmGen, 100)(b => assert(ImageCodec.decode(2L, b).ok))
    forSamples(bmpGen, 100)(b => assert(ImageCodec.decode(3L, b).ok))
  }
}

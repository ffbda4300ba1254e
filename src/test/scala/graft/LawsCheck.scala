package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the pure (non-Spark) arithmetic the engine's
  * determinism contract rests on — fast generator-driven checks that
  * complement the Spark-level PropertySpec. */
object LawsCheck extends Properties("graft.laws") {

  private val posPair = for {
    p <- Gen.chooseNum(0L, 2000000L)
    q <- Gen.chooseNum(1L, 100000L)
  } yield (p, q)

  // The integer half-up rounding used for loyalty ratios:
  // (2*10^n*p + q) div (2*q) == round-half-up(10^n * p / q)
  property("integerHalfUpMatchesBigDecimal") = Prop.forAll(posPair) {
    case (p, q) =>
      val viaInt = (2000L * p + q) / (2L * q)
      val viaBig = BigDecimal(1000L * p)./(BigDecimal(q))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      viaInt == viaBig
  }

  // Rolling polynomial hash stays in [0, 2^31-1) and is prefix-composable
  private val P = 2147483647L
  private def roll(bytes: Seq[Int], seed: Long = 0L): Long =
    bytes.foldLeft(seed)((acc, c) => (acc * 131 + c) % P)

  property("rollingHashRange") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0, 255))) { bs =>
      val h = roll(bs)
      h >= 0 && h < P
    }

  property("rollingHashPrefixComposable") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0, 255)),
      Gen.listOf(Gen.chooseNum(0, 255))) { (a, b) =>
      roll(a ++ b) == roll(b, roll(a))
    }

  // The multimodal feature stub: deterministic, fixed dimension, [0,1)
  property("featureStubDeterministicBounded") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) {
      bs =>
        val bytes = bs.toArray
        val f1 = Multimodal.featureStub(bytes)
        val f2 = Multimodal.featureStub(bytes.clone())
        f1.sameElements(f2) && f1.length == 8 &&
          f1.forall(v => v >= 0f && v < 1f)
    }

  // The O(n) sliding k-gram hash equals the O(n*k) per-slice fold on
  // arbitrary strings and k — including supplementary-plane code
  // points (surrogate pairs), so the Character.charCount advance and
  // the length-vs-codePointCount alignment in compute() are exercised
  private val strAndK = for {
    k <- Gen.chooseNum(1, 12)
    cps <- Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar.map(_.toInt)),
      (1, Gen.const(' '.toInt)),
      (1, Gen.chooseNum(0x00a1, 0x2fff)),
      (1, Gen.chooseNum(0x10000, 0x10ffff))))
  } yield (new String(cps.toArray, 0, cps.length), k)

  property("kgramSlidingHashEqualsPerSliceFold") =
    Prop.forAll(strAndK) { case (s, k) =>
      val cps = s.codePoints().toArray.toSeq
      val expected = cps.sliding(k).filter(_.length == k)
        .map(w => roll(w)).toSeq
      val arr = graft.plans.KgramRollingHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
      val got = (0 until arr.numElements()).map(arr.getLong)
      got == (if (cps.length < k) Seq.empty else expected)
    }

  // SimHash banding losslessness: two 32-bit values within Hamming
  // distance 3 always share at least one of the 4 byte bands
  private val hamGen = for {
    base <- Gen.chooseNum(0L, 0xffffffffL)
    nBits <- Gen.chooseNum(0, 3)
    bits <- Gen.listOfN(nBits, Gen.chooseNum(0, 31))
  } yield (base, bits.foldLeft(base)((v, b) => v ^ (1L << b)))

  property("simhashByteBandingIsLosslessForHamming3") =
    Prop.forAll(hamGen) { case (a, b) =>
      (0 until 4).exists(i => ((a >> (8 * i)) & 255) == ((b >> (8 * i)) & 255))
    }

  // Chunking window arithmetic (TextOps.chunk's start/count/length
  // formulas): for any doc length and any 1 <= stride <= maxTokens,
  // windows are within bounds, the last one ends exactly at the
  // document end, and their union covers every token with no gap
  private val chunkGen = for {
    max <- Gen.chooseNum(1, 64)
    stride <- Gen.chooseNum(1, max)
    n <- Gen.chooseNum(1L, 2000L)
  } yield (n, max, stride)

  property("chunkWindowsCoverEveryTokenExactly") =
    Prop.forAll(chunkGen) { case (n, max, stride) =>
      val nChunks =
        1L + (if (n > max) (n - max + stride - 1) / stride else 0L)
      val windows = (0L until nChunks).map { c =>
        val start = c * stride
        (start, math.min(max.toLong, n - start))
      }
      val inBounds = windows.forall { case (s, l) =>
        l >= 1 && l <= max && s + l <= n }
      val endsAtDocEnd = windows.last._1 + windows.last._2 == n
      val covered = windows.foldLeft(0L) { case (reach, (s, l)) =>
        if (s <= reach) math.max(reach, s + l) else reach }
      inBounds && endsAtDocEnd && covered == n
    }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps
import graft.sim.SimilarityOps
import graft.text.{LangId, TextOps}
import graft.multimodal.MultimodalOps

/** Unit specs for the scalar cores of the training-data operators. */
class OpsSpec extends AnyFunSuite {

  test("shingles: k-grams over tokens, short-text degenerate case") {
    assert(DedupOps.shingles("a b c d") == Set("a b c", "b c d"))
    assert(DedupOps.shingles("a b") == Set("a b"))
  }

  test("jaccard: exact overlap ratio") {
    assert(DedupOps.jaccard(Set("a", "b"), Set("a", "b")) == 1.0)
    assert(DedupOps.jaccard(Set("a", "b"), Set("b", "c")) == 1.0 / 3.0)
    assert(DedupOps.jaccard(Set.empty, Set.empty) == 1.0)
  }

  test("minhash: identical sets share signatures; similarity tracks jaccard") {
    val a = DedupOps.shingles("the quick brown fox jumps over the lazy dog x y z w")
    val sigA = DedupOps.minhash(a)
    assert(sigA.toSeq == DedupOps.minhash(a).toSeq) // deterministic
    val b = a - a.head
    val sigB = DedupOps.minhash(b)
    val agree = sigA.zip(sigB).count { case (x, y) => x == y }
    assert(agree > 40) // J ≈ 0.9 ⇒ most of 64 slots agree
  }

  test("simhash: near sets have small hamming distance, far sets large") {
    val a = DedupOps.shingles((1 to 50).map(i => s"tok$i").mkString(" "))
    val b = DedupOps.shingles((1 to 49).map(i => s"tok$i").mkString(" "))
    val c = DedupOps.shingles((100 to 150).map(i => s"tok$i").mkString(" "))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(DedupOps.simhash(a), DedupOps.simhash(b)) <= 10)
    assert(ham(DedupOps.simhash(a), DedupOps.simhash(c)) > 10)
  }

  private def approxEq(a: Double, b: Double, eps: Double = 1e-9) =
    math.abs(a - b) <= eps

  test("corpus RAKE aggregator: hand-computed freq/degree/scores through reduce/merge/finish") {
    import graft.rake.CorpusRakeAgg
    val agg = CorpusRakeAgg.aggregator
    // doc1 phrases: [quantum computing advances], [quantum hardware]
    //   ("the" is a stopword island; "." a fragment break)
    // doc2 phrase: [quantum computing]
    // doc3 phrase: [hardware version 7] — "7" is number-filtered
    val doc1 = "quantum computing advances. the quantum hardware"
    val doc2 = "quantum computing"
    val doc3 = "hardware version 7"
    // corpus stats (freq, degree over non-number words):
    //   quantum   f=3 d=2+1+1=4   computing f=2 d=2+1=3
    //   advances  f=1 d=2         hardware  f=2 d=1+1=2
    //   version   f=1 d=1         "7" filtered out entirely
    val expected = Map(
      "quantum" -> ((4.0 + 3) / 3).toFloat,
      "computing" -> 2.5f,
      "advances" -> 3.0f,
      "hardware" -> 2.0f,
      "version" -> 2.0f)
    val b1 = agg.reduce(agg.zero, doc1)
    val b2 = agg.reduce(agg.zero, doc2)
    val b3 = agg.reduce(agg.zero, doc3)
    // merge-smaller-into-larger path: b3 (2 words) folds into b1+b2 (5)
    assert(agg.finish(agg.merge(agg.merge(b1, b2), b3)) == expected)
    // merge is order-insensitive (map-side partials arrive in any order)
    val c1 = agg.reduce(agg.zero, doc1)
    val c2 = agg.reduce(agg.zero, doc2)
    val c3 = agg.reduce(agg.zero, doc3)
    assert(agg.finish(agg.merge(c3, agg.merge(c2, c1))) == expected)
    // nulls/empties fold to nothing
    assert(agg.finish(agg.reduce(agg.reduce(agg.zero, null), "")) == Map.empty)
  }

  test("sortedOverlapCount: two-pointer intersection over sorted longs") {
    // tests the NATIVE kernel the d02/d04 verifies actually execute
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def i(a: Seq[Long], b: Seq[Long]): Long =
      graft.functions.VectorOps.sortedOverlapCount(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
    assert(i(Seq(1L, 3L, 5L), Seq(3L, 5L, 7L)) == 2L)
    assert(i(Seq.empty, Seq(1L)) == 0L)
    assert(i(Seq(1L, 2L), Seq(1L, 2L)) == 2L)
    // negative vs positive ordering (signed long compare)
    assert(i(Seq(-5L, 1L), Seq(-5L, 2L)) == 1L)
  }

  test("bpeSymbols: greedy left-to-right merge application in order") {
    import graft.text.BpeOps.bpeSymbols
    assert(bpeSymbols("abab", Nil) == Seq("a", "b", "a", "b"))
    assert(bpeSymbols("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    assert(bpeSymbols("abab", Seq(("a", "b"), ("ab", "ab"))) == Seq("abab"))
    // greedy: after merging at 0-1, position 1-2 ('b','a') can't match
    assert(bpeSymbols("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // later merges see earlier merges' output, not raw chars
    assert(bpeSymbols("xay", Seq(("x", "a"), ("xa", "y"))) == Seq("xay"))
  }

  test("cosine: orthogonal 0, identical 1, scale-invariant") {
    val x = Seq(1f, 0f, 2f)
    assert(approxEq(SimilarityOps.cosine(x, x), 1.0))
    assert(SimilarityOps.cosine(Seq(1f, 0f), Seq(0f, 1f)) == 0.0)
    assert(approxEq(SimilarityOps.cosine(x, x.map(_ * 3)), 1.0, 1e-7))
    assert(SimilarityOps.cosine(Seq(0f), Seq(0f)) == 0.0)
  }

  test("signBits: deterministic and locality-sensitive") {
    val planes = SimilarityOps.hyperplanes(16, 4)
    val v = Seq(0.3f, -0.2f, 0.9f, 0.1f)
    val near = Seq(0.31f, -0.2f, 0.9f, 0.1f)
    val far = v.map(-_)
    val s1 = SimilarityOps.signBits(v, planes)
    assert(s1 == SimilarityOps.signBits(v, planes))
    assert(java.lang.Long.bitCount(s1 ^ SimilarityOps.signBits(near, planes)) <= 2)
    assert(SimilarityOps.signBits(far, planes) == (~s1 & 0xffffL))
  }

  test("detectLang: CJK detection and trigram profiles") {
    assert(LangId.detectLang("这是一个中文句子的测试文本内容") == "zh")
    assert(LangId.detectLang("the cat is sitting on the mat and singing") == "en")
    assert(LangId.detectLang("der hund und die katze sind schön") == "de")
    assert(LangId.detectLang("") == "und")
  }

  test("simhash pigeonhole: any pair within hamming 3 shares one of the 4 16-bit bands") {
    // the d03 banding guarantee — 4 bands, ≤3 flipped bits ⇒ at least one
    // band untouched; checked with the exact masks the query uses
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val sig = rnd.nextLong()
      val nFlips = rnd.nextInt(4) // 0..3
      var other = sig
      (1 to nFlips).foreach { _ => other ^= (1L << rnd.nextInt(64)) }
      val shared = (0 until 4).exists { b =>
        (sig & (0xffffL << (b * 16))) == (other & (0xffffL << (b * 16)))
      }
      assert(shared, f"sig=$sig%x other=$other%x")
    }
  }

  test("fingerprint: golden values pin the JLS hashCode fold") {
    // String.hashCode is specified by the JLS — these literals must never
    // drift across JVMs; they also pin the 64-bit fold + unsigned 3-gram
    val (h, m) = TextOps.fingerprint("the quick brown fox jumps over the lazy dog")
    assert(h == -1137903464218335600L)
    assert(m == 1005032562L)
  }

  test("fingerprint: deterministic, order-sensitive") {
    val (h1, m1) = TextOps.fingerprint("a b c d e")
    val (h2, _) = TextOps.fingerprint("a b c d e")
    val (h3, _) = TextOps.fingerprint("e d c b a")
    assert(h1 == h2 && h1 != h3)
    assert(m1 == TextOps.fingerprint("a b c d e")._2)
  }

  test("png codec: encode/decode round-trips the deterministic pixels") {
    val docId = 12345L
    val (w, h, base) = MultimodalOps.imageDims(docId)
    val bytes = MultimodalOps.encodePng(docId)
    assert(bytes.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val (dw, dh, pixelSum, resizedSum) = MultimodalOps.decodeFeatures(bytes)
    assert(dw == w && dh == h)
    var expected = 0L
    for (y <- 0 until h; x <- 0 until w) expected += (base + x + y) % 256
    assert(pixelSum == expected)
    var expResized = 0L
    for (y <- 0 until h / 2; x <- 0 until w / 2)
      expResized += (base + 2 * x + 2 * y) % 256
    assert(resizedSum == expResized)
  }

  test("wav codec: encode/parse round-trips the deterministic waveform") {
    for (id <- Seq(0L, 7L, 499L)) {
      val (en, erate) = MultimodalOps.audioParams(id)
      val (n, ms, sumAbs, zc, rate) = MultimodalOps.audioFeatures(
        MultimodalOps.encodeWav(id))
      assert(n == en.toLong && rate == erate.toLong)
      assert(ms == en.toLong * 1000 / erate)
      val samples = (0 until en).map(i => MultimodalOps.sampleAt(id, i))
      assert(sumAbs == samples.map(x => math.abs(x).toLong).sum)
      assert(zc == samples.sliding(2).count {
        case Seq(a, b) => (a < 0) != (b < 0); case _ => false })
    }
  }

  test("audioFingerprint: deterministic, edit-tolerant, cross-track discriminative") {
    import MultimodalOps.{audioFingerprint, audioParams, encodeWavSamples, sampleAt}
    def fp(id: Long, edit: Boolean): Long = {
      val (n, rate) = audioParams(id)
      val s = Array.tabulate(n)(sampleAt(id, _))
      if (edit) s(1) += 1
      audioFingerprint(encodeWavSamples(s, rate))
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(7, edit = false) == fp(7, edit = false)) // deterministic
    // a one-sample amplitude edit stays within the hamming-3 verify band
    assert(ham(fp(7, edit = false), fp(7, edit = true)) <= 3)
    assert(ham(fp(42, edit = false), fp(42, edit = true)) <= 3)
    // distinct tracks stay OUTSIDE the hamming-3 verify band (adjacent
    // ids share the i²-dominated energy envelope, so hamming runs ~9,
    // not ~32 — still never confirmed as near-dups)
    assert(ham(fp(7, edit = false), fp(8, edit = false)) > 3)
    assert(ham(fp(7, edit = false), fp(100, edit = false)) > 3)
  }

  test("video container: frame count, stride sampling, constant-gray means") {
    val docId = 7L // 8 frames
    val bytes = MultimodalOps.encodeVideo(docId)
    val sampled = MultimodalOps.sampleFrames(bytes, 4)
    assert(sampled.map(_._1) == Seq(0, 4))
    assert(sampled.map(_._2) == Seq((7L + 0) % 256, (7L + 4) % 256))
  }

  test("greedyPack: first-fit bins, boundary waste, oversize docs") {
    import graft.text.BpeOps.greedyPack
    // (n_seqs, waste, n_oversize, total)
    assert(greedyPack(Seq.empty, 10L) == (0L, 0L, 0L, 0L))
    assert(greedyPack(Seq(10L), 10L) == (1L, 0L, 0L, 10L)) // exact fit
    assert(greedyPack(Seq(4L, 4L, 4L), 10L) == (2L, 8L, 0L, 12L)) // 8+4 split
    // greedy is order-sensitive: 6,5,4 → [6],[5,4] but 5,4,6 → [5,4],[6]
    assert(greedyPack(Seq(6L, 5L, 4L), 10L) == (2L, 5L, 0L, 15L))
    assert(greedyPack(Seq(5L, 4L, 6L), 10L) == (2L, 5L, 0L, 15L))
    // an over-capacity doc overflows its own bin: no waste, counted
    assert(greedyPack(Seq(25L), 10L) == (1L, 0L, 1L, 25L))
    assert(greedyPack(Seq(3L, 25L, 3L), 10L) == (3L, 14L, 1L, 31L))
  }
}

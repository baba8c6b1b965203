package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.ext.Multimodal.Media

/** The 64-bit Walsh–Hadamard pHash and its banded near-dup join: the
  * banding must stay PIGEONHOLE-EXACT (4 sixteen-bit bands ⇒ every
  * pair within Hamming 3 shares a band), and the co-designed variant
  * fixture must keep producing true near-dup pairs — this is the pair
  * of gates that went red in r12 when implementation and oracle
  * drifted apart.
  */
class MultimodalSpec extends GraftSuite {

  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def media = Multimodal.withBinary(docs).as[Media]

  test("pHash is deterministic and exact duplicates hash identically") {
    val h1 = Multimodal.pHash(media).collect().map(p => p.doc_id -> p.phash).toMap
    val h2 = Multimodal.pHash(media).collect().map(p => p.doc_id -> p.phash).toMap
    assert(h1.size == docs.count() && h1 == h2)
    // an exact payload duplicate under a new id hashes the same
    val dup = media.map(m => Media(m.doc_id + 5000000L, m.media_type, m.payload))
    val hd = Multimodal.pHash(dup).collect().map(p => (p.doc_id - 5000000L) -> p.phash).toMap
    assert(hd == h1)
  }

  test("withNearDupVariants preserves length and lands within the documented envelope") {
    val v = Multimodal.withNearDupVariants(media)
    val byId = v.collect().map(m => m.doc_id -> m.payload).toMap
    val variantIds = byId.keys.filter(_ >= 1000000L).toSeq
    assert(variantIds.nonEmpty)
    variantIds.foreach { vid =>
      val orig = byId(vid - 1000000L)
      val varp = byId(vid)
      assert(varp.length == orig.length, s"variant $vid changed length")
      // same-length substitution class: differs exactly at every 4th byte
      orig.indices.foreach { i =>
        if (i % 4 == 0) assert(varp(i) == (orig(i) ^ 7).toByte)
        else assert(varp(i) == orig(i))
      }
    }
    assert((byId.keySet.filter(_ < 1000000L) & variantIds.map(_ - 1000000L).toSet)
      == variantIds.map(_ - 1000000L).toSet)
  }

  test("phashNearDupPairs equals brute-force all-pairs at hamming <= 3") {
    val hashes = Multimodal.pHash(Multimodal.withNearDupVariants(media)).toDF()
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      a <- hs; b <- hs if a._1 < b._1
      h = java.lang.Long.bitCount(a._2 ^ b._2) if h <= 3
    } yield (a._1, b._1, h.toLong)).toSet
    val got = Multimodal.phashNearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture must contain true near-dup pairs")
    assert(got == want)
  }

  test("decodeWav parses a hand-crafted golden WAV by the format spec") {
    // 2 samples (+256, -32768) at 8000 Hz, bytes written by hand —
    // independent of the wavify encoder
    val golden: Array[Byte] = (
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](40, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      Array[Byte](16, 0, 0, 0) ++          // fmt chunk length
      Array[Byte](1, 0) ++                 // PCM
      Array[Byte](1, 0) ++                 // mono
      Array[Byte](0x40, 0x1f, 0, 0) ++     // 8000 Hz LE
      Array[Byte](-128, 0x3e, 0, 0) ++     // byte rate 16000 LE
      Array[Byte](2, 0) ++                 // block align
      Array[Byte](16, 0) ++                // bits
      "data".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      Array[Byte](0, 1) ++                 // +256 LE
      Array[Byte](0, -128)                 // -32768 LE
    )
    import spark.implicits._
    val got = Multimodal.decodeWav(
      Seq(Multimodal.Media(7L, "audio", golden)).toDS()).collect().head
    assert(got.valid && got.fmt == 1 && got.channels == 1 &&
      got.sample_rate == 8000 && got.bits == 16 && got.n_samples == 2 &&
      got.dur_ms == 0 && got.peak == 32768 && got.sum_abs == 33024)
    // corrupt one magic byte: must come back invalid with zeroed stats
    val bad = golden.clone(); bad(8) = 'X'.toByte
    val inv = Multimodal.decodeWav(
      Seq(Multimodal.Media(8L, "audio", bad)).toDS()).collect().head
    assert(!inv.valid && inv.peak == 0 && inv.n_samples == 0)
  }

  test("wavify/decodeWav round-trip recovers rate, duration and PCM stats") {
    val metas = Multimodal.decodeWav(Multimodal.wavify(media)).collect()
    assert(metas.length == docs.count() && metas.forall(_.valid))
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    metas.foreach { w =>
      val p = byId(w.doc_id)
      val sr = 8000 + (w.doc_id % 3) * 4000
      val samples = p.map(b => ((b & 0xff) - 128).toLong << 8)
      assert(w.sample_rate == sr && w.n_samples == p.length &&
        w.dur_ms == p.length * 1000L / sr &&
        w.peak == samples.map(math.abs).foldLeft(0L)(math.max) &&
        w.sum_abs == samples.map(math.abs).sum &&
        w.fmt == 1 && w.channels == 1 && w.bits == 16)
    }
  }

  test("decodeBmp parses a hand-crafted golden BMP by the format spec") {
    // 2×2 24-bit BMP written by hand (stride 8 = 6 pixel bytes + 2
    // pad), independent of the bmpify encoder
    val golden: Array[Byte] = (
      "BM".getBytes("US-ASCII") ++
      Array[Byte](70, 0, 0, 0) ++          // file size 54 + 16
      Array[Byte](0, 0, 0, 0) ++           // reserved
      Array[Byte](54, 0, 0, 0) ++          // pixel offset
      Array[Byte](40, 0, 0, 0) ++          // info header size
      Array[Byte](2, 0, 0, 0) ++           // width 2
      Array[Byte](2, 0, 0, 0) ++           // height 2
      Array[Byte](1, 0) ++                 // planes
      Array[Byte](24, 0) ++                // bpp
      Array[Byte](0, 0, 0, 0) ++           // BI_RGB
      Array[Byte](16, 0, 0, 0) ++          // image size
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++ // dpi
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++ // colors
      Array[Byte](10, 20, 30, 40, 50, 60, 0, 0) ++          // bottom row
      Array[Byte](-56, -46, -36, 0, 0, 0, 0, 0)             // top row
    )
    import spark.implicits._
    val got = Multimodal.decodeBmp(
      Seq(Multimodal.Media(7L, "image", golden)).toDS()).collect().head
    assert(got.valid && got.width == 2 && got.height == 2 &&
      got.bpp == 24 && got.stride == 8 && got.img_size == 16 &&
      got.n_px == 4 && got.lum3_sum == 840 && got.peak3 == 630)
    // corrupt the magic: invalid with zeroed stats, no throw
    val bad = golden.clone(); bad(0) = 'X'.toByte
    val inv = Multimodal.decodeBmp(
      Seq(Multimodal.Media(8L, "image", bad)).toDS()).collect().head
    assert(!inv.valid && inv.width == 0 && inv.lum3_sum == 0)
    // a lying file-size field must also reject (spec check, not crash)
    val lie = golden.clone(); lie(2) = 71
    assert(!Multimodal.decodeBmp(
      Seq(Multimodal.Media(9L, "image", lie)).toDS()).collect().head.valid)
  }

  test("bmpify/decodeBmp round-trip recovers dims and luminance stats") {
    val metas = Multimodal.decodeBmp(Multimodal.bmpify(media)).collect()
    assert(metas.length == docs.count())
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    metas.foreach { b =>
      val p = byId(b.doc_id)
      if (b.doc_id % 97 == 0) assert(!b.valid && b.width == 0)
      else {
        val w = 8 + (b.doc_id % 25)
        val h = math.max(1, (p.length + w - 1) / w)
        assert(b.valid && b.width == w && b.height == h &&
          b.n_px == w * h &&
          b.lum3_sum == 3L * p.map(x => (x & 0xff).toLong).sum &&
          b.peak3 == 3L * p.map(x => (x & 0xff).toLong).foldLeft(0L)(math.max))
      }
    }
  }

  test("phashNearDupPairs refuses a radius the banding cannot certify") {
    val hashes = Multimodal.pHash(media).toDF()
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDupPairs(hashes, maxHamming = 4)
    }
  }

  test("decodeAvi parses a hand-crafted golden AVI by the format spec") {
    // one 2×2 frame written by hand, independent of the avify encoder
    val bb = java.nio.ByteBuffer.allocate(112)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(104)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(68)
    bb.put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(56)
    bb.putInt(40000) // µs per frame
    bb.putInt(0).putInt(0).putInt(0)
    bb.putInt(1)     // total frames
    bb.putInt(0)
    bb.putInt(1)     // streams
    bb.putInt(12)    // suggested buffer
    bb.putInt(2).putInt(2) // width, height
    bb.putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes("US-ASCII")).putInt(16)
    bb.put("movi".getBytes("US-ASCII"))
    bb.put("00db".getBytes("US-ASCII")).putInt(4)
    bb.put(Array[Byte](10, 20, 30, 40))
    val golden = bb.array()
    val got = Multimodal.decodeAvi(
      Seq(Multimodal.Media(3L, "video", golden)).toDS()).collect().head
    assert(got.valid && got.width == 2 && got.height == 2 &&
      got.n_frames == 1 && got.us_per_frame == 40000 && got.dur_ms == 40 &&
      got.lum_sum == 100 && got.frame_peak_sum == 100)
    // corrupt magic → invalid with zeroed stats, no throw
    val bad = golden.clone(); bad(0) = 'X'.toByte
    assert(!Multimodal.decodeAvi(
      Seq(Multimodal.Media(4L, "video", bad)).toDS()).collect().head.valid)
    // lying movi list size must reject (spec check, not crash)
    val lie = golden.clone(); lie(92) = 17
    assert(!Multimodal.decodeAvi(
      Seq(Multimodal.Media(5L, "video", lie)).toDS()).collect().head.valid)
  }

  test("avify/decodeAvi round-trip recovers frames, duration and frame stats") {
    val metas = Multimodal.decodeAvi(Multimodal.avify(media)).collect()
    assert(metas.length == docs.count())
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    metas.foreach { v =>
      val p = byId(v.doc_id)
      if (v.doc_id % 89 == 0) assert(!v.valid && v.n_frames == 0)
      else {
        val f = math.max(1, (p.length + 63) / 64)
        val upf = 33333 + (v.doc_id % 3) * 8334
        val sums = p.map(b => (b & 0xff).toLong).grouped(64).map(_.sum).toSeq
        assert(v.valid && v.width == 8 && v.height == 8 &&
          v.n_frames == f && v.us_per_frame == upf &&
          v.dur_ms == f * upf / 1000 &&
          v.lum_sum == sums.sum &&
          v.frame_peak_sum == (if (sums.isEmpty) 0L else sums.max))
      }
    }
  }

  test("bmpLumHistogram bins the golden BMP's pixels and drops corrupt streams") {
    // the same hand-crafted 2×2 golden BMP as the decode test:
    // pixel sums 60, 150, 630, 0 → bins (s div 192) = 0, 0, 3, 0
    val golden: Array[Byte] = (
      "BM".getBytes("US-ASCII") ++
      Array[Byte](70, 0, 0, 0) ++
      Array[Byte](0, 0, 0, 0) ++
      Array[Byte](54, 0, 0, 0) ++
      Array[Byte](40, 0, 0, 0) ++
      Array[Byte](2, 0, 0, 0) ++
      Array[Byte](2, 0, 0, 0) ++
      Array[Byte](1, 0) ++
      Array[Byte](24, 0) ++
      Array[Byte](0, 0, 0, 0) ++
      Array[Byte](16, 0, 0, 0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](10, 20, 30, 40, 50, 60, 0, 0) ++
      Array[Byte](-56, -46, -36, 0, 0, 0, 0, 0)
    )
    val bad = golden.clone(); bad(0) = 'X'.toByte
    val got = Multimodal.bmpLumHistogram(Seq(
      Multimodal.Media(7L, "image", golden),
      Multimodal.Media(8L, "image", bad)).toDS()).collect()
    assert(got.length == 1)
    val h = got.head
    assert(h.doc_id == 7L && h.b0 == 3 && h.b1 == 0 && h.b2 == 0 && h.b3 == 1)
  }

  test("bmpLumHistogram over bmpify equals the payload-byte closed form") {
    val hists = Multimodal.bmpLumHistogram(Multimodal.bmpify(media)).collect()
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    assert(hists.length == byId.keys.count(_ % 97 != 0))
    hists.foreach { hh =>
      val p = byId(hh.doc_id)
      val w = 8 + (hh.doc_id % 25)
      val h = math.max(1, (p.length + w - 1) / w)
      // gray pixel s = 3·byte ⇒ bin = byte div 64; padding → bin 0
      val bins = new Array[Long](4)
      p.foreach(b => bins(((b & 0xff) / 64).toInt) += 1)
      bins(0) += w * h - p.length
      assert((hh.b0, hh.b1, hh.b2, hh.b3) ==
        ((bins(0), bins(1), bins(2), bins(3))))
    }
  }
}

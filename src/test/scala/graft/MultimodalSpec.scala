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

  test("phashNearDupPairs refuses a radius the banding cannot certify") {
    val hashes = Multimodal.pHash(media).toDF()
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDupPairs(hashes, maxHamming = 4)
    }
  }
}

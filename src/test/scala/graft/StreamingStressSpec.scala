package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.{MochaAdapter, QuadStore}

/** Streaming-ingest end-to-end stress (round-7 task): drive the full
  * MOCHA FSM — chunked bulk files, 151 barrier, phase flip — then run
  * SELECTs through the task channel CONCURRENTLY with streamed
  * INSERTs on the data channel, at an sf0.1-derived bulk size.
  *
  * What must hold throughout:
  *  - snapshot isolation: every SELECT sees a committed segment set —
  *    the marker-predicate count is always a whole multiple of the
  *    per-update batch size (a torn update would show a partial
  *    batch), and the bulk-loaded count never wavers;
  *  - no streamed update errors (fire-and-forget still counts
  *    failures);
  *  - the id plane survives streaming: after drain the encoded
  *    sidecar is LIVE (per-segment incremental encoding — no
  *    recompaction), and answers over it equal the struct plane.
  */
class StreamingStressSpec extends GraftSuite {

  private val sf01 = "/root/testdata/sf0.1"

  test("concurrent SELECTs during streamed INSERTs keep isolation + id plane") {
    val t0 = System.nanoTime()
    val qs = Files.createTempDirectory("stress-qs")
    val stg = Files.createTempDirectory("stress-stg")
    val store = new QuadStore(spark, qs.toString)
    val ad = new MochaAdapter(spark, store, stg.toString)

    def dataMsg(file: String, content: String): Array[Byte] = {
      val f = file.getBytes(UTF_8); val c = content.getBytes(UTF_8)
      ByteBuffer.allocate(4 + f.length + c.length)
        .putInt(f.length).put(f).put(c).array()
    }

    // ---- bulk phase: sf0.1 customer slice as chunked turtle files ----
    import spark.implicits._
    val custIds = spark.read.parquet(s"$sf01/customer.parquet")
      .select(col("c_custkey").cast("long")).as[Long].collect().sorted
    val nBulk = custIds.length // 15k at sf0.1
    val chunks = custIds.grouped(1500).zipWithIndex.toSeq
    chunks.foreach { case (ids, i) =>
      val ttl = ids.map(id => s"<cust:$id> <v:bulk> \"y\" .").mkString("\n")
      ad.receiveData(dataMsg(s"gen/part-$i.ttl", ttl + "\n"))
    }
    val payload = ByteBuffer.allocate(5)
      .putInt(chunks.size).put(1.toByte).array() // lastPhase → streaming
    assert(ad.receiveCommand(ad.CommandBulkLoadGenFinished, payload)
      .contains(ad.CommandBulkLoadingFinished))
    assert(ad.dataLoadingFinished)
    assert(store.snapshot().count() == nBulk)

    // ---- streaming phase: async INSERTs + concurrent SELECTs ----
    val nUpdates = 24
    val batch = 40 // triples per streamed update — the isolation modulus
    (0 until nUpdates).foreach { u =>
      val triples = (0 until batch)
        .map(i => s"<ev:${u * batch + i}> <m:batch> \"$u\" .").mkString(" ")
      ad.receiveData(
        s"INSERT DATA { GRAPH <g:stream> { $triples } }".getBytes(UTF_8))
    }

    val countRe = """"value"\s*:\s*"(\d+)"""".r
    def taskCount(q: String, id: String): Long = {
      val framed = ad.receiveTask(id, q.getBytes(UTF_8))
      val buf = ByteBuffer.wrap(framed)
      ad.readString(buf) // task id echo
      val body = ad.readString(buf)
      val m = countRe.findFirstMatchIn(body)
      assert(m.isDefined, s"no count in envelope: ${body.take(200)}")
      m.get.group(1).toLong
    }

    // SELECT through the task channel while the update pool drains:
    // every observed marker count must be a whole number of batches
    // and the bulk count must never waver
    var observed = Vector.empty[Long]
    var polls = 0
    while (observed.lastOption.forall(_ < nUpdates.toLong * batch) && polls < 200) {
      val c = taskCount(
        "SELECT (COUNT(?s) AS ?c) WHERE { ?s <m:batch> ?o }", s"t$polls")
      assert(c % batch == 0,
        s"torn update visible: marker count $c is not a multiple of $batch")
      assert(observed.lastOption.forall(_ <= c),
        s"marker count went backwards: $observed then $c")
      observed :+= c
      val b = taskCount(
        "SELECT (COUNT(?s) AS ?c) WHERE { ?s <v:bulk> ?o }", s"b$polls")
      assert(b == nBulk, s"bulk count wavered under streaming: $b != $nBulk")
      polls += 1
    }
    assert(ad.drain(timeoutSeconds = 600), "drain must complete")
    assert(ad.failures == 0, s"${ad.failures} streamed updates errored")
    assert(store.snapshot().filter(col("g") === "g:stream").count() ==
      nUpdates.toLong * batch)

    // ---- id plane survived streaming ingest (no recompaction) ----
    val enc = store.snapshotEncoded()
    assert(enc.isDefined,
      "encoded sidecar must stay live across streamed appends")
    val text = """SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s <m:batch> ?o }
                  GROUP BY ?o"""
    def bag(e: Option[graft.core.EncodedQuads]) =
      graft.sparql.Sparql.query(spark, store.snapshot(), text, encoded = e)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val encBag = bag(enc)
    assert(encBag == bag(None) && encBag.size == nUpdates)

    val (ins, sel) = ad.counters
    assert(ins == nUpdates && sel == polls * 2)
    info(f"stress wall time: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"($nBulk bulk triples, $nUpdates streamed updates x $batch, " +
      s"${polls * 2} concurrent SELECTs, ${observed.distinct.size} " +
      "distinct isolation states observed)")
  }
}

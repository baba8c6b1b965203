package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.QuadStore
import graft.rdf.TpchRdf
import graft.sparql.Sparql

/** Whole-stack integration: quads view → quad store segments →
  * compaction to the partitioned/sorted layout → SPARQL over the
  * store snapshot — answers must match querying the in-memory view
  * directly (the storage layer is semantics-transparent).
  */
class EndToEndSpec extends GraftSuite {

  test("SPARQL answers identical over store-compacted quads") {
    val dir = Files.createTempDirectory("e2e").toString
    val store = new QuadStore(spark, dir)
    val view = TpchRdf.graphDf(spark, sf)
    store.append(view, "tpch")
    store.compact()

    val text = """
      SELECT ?rname (COUNT(*) AS ?n) WHERE {
        ?c a :Customer . ?c :nation ?nt . ?nt :region ?r . ?r :name ?rname .
      } GROUP BY ?rname"""
    val fromStore = Sparql.query(spark, store.snapshot(), text)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fromView = Sparql.query(spark, view, text)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fromStore == fromView && fromStore.size == 5)

    // constant-graph SPARQL over the compacted store must partition-prune
    val plan = store.snapshot().filter(col("g") === "g:schema")
      .queryExecution.executedPlan.toString
    assert("\\(g#\\d+ = g:schema\\)".r.findFirstIn(plan).isDefined,
      s"expected graph partition pruning:\n$plan")

    // the compacted store serves an id-encoded sidecar; answers over it
    // are identical, and any later append invalidates it until the next
    // compaction
    val enc = store.snapshotEncoded()
    assert(enc.isDefined, "compacted store must serve the encoded sidecar")
    val fromEncoded = Sparql.query(spark, store.snapshot(), text, encoded = enc)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fromEncoded == fromView)

    // MULTIPLICITY parity between the paths (toSet above cannot see
    // it): a fixed-length sequence path desugars identically on both,
    // so bag counts must agree row for row
    val pathText = """
      SELECT ?c ?rn WHERE { ?c a :Customer . ?c :nation/:region/:name ?rn }"""
    def bag(encOpt: Option[graft.core.EncodedQuads]) =
      Sparql.query(spark, store.snapshot(), pathText, encoded = encOpt)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    assert(bag(enc) == bag(None))

    // STREAMING APPEND after compact: the id plane stays live through
    // the appended segment's own sidecar (incremental encoding — ids
    // are content-derived, so segment-local encoding composes; no
    // recompaction). Answers over the composed encoded view must equal
    // the struct plane over the same post-append snapshot.
    store.append(view.filter(col("g") === "g:schema"), "late")
    val enc2 = store.snapshotEncoded()
    assert(enc2.isDefined,
      "append after compact must keep the encoded sidecar live")
    assert(bag(enc2) == bag(None))

    // ...and the composed view actually drives the id hot path: with
    // broadcast pinned off, the BGP join exchanges carry ONLY longs
    // (PlanQualitySpec's contract, asserted here post-append)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.types.LongType
      val df = Sparql.query(spark, store.snapshot(), text, encoded = enc2)
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only exchange after append — hot path degraded: $shuffles")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }

    // a TOMBSTONE no longer stales the sidecar: the delete commit
    // writes a NEGATIVE sidecar (the encoding of exactly the rows it
    // hid) and the encoded view is the multiset difference — the id
    // plane keeps serving across deletes, answers identical to the
    // struct plane over the same post-delete snapshot
    store.executeUpdate("CLEAR GRAPH <g:schema>")
    val enc3 = store.snapshotEncoded()
    assert(enc3.isDefined,
      "a tombstone must keep the encoded sidecar live (negative sidecar)")
    assert(bag(enc3) == bag(None))
    // ...and compaction folds the tombstone away, restoring the
    // pristine single-sidecar plan (no multiset difference per query)
    store.compact()
    assert(store.snapshotEncoded().isDefined)
    assert(bag(store.snapshotEncoded()) == bag(None))
  }
}

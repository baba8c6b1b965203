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
    store.append(view.filter(col("g") === "g:schema"), "late")
    assert(store.snapshotEncoded().isEmpty,
      "append after compact must invalidate the encoded sidecar")
  }
}

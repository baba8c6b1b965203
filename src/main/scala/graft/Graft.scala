package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.QuadStore
import graft.rio.SparqlJson
import graft.sparql.Sparql

/** User-facing facade of the engine — the surface a user of the
  * reference system needs to switch: open a store, bulk-load Turtle,
  * run SPARQL updates, materialize inference at load time, and query
  * (SELECT / ASK / CONSTRUCT / DESCRIBE) with results as DataFrames or
  * W3C SPARQL-JSON. Everything delegates to the real modules; this
  * object only fixes the wiring (snapshot per query = the reference's
  * repository-connection read isolation,
  * `GraphDBSystemAdapter.java:246,281`).
  *
  * {{{
  * val g = Graft.open(spark, "/data/mystore")
  * g.load(Seq("/data/dump1.ttl", "/data/dump2.ttl"))
  * g.update("INSERT DATA { GRAPH <g:x> { ex:a ex:p ex:b . } }")
  * g.materialize()                      // load-time OWL-Horst closure
  * val df = g.query("SELECT ?s WHERE { ?s a ex:Widget }")
  * val json = g.queryJson("SELECT ?s WHERE { ?s ?p ?o } LIMIT 10")
  * }}}
  */
object Graft {

  def open(spark: SparkSession, dir: String): Graft = new Graft(spark, dir)

  /** One-off query over an existing quads DataFrame (no store). */
  def query(spark: SparkSession, quads: DataFrame, text: String): DataFrame =
    Sparql.query(spark, quads, text)
}

final class Graft private[graft] (spark: SparkSession, dir: String) {

  val store = new QuadStore(spark, dir)

  /** Bulk-load Turtle files as one atomic versioned graph; returns the
    * graph IRI (`http://graph.version.N`).
    */
  def load(files: Seq[String]): String = store.loadVersion(files)

  /** Read RDF documents of any supported format into a quads
    * DataFrame without committing them — per-path format dispatch
    * shared with the `LOAD` update ([[graft.rio.Rio.readAuto]]):
    * N-Triples/N-Quads (`.nt`/`.nq`, line-splittable), TriG
    * (`.trig`), Turtle otherwise; mixed lists are fine. Commit via
    * `LOAD <doc>` updates or [[load]] for Turtle versions.
    */
  def read(paths: Seq[String], defaultGraph: String = "urn:default"): DataFrame =
    graft.rio.Rio.readAuto(spark, paths, defaultGraph)

  /** Any supported SPARQL Update: INSERT/DELETE DATA, DELETE WHERE,
    * general `DELETE/INSERT … WHERE` (+`WITH`), CLEAR/DROP GRAPH,
    * COPY/MOVE/ADD, `LOAD [SILENT] … [INTO GRAPH]`, INSERT…WITH
    * rewrite.
    */
  def update(text: String): Unit = store.executeUpdate(text)

  /** Materialize OWL-Horst entailments into the store (load-time
    * inference; queries afterwards read explicit ∪ inferred).
    */
  def materialize(): Unit = store.materializeInference()

  /** SELECT/ASK/CONSTRUCT/DESCRIBE over the current snapshot. */
  def query(text: String): DataFrame =
    Sparql.query(spark, store.snapshot(), text)

  /** W3C SPARQL 1.1 Results JSON for any query form: SELECT bindings
    * (streamed serialization), the ASK boolean envelope, and a
    * lexical-triple envelope for CONSTRUCT/DESCRIBE.
    */
  def queryJson(text: String): String = {
    val parsed = graft.sparql.SparqlParser.parse(text)
    val c = new graft.sparql.Compiler(spark, store.snapshot(),
      fromGraphs = parsed.fromGraphs, fromNamed = parsed.fromNamed)
    if (parsed.isAsk)
      SparqlJson.ask(c.ask(parsed.op).head().getString(0) == "true")
    else (parsed.construct, parsed.describe) match {
      case (None, None) => SparqlJson.select(c.compile(parsed.op))
      case (Some(tmpl), _) =>
        SparqlJson.selectLexical(c.construct(c.compile(parsed.op), tmpl))
      case (_, Some(targets)) =>
        SparqlJson.selectLexical(c.describe(c.compile(parsed.op), targets))
    }
  }
}

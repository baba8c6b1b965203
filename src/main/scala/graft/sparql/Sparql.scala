package graft.sparql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Front door of the SPARQL engine: text → parse → algebra → DataFrame.
  *
  * Mirrors the reference's single query entry point
  * (`prepareTupleQuery(QueryLanguage.SPARQL, queryString)` at
  * `GraphDBSystemAdapter.java:246`), with Spark executors playing the
  * role of the GraphDB server process (SURVEY §3.1).
  */
object Sparql {

  // ---- SERVICE endpoint registry ------------------------------------
  // Federation without a transport: `SERVICE <iri> {…}` resolves the
  // endpoint IRI against in-process stores registered here (algebra
  // parity with GraphDB's RDF4J federation behind
  // `GraphDBSystemAdapter.java:246`); unregistered IRIs fail fast in
  // the compiler. Registration is process-wide, like a federation
  // catalog.
  private val services =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Register a quads DataFrame as the in-process SPARQL endpoint
    * behind `iri`; subsequent `SERVICE <iri> { … }` blocks evaluate
    * against it.
    */
  def registerService(iri: String, quads: DataFrame): Unit =
    services.put(iri, quads)

  def unregisterService(iri: String): Unit = services.remove(iri)

  private[sparql] def serviceQuads(iri: String): Option[DataFrame] =
    Option(services.get(iri))

  /** SELECT/ASK → result DataFrame with one STRING column per
    * projected variable (ASK: single column `ask`). Supplying an
    * id-encoded view (`encoded`) routes simple BGPs through long-id
    * joins with a result-edge dictionary decode.
    */
  def query(spark: SparkSession, quads: DataFrame, text: String,
      stats: Map[String, Long] = Map.empty,
      encoded: Option[graft.core.EncodedQuads] = None): DataFrame = {
    val parsed = SparqlParser.parse(text)
    val c = new Compiler(spark, quads, stats, parsed.fromGraphs, parsed.fromNamed,
      encoded)
    if (parsed.isAsk) c.ask(parsed.op)
    else (parsed.construct, parsed.describe) match {
      case (Some(template), _) =>
        c.construct(c.compile(parsed.op, Algebra.templateVars(template)), template)
      case (_, Some(targets)) =>
        c.describe(c.compile(parsed.op,
          targets.collect { case Algebra.V(v) => v }.toSet), targets)
      case _ => c.toStrings(c.compile(parsed.op))
    }
  }

  /** Compile to term-struct solutions (engine-internal form). */
  def solutions(spark: SparkSession, quads: DataFrame, text: String): DataFrame = {
    val parsed = SparqlParser.parse(text)
    new Compiler(spark, quads,
      fromGraphs = parsed.fromGraphs, fromNamed = parsed.fromNamed)
      .compile(parsed.op)
  }
}

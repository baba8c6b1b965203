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

  /** SELECT/ASK → result DataFrame with one STRING column per
    * projected variable (ASK: single column `ask`).
    */
  def query(spark: SparkSession, quads: DataFrame, text: String,
      stats: Map[String, Long] = Map.empty): DataFrame = {
    val parsed = SparqlParser.parse(text)
    val c = new Compiler(spark, quads, stats, parsed.fromGraphs, parsed.fromNamed)
    if (parsed.isAsk) c.ask(parsed.op)
    else (parsed.construct, parsed.describe) match {
      case (Some(template), _) => c.construct(c.compile(parsed.op), template)
      case (_, Some(targets)) => c.describe(c.compile(parsed.op), targets)
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

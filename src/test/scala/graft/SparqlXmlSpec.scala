package graft

import org.apache.spark.sql.functions._

import graft.rdf.Rdf
import graft.rio.SparqlXml

/** Golden-envelope tests for the SPARQL results XML serializer (W3C
  * sparql-results+xml): term element forms (uri/bnode/literal with
  * lang/datatype), unbound omission, XML escaping, ASK envelope.
  */
class SparqlXmlSpec extends GraftSuite {

  private def sol(rows: Seq[(String, Int, String, String)], name: String) = {
    import spark.implicits._
    rows.toDF("l", "k", "d", "g")
      .select(Rdf.term(col("l"), col("k"), col("d"), col("g"),
        lit(null).cast("double")).as(name))
      .coalesce(1)
  }

  test("select envelope: uri, bnode, typed and lang literals, unbound") {
    import spark.implicits._
    val solutions = Seq(
      ("http://ex.org/a", Rdf.IRI, "", "", "30", Rdf.LIT, Rdf.XsdInteger, ""),
      ("b1", Rdf.BNODE, "", "", "hallo", Rdf.LIT, Rdf.XsdString, "de"))
      .toDF("xl", "xk", "xd", "xg", "yl", "yk", "yd", "yg")
      .select(
        Rdf.term(col("xl"), col("xk"), col("xd"), col("xg"),
          lit(null).cast("double")).as("x"),
        Rdf.term(col("yl"), col("yk"), col("yd"), col("yg"),
          lit(null).cast("double")).as("y"))
      .coalesce(1)
    val withNull = solutions.unionByName(
      Seq(("http://ex.org/c", Rdf.IRI, "", "")).toDF("xl", "xk", "xd", "xg")
        .select(Rdf.term(col("xl"), col("xk"), col("xd"), col("xg"),
          lit(null).cast("double")).as("x"),
          lit(null).cast(solutions.schema("y").dataType).as("y")))
    val out = SparqlXml.select(withNull)
    assert(out ==
      "<?xml version=\"1.0\"?>\n" +
        "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n" +
        "<head>\n" +
        "  <variable name=\"x\"/>\n" +
        "  <variable name=\"y\"/>\n" +
        "</head>\n" +
        "<results>\n" +
        "  <result>\n" +
        "    <binding name=\"x\"><uri>http://ex.org/a</uri></binding>\n" +
        "    <binding name=\"y\"><literal datatype=\"http://www.w3.org/2001/XMLSchema#integer\">30</literal></binding>\n" +
        "  </result>\n" +
        "  <result>\n" +
        "    <binding name=\"x\"><bnode>b1</bnode></binding>\n" +
        "    <binding name=\"y\"><literal xml:lang=\"de\">hallo</literal></binding>\n" +
        "  </result>\n" +
        "  <result>\n" +
        "    <binding name=\"x\"><uri>http://ex.org/c</uri></binding>\n" +
        "  </result>\n" +
        "</results>\n" +
        "</sparql>\n")
  }

  test("escapes markup in literals and attribute values") {
    val out = SparqlXml.select(sol(
      Seq(("""a<b>&"c""", Rdf.LIT, Rdf.XsdString, "")), "v"))
    assert(out.contains("<literal>a&lt;b&gt;&amp;\"c</literal>"))
    val lang = SparqlXml.select(sol(
      Seq(("x", Rdf.LIT, Rdf.XsdString, "de\"e")), "v"))
    assert(lang.contains("xml:lang=\"de&quot;e\""))
  }

  test("ask envelope") {
    assert(SparqlXml.ask(true).contains("<boolean>true</boolean>"))
    assert(SparqlXml.ask(false).contains("<boolean>false</boolean>"))
  }

  test("format switch on the facade serves all four SELECT formats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    val g = Graft.open(spark, dir)
    g.update("INSERT DATA { GRAPH <g:x> { ex:a ex:p \"v\" . } }")
    val q = "SELECT ?s ?o WHERE { ?s ex:p ?o }"
    assert(g.queryResults(q, "xml").contains("<uri>ex:a</uri>"))
    assert(g.queryResults(q, "json").contains("\"type\":\"uri\""))
    assert(g.queryResults(q, "csv").startsWith("s,o"))
    assert(g.queryResults(q, "tsv").startsWith("?s\t?o"))
    assert(g.queryResults("ASK { ex:a ex:p ?o }", "xml")
      .contains("<boolean>true</boolean>"))
    intercept[IllegalArgumentException](g.queryResults(q, "parquet"))
    intercept[IllegalArgumentException](
      g.queryResults("CONSTRUCT { ?s ex:q ?o } WHERE { ?s ex:p ?o }", "xml"))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import graft.rdf.TpchRdf
import graft.sparql.Sparql

/** SPARQL fine-print semantics (SURVEY §7 "hard parts" (2)): effective
  * boolean value, error-as-false filters, OPTIONAL identity, and the
  * exact SPARQL-JSON golden bytes.
  */
class SemanticsSpec extends GraftSuite {

  lazy val quads: DataFrame = TpchRdf.graphDf(spark, sf).cache()

  def q(text: String): Array[org.apache.spark.sql.Row] =
    Sparql.query(spark, quads, text).collect()

  test("EBV: empty string false, non-empty true, zero false, non-zero true") {
    def ask(filterExpr: String): Boolean =
      q(s"""ASK { ?r :name "ASIA" . FILTER($filterExpr) }""").head.getString(0) == "true"
    assert(!ask(""""""""))          // FILTER("") → false
    assert(ask(""""x""""))          // FILTER("x") → true
    assert(!ask("0"))               // FILTER(0) → false
    assert(ask("7"))                // FILTER(7) → true
    assert(!ask("1/0 > 0"))         // arithmetic error → type error → false
  }

  test("type error in FILTER removes the row rather than failing") {
    // comparing an IRI to a number is a type error → EBV error → false
    val rows = q("""SELECT ?r WHERE { ?r a :Region . FILTER(?r > 5) }""")
    assert(rows.isEmpty)
    // but the same pattern without the broken filter matches 5 regions
    assert(q("""SELECT ?r WHERE { ?r a :Region }""").length == 5)
  }

  test("OPTIONAL with empty group is identity") {
    val base = q("""SELECT ?r WHERE { ?r a :Region }""")
    val opt = q("""SELECT ?r WHERE { ?r a :Region OPTIONAL { } }""")
    assert(opt.map(_.getString(0)).sorted.sameElements(base.map(_.getString(0)).sorted))
  }

  test("unbound variables project as NULL and BOUND() sees them") {
    val rows = q("""
      SELECT ?s ?missing (BOUND(?missing) AS ?b) WHERE { ?s a :Region }""")
    assert(rows.length == 5)
    assert(rows.forall(r => r.isNullAt(1) && r.getString(2) == "false"))
  }

  test("SPARQL-JSON golden bytes for a fixed two-row result") {
    import graft.rio.SparqlJson
    val sols = Sparql.solutions(spark, quads, """
      SELECT ?r ?name WHERE { ?r a :Region . ?r :name ?name }
      ORDER BY ?name LIMIT 2""")
    val json = SparqlJson.select(sols)
    val expected =
      """{"head":{"vars":["r","name"]},"results":{"bindings":[""" +
        """{"r":{"type":"uri","value":"reg:0"},"name":{"type":"literal","value":"AFRICA"}},""" +
        """{"r":{"type":"uri","value":"reg:1"},"name":{"type":"literal","value":"AMERICA"}}]}}"""
    assert(json == expected)
  }
}

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

  test("DISTINCT inside aggregates applies to the value multiset") {
    val rows = q("""
      SELECT (SUM(DISTINCT ?v) AS ?s) (AVG(DISTINCT ?v) AS ?a)
             (GROUP_CONCAT(DISTINCT ?n; SEPARATOR=",") AS ?c)
             (SUM(?v) AS ?s_all)
      WHERE { VALUES (?v ?n) { (1 "x") (1 "x") (2 "y") } }""")
    // columns come back in projection order: s, a, c, s_all
    assert(rows.head.getString(0) == "3")          // 1+2, integer lexical
    assert(rows.head.getString(1) == "1.500000")   // avg is decimal
    assert(rows.head.getString(2) == "x,y")
    assert(rows.head.getString(3) == "4")          // non-distinct keeps dups
  }

  test("signed numbers after a value token parse as infix operators") {
    // `5-3` after BIND( is 5 minus 3, not the literals 5 and -3
    val r = q("""SELECT ?v WHERE { ?r :name "ASIA" . BIND(5-3 AS ?v) }""")
    assert(r.head.getString(0) == "2")
    def ask(e: String): Boolean =
      q(s"""ASK { ?r :name "ASIA" . FILTER($e) }""").head.getString(0) == "true"
    assert(ask("""STRLEN("ASIA")-1 = 3"""))
  }

  test("OPTIONAL hoists every stacked filter into the join condition") {
    // both filters reference the LEFT-bound ?rn; leaving either inside
    // the right side would resolve ?rn to unbound and kill all matches
    val rows = q("""
      SELECT ?rn ?nn WHERE {
        ?r a :Region . ?r :name ?rn .
        OPTIONAL { ?n :region ?r . ?n :name ?nn
                   FILTER(?nn > ?rn) FILTER(STRLEN(?rn) > 0) } }""")
    assert(rows.exists(r => !r.isNullAt(1)), "some nation must match both filters")
    val oneFilter = q("""
      SELECT ?rn ?nn WHERE {
        ?r a :Region . ?r :name ?rn .
        OPTIONAL { ?n :region ?r . ?n :name ?nn FILTER(?nn > ?rn) } }""")
    assert(rows.count(!_.isNullAt(1)) == oneFilter.count(!_.isNullAt(1)))
  }

  test("GRAPH restriction reaches a nested sub-SELECT") {
    val inRegion = q("""
      SELECT ?s WHERE { GRAPH g:region { { SELECT ?s WHERE { ?s ?p ?o } } } }""")
    val expected = quads.filter(
      org.apache.spark.sql.functions.col("g") === "g:region").count()
    assert(inRegion.length.toLong == expected,
      s"sub-select under GRAPH must scan only that graph (${inRegion.length} vs $expected)")
  }

  test("EXISTS composes inside boolean expressions") {
    def ask(e: String): Boolean =
      q(s"""ASK { ?r :name "ASIA" . FILTER($e) }""").head.getString(0) == "true"
    assert(ask("""EXISTS { ?r a :Region } && STRLEN("x") > 0"""))
    assert(!ask("""EXISTS { ?r a :Region } && STRLEN("") > 0"""))
    assert(ask("""NOT EXISTS { ?r a :Nation } || 1 > 2"""))
    assert(!ask("""!(EXISTS { ?r a :Region })"""))
  }

  test("MIN skips unbound inputs; MAX unaffected") {
    val r = q("""SELECT (MIN(?v) AS ?mn) (MAX(?v) AS ?mx)
                 WHERE { VALUES ?v { UNDEF 5 3 } }""")
    assert(r.head.getString(0) == "3")
    assert(r.head.getString(1) == "5")
  }

  test("aggregates in ORDER BY evaluate in the group context") {
    val r = q("""
      SELECT ?rname (COUNT(*) AS ?n) WHERE {
        ?nt :region ?r . ?r :name ?rname . ?nt a :Nation }
      GROUP BY ?rname ORDER BY DESC(COUNT(*)) ASC(?rname) LIMIT 1""")
    assert(r.length == 1)
    assert(r.head.getString(1) == "5") // 25 nations over 5 regions
  }

  test("SHA384/SHA512 match MessageDigest reference vectors") {
    def hex(alg: String, in: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(in.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = q("""
      SELECT ?h384 ?h512 WHERE {
        ?r :name "ASIA" .
        BIND(SHA384("abc") AS ?h384) BIND(SHA512("abc") AS ?h512) }""")
    assert(rows.head.getString(0) == hex("SHA-384", "abc"))
    assert(rows.head.getString(1) == hex("SHA-512", "abc"))
  }

  test("langMatches uses RFC 4647 subtag boundaries, not raw prefixes") {
    def m(tag: String, range: String): Boolean =
      q(s"""ASK { ?r :name "ASIA" .
            FILTER(LANGMATCHES("$tag", "$range")) }""").head.getString(0) == "true"
    assert(m("fr", "fr"))
    assert(m("fr-BE", "fr"))
    assert(m("FR-be", "fr"))       // case-insensitive
    assert(!m("fra", "fr"))        // raw prefix is NOT a match
    assert(m("de-DE-1996", "de-de"))
    assert(!m("de-Deva", "de-de"))
    assert(m("fr", "*") && !m("", "*"))
  }

  test("numeric promotion: integer-preserving DATATYPE answers") {
    val rows = q("""
      SELECT ?ii ?id ?div ?neg ?len WHERE {
        ?r :name "ASIA" .
        BIND(DATATYPE(1 + 2) AS ?ii)
        BIND(DATATYPE(1 + 2.5) AS ?id)
        BIND(DATATYPE(4 / 2) AS ?div)
        BIND(DATATYPE(-(3)) AS ?neg)
        BIND(DATATYPE(STRLEN("abc")) AS ?len) }""")
    val r = rows.head
    assert(r.getString(0) == "xsd:integer")
    assert(r.getString(1) == "xsd:decimal")
    assert(r.getString(2) == "xsd:decimal") // op:numeric-divide
    assert(r.getString(3) == "xsd:integer")
    assert(r.getString(4) == "xsd:integer")
  }

  test("TZ and TIMEZONE read stored lexical offsets") {
    val rows = q("""
      SELECT ?tz1 ?tz2 ?tz3 ?dur1 ?dur2 WHERE {
        ?r :name "ASIA" .
        BIND(STRDT("2011-01-10T14:45:13.815-05:00", xsd:dateTime) AS ?d1)
        BIND(STRDT("2011-01-10T14:45:13Z", xsd:dateTime) AS ?d2)
        BIND(STRDT("2011-01-10T14:45:13", xsd:dateTime) AS ?d3)
        BIND(TZ(?d1) AS ?tz1) BIND(TZ(?d2) AS ?tz2) BIND(TZ(?d3) AS ?tz3)
        BIND(TIMEZONE(?d1) AS ?dur1) BIND(TIMEZONE(?d2) AS ?dur2) }""")
    val r = rows.head
    assert(r.getString(0) == "-05:00")
    assert(r.getString(1) == "Z")
    assert(r.getString(2) == "")
    assert(r.getString(3) == "-PT5H")
    assert(r.getString(4) == "PT0S")
    // zero-hour offsets canonicalize without the hour component
    val r2 = q("""
      SELECT ?d WHERE { ?r :name "ASIA" .
        BIND(TIMEZONE(STRDT("2011-01-10T14:45:13-00:30", xsd:dateTime)) AS ?d) }""")
    assert(r2.head.getString(0) == "-PT30M")
  }

  test("xsd:double literals carry numeric values into comparisons") {
    // regression: a ^^xsd:double constant must compare numerically
    // ("9" < "40"), not lexically ("9.000000" > "40.000000")
    def ask(e: String): Boolean =
      q(s"""ASK { ?r :name "ASIA" . FILTER($e) }""").head.getString(0) == "true"
    assert(ask(""" "9"^^xsd:double < "40"^^xsd:double """))
    assert(ask(""" "9"^^xsd:double < 40 """))     // mixed double/integer
    assert(ask(""" "9.5"^^xsd:double + 1 > 10 """))
  }

  test("IN/NOT IN with empty lists evaluate, not crash") {
    def ask(e: String): Boolean =
      q(s"""ASK { ?r :name "ASIA" . FILTER($e) }""").head.getString(0) == "true"
    assert(!ask("?r IN ()"))
    assert(ask("?r NOT IN ()"))
  }

  test("xsd:integer cast truncates toward zero (SPARQL 17.5)") {
    val rows = q("""
      SELECT ?a ?b WHERE { ?r :name "ASIA" .
        BIND(xsd:integer(-2.5) AS ?a) BIND(xsd:integer(2.5) AS ?b) }""")
    // integer-typed results carry valid xsd:integer lexicals (no ".000000")
    assert(rows.head.getString(0) == "-2")
    assert(rows.head.getString(1) == "2")
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

  test("SPARQL-JSON streams large multi-partition results in order") {
    import graft.rio.SparqlJson
    import org.apache.spark.sql.functions._
    // 8 partitions, 10k rows — streams one partition at a time via
    // toLocalIterator; byte layout identical to the collected path
    val df = spark.range(0, 10000, 1, 8)
      .select(graft.rdf.Rdf.strLit(concat(lit("v"), col("id"))).as("x"))
    val json = SparqlJson.select(df)
    assert(json.startsWith("""{"head":{"vars":["x"]},"results":{"bindings":["""))
    assert(json.endsWith("]}}"))
    assert("\"type\":\"literal\"".r.findAllMatchIn(json).size == 10000)
    // partition order preserved (same as collect())
    assert(json.indexOf("\"v0\"") < json.indexOf("\"v5000\""))
    assert(json.indexOf("\"v5000\"") < json.indexOf("\"v9999\""))
  }
}

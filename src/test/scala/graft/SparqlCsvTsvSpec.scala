package graft

import org.apache.spark.sql.functions._

import graft.rdf.Rdf
import graft.rio.SparqlCsvTsv

/** Golden-byte tests for the SPARQL results CSV/TSV serializers (W3C
  * sparql-results-csv-tsv): CSV's lossy lexical projection with
  * RFC-4180 quoting vs TSV's lossless Turtle-style terms.
  */
class SparqlCsvTsvSpec extends GraftSuite {

  private lazy val solutions = {
    import spark.implicits._
    Seq(
      ("http://ex.org/a", Rdf.IRI, "", "", "plain, with comma", Rdf.LIT, Rdf.XsdString, ""),
      ("b1", Rdf.BNODE, "", "", "30", Rdf.LIT, Rdf.XsdInteger, ""),
      ("http://ex.org/c", Rdf.IRI, "", "", "hallo", Rdf.LIT, Rdf.XsdString, "de"))
      .toDF("xl", "xk", "xd", "xg", "yl", "yk", "yd", "yg")
      .select(
        Rdf.term(col("xl"), col("xk"), col("xd"), col("xg"),
          lit(null).cast("double")).as("x"),
        Rdf.term(col("yl"), col("yk"), col("yd"), col("yg"),
          lit(null).cast("double")).as("y"))
      .coalesce(1)
  }

  test("csv: lexical forms, rfc-4180 quoting, crlf, unbound empty") {
    import spark.implicits._
    val withNull = solutions.unionByName(
      Seq(("http://ex.org/d", Rdf.IRI, "", "")).toDF("xl", "xk", "xd", "xg")
        .select(Rdf.term(col("xl"), col("xk"), col("xd"), col("xg"),
          lit(null).cast("double")).as("x"),
          lit(null).cast(solutions.schema("y").dataType).as("y")))
    val out = SparqlCsvTsv.csv(withNull)
    assert(out ==
      "x,y\r\n" +
        "http://ex.org/a,\"plain, with comma\"\r\n" +
        "_:b1,30\r\n" +
        "http://ex.org/c,hallo\r\n" +
        "http://ex.org/d,\r\n")
  }

  test("tsv: turtle-style terms, ?-vars, datatype and lang preserved") {
    val out = SparqlCsvTsv.tsv(solutions)
    assert(out ==
      "?x\t?y\n" +
        "<http://ex.org/a>\t\"plain, with comma\"\n" +
        "_:b1\t\"30\"^^<http://www.w3.org/2001/XMLSchema#integer>\n" +
        "<http://ex.org/c>\t\"hallo\"@de\n")
  }

  test("tsv: escapes tabs, newlines and quotes inside literals") {
    import spark.implicits._
    val tricky = Seq(("a\tb\nc\"d", Rdf.LIT, Rdf.XsdString, ""))
      .toDF("l", "k", "d", "g")
      .select(Rdf.term(col("l"), col("k"), col("d"), col("g"),
        lit(null).cast("double")).as("v"))
    assert(SparqlCsvTsv.tsv(tricky) == "?v\n\"a\\tb\\nc\\\"d\"\n")
  }
}

package graft.rio

import org.apache.spark.sql.DataFrame

import graft.rdf.Rdf

/** SPARQL Query Results XML serializer (W3C `sparql-results+xml`) —
  * the fourth W3C result format next to [[SparqlJson]] and
  * [[SparqlCsvTsv]], the RDF4J `SPARQLResultsXMLWriter` sibling of the
  * JSON writer the reference pins (`GraphDBSystemAdapter.java:32`).
  *
  * Same streaming discipline as [[SparqlJson.writeSelect]]: rows flow
  * through `toLocalIterator` (one partition resident at a time) into
  * an `Appendable`, so driver memory is bounded by one partition, not
  * the result size.
  *
  * Envelope per spec: `<sparql>` in the results namespace, `<head>`
  * with one `<variable name=…/>` per projected var, `<results>` with
  * one `<result>` per solution and one `<binding name=…>` per BOUND
  * var (unbound = element omitted). Terms: `<uri>`, `<bnode>`,
  * `<literal>` with optional `xml:lang` / `datatype` (datatype IRIs
  * re-expanded to absolute form, like the TSV writer).
  */
object SparqlXml {

  private def escText(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case c => b.append(c)
    }
    b.toString
  }

  private def escAttr(s: String): String =
    escText(s).replace("\"", "&quot;").replace("\n", "&#10;")
      .replace("\r", "&#13;").replace("\t", "&#9;")

  private val header =
    "<?xml version=\"1.0\"?>\n" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n"

  private def head(vars: Seq[String]): String =
    vars.map(v => s"""  <variable name="${escAttr(v)}"/>\n""")
      .mkString("<head>\n", "", "</head>\n")

  private def term(lex: String, kind: Int, dt: String, lang: String): String =
    kind match {
      case Rdf.IRI => s"<uri>${escText(Rdf.expandIri(lex))}</uri>"
      case Rdf.BNODE => s"<bnode>${escText(lex)}</bnode>"
      case _ =>
        val attr =
          if (lang.nonEmpty) s""" xml:lang="${escAttr(lang)}""""
          else if (dt.nonEmpty && dt != Rdf.XsdString)
            s""" datatype="${escAttr(Rdf.expandIri(dt))}""""
          else ""
        s"<literal$attr>${escText(lex)}</literal>"
    }

  /** Stream a solutions DataFrame (term-struct columns, NULL =
    * unbound) as a SPARQL results XML document.
    */
  def writeSelect(solutions: DataFrame, out: Appendable): Unit = {
    val vars = solutions.columns
    out.append(header).append(head(vars.toIndexedSeq)).append("<results>\n")
    val it = solutions.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      out.append("  <result>\n")
      var i = 0
      while (i < vars.length) {
        if (!r.isNullAt(i)) {
          val t = r.getStruct(i)
          out.append(s"""    <binding name="${escAttr(vars(i))}">${term(
            t.getString(0), t.getInt(1), t.getString(2), t.getString(3))}</binding>\n""")
        }
        i += 1
      }
      out.append("  </result>\n")
    }
    out.append("</results>\n</sparql>\n")
  }

  /** Whole-document convenience wrapper over [[writeSelect]]. */
  def select(solutions: DataFrame): String = {
    val sb = new java.lang.StringBuilder
    writeSelect(solutions, sb)
    sb.toString
  }

  /** ASK envelope. */
  def ask(b: Boolean): String =
    header + "<head/>\n<boolean>" + b + "</boolean>\n</sparql>\n"
}

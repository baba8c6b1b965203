package graft.rio

import org.apache.spark.sql.DataFrame

import graft.rdf.Rdf

/** SPARQL 1.1 Query Results CSV and TSV serializers (W3C
  * `sparql-results-csv-tsv` — the other result formats the reference's
  * delegated RDF4J stack serves next to JSON, which the adapter itself
  * pins at `SPARQLResultsJSONWriter`, `GraphDBSystemAdapter.java:32`).
  *
  * Same streaming discipline as [[SparqlJson.writeSelect]]: rows flow
  * through `toLocalIterator` (one partition resident at a time) into
  * an `Appendable`, so driver memory is bounded by one partition, not
  * the result size.
  *
  * Per spec the two formats differ in more than the delimiter:
  *  - CSV is LOSSY: every term is its plain lexical form (no quoting
  *    of IRIs, no datatype/lang — but bnodes keep their `_:` marker
  *    per spec), RFC-4180 quoting (fields containing
  *    `"` `,` CR or LF are double-quoted, inner quotes doubled), CRLF
  *    row ends, unbound → empty field.
  *  - TSV is LOSSLESS: terms are serialized like Turtle — IRIs in
  *    `<>`, literals quoted with `\`-escapes plus `@lang` /
  *    `^^<datatype>`, bnodes as `_:label`; header vars carry `?`; LF
  *    row ends.
  */
object SparqlCsvTsv {

  private def csvField(s: String): String =
    if (s.exists(c => c == '"' || c == ',' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def tsvTerm(lex: String, kind: Int, dt: String, lang: String): String =
    kind match {
      // external consumers need absolute IRIs — re-expand the
      // harness-compacted forms (xsd:integer → full XMLSchema IRI)
      case Rdf.IRI => s"<${Rdf.expandIri(lex)}>"
      case Rdf.BNODE => s"_:$lex"
      case _ =>
        val quoted = "\"" + lex.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
        if (lang.nonEmpty) s"$quoted@$lang"
        else if (dt.nonEmpty && dt != Rdf.XsdString) s"$quoted^^<${Rdf.expandIri(dt)}>"
        else quoted
    }

  /** Stream a solutions DataFrame (term-struct columns, NULL =
    * unbound) as SPARQL results CSV.
    */
  def writeCsv(solutions: DataFrame, out: Appendable): Unit = {
    val vars = solutions.columns
    out.append(vars.map(csvField).mkString(",")).append("\r\n")
    val it = solutions.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      var i = 0
      while (i < vars.length) {
        if (i > 0) out.append(",")
        if (!r.isNullAt(i)) {
          val t = r.getStruct(i)
          // per spec bnodes keep the _: marker even in lossy CSV, so a
          // bnode label stays distinguishable from an equal plain literal
          val lex = if (t.getInt(1) == Rdf.BNODE) "_:" + t.getString(0)
            else t.getString(0)
          out.append(csvField(lex))
        }
        i += 1
      }
      out.append("\r\n")
    }
  }

  /** Stream a solutions DataFrame as SPARQL results TSV. */
  def writeTsv(solutions: DataFrame, out: Appendable): Unit = {
    val vars = solutions.columns
    out.append(vars.map("?" + _).mkString("\t")).append("\n")
    val it = solutions.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      var i = 0
      while (i < vars.length) {
        if (i > 0) out.append("\t")
        if (!r.isNullAt(i)) {
          val t = r.getStruct(i)
          out.append(tsvTerm(t.getString(0), t.getInt(1), t.getString(2), t.getString(3)))
        }
        i += 1
      }
      out.append("\n")
    }
  }

  /** Whole-document convenience wrappers. */
  def csv(solutions: DataFrame): String = {
    val sb = new java.lang.StringBuilder
    writeCsv(solutions, sb)
    sb.toString
  }
  def tsv(solutions: DataFrame): String = {
    val sb = new java.lang.StringBuilder
    writeTsv(solutions, sb)
    sb.toString
  }
}

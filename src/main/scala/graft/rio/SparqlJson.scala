package graft.rio

import org.apache.spark.sql.DataFrame

import graft.rdf.Rdf

/** SPARQL 1.1 Results JSON serializer — the reference's result format
  * for every SELECT task: `SPARQLResultsJSONWriter`
  * (`GraphDBSystemAdapter.java:32,249`), with the envelope
  * `{"head":{"vars":[…]},"results":{"bindings":[…]}}` visible in the
  * hand-written fallback document at `GraphDBSystemAdapter.java:254`.
  *
  * Serialization happens at the adapter edge after execution, on
  * collected rows — benchmark task results are human-scale by
  * construction (the reference also buffers the whole document in a
  * ByteArrayOutputStream before shipping it, `:247-249`). Big result
  * exports at 100 TB go through parquet sinks instead, not this path.
  */
object SparqlJson {

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** One binding object per the W3C vocabulary:
    * `{"type":"uri"|"literal"|"bnode","value":…[,"datatype"|"xml:lang"]}`.
    */
  private def binding(lex: String, kind: Int, dt: String, lang: String): String = {
    val typ = kind match {
      case Rdf.IRI => "uri"
      case Rdf.BNODE => "bnode"
      case _ => "literal"
    }
    val extra =
      if (kind == Rdf.LIT && lang.nonEmpty) s""","xml:lang":"${esc(lang)}""""
      else if (kind == Rdf.LIT && dt.nonEmpty && dt != Rdf.XsdString)
        s""","datatype":"${esc(dt)}""""
      else ""
    s"""{"type":"$typ","value":"${esc(lex)}"$extra}"""
  }

  /** Serialize a solutions DataFrame (term-struct columns, unbound =
    * NULL → binding omitted, per spec).
    */
  def select(solutions: DataFrame): String = {
    val vars = solutions.columns
    val rows = solutions.collect()
    val bindings = rows.map { r =>
      val fields = vars.indices.flatMap { i =>
        if (r.isNullAt(i)) None
        else {
          val t = r.getStruct(i)
          Some(s""""${esc(vars(i))}":${binding(
            t.getString(0), t.getInt(1), t.getString(2), t.getString(3))}""")
        }
      }
      fields.mkString("{", ",", "}")
    }
    s"""{"head":{"vars":[${vars.map(v => s""""${esc(v)}"""").mkString(",")}]},""" +
      s""""results":{"bindings":[${bindings.mkString(",")}]}}"""
  }

  /** ASK envelope. */
  def ask(b: Boolean): String = s"""{"head":{},"boolean":$b}"""

  /** The reference's placeholder document emitted when query evaluation
    * fails (`GraphDBSystemAdapter.java:251-258`): a 1-var, 1-binding
    * literal "XXX" result, protocol-compatible with eval storage.
    */
  val failurePlaceholder: String =
    """{"head":{"vars":["xxx"]},"results":{"bindings":[{"xxx":{"type":"literal","value":"XXX"}}]}}"""
}

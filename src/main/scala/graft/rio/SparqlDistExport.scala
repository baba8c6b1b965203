package graft.rio

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.rdf.Rdf

/** DISTRIBUTED SELECT-result export — the `NQuads.lineCol` treatment
  * (r7) applied to the W3C result formats: one output line per
  * solution row, built entirely from codegen'd expressions, so
  * `df.select(line).write.text(path)` dumps a result set of any size
  * as a map-only write (no driver materialization, no shuffle, output
  * partitioning follows the input). The STREAMED single-document
  * writers ([[SparqlJson.writeSelect]], [[SparqlCsvTsv]]) remain the
  * protocol-envelope path (`GraphDBSystemAdapter.java:246-258` returns
  * one JSON document per task); this is the bulk path a 100 TB-scale
  * result needs.
  *
  * Format contract:
  *  - `json`: NDJSON — each line is one complete W3C bindings object
  *    (`{"var":{"type":…,"value":…[,"datatype"|"xml:lang":…]},…}`,
  *    unbound vars omitted, all-unbound row = `{}`), plus a
  *    `_head.json` sidecar holding the `{"head":{"vars":[…]}}`
  *    envelope. Concatenating head + lines (joined by commas inside
  *    `"bindings":[…]`) reconstructs the single-document form.
  *    Escaping is Jackson's (`to_json`): identical to the streamed
  *    writer on `"` `\\` `\n` `\r` `\t`; exotic control characters
  *    serialize as short escapes (`\b`, `\f`) where the streamed
  *    writer always uses `\\u00XX` — both valid JSON encodings of the
  *    same string.
  *  - `csv`: RFC-4180 rows (lossy lexical forms, bnodes keep `_:`,
  *    fields containing `"` `,` CR LF are quoted with inner quotes
  *    doubled, CRLF row ends — [[SparqlCsvTsv.writeCsv]] semantics),
  *    plus a `_header.csv` sidecar with the var-name header row.
  */
object SparqlDistExport {

  /** W3C binding object for one term-struct column, as a struct whose
    * null fields `to_json` omits (datatype/xml:lang are exclusive and
    * only set for literals, mirroring [[SparqlJson]]'s binding()).
    */
  private def bindingStruct(t: Column): Column = {
    val typ = when(t("kind") === Rdf.IRI, lit("uri"))
      .when(t("kind") === Rdf.BNODE, lit("bnode"))
      .otherwise(lit("literal"))
    val lang = when(t("kind") === Rdf.LIT && t("lang") =!= "", t("lang"))
    val dt = when(t("kind") === Rdf.LIT && (t("lang").isNull || t("lang") === "")
      && t("dt") =!= "" && t("dt") =!= Rdf.XsdString, t("dt"))
    struct(typ.as("type"), t("lex").as("value"),
      dt.as("datatype"), lang.as("xml:lang"))
  }

  /** One NDJSON bindings line per row (codegen'd `to_json`; null
    * struct fields — unbound vars, absent datatype/lang — are omitted
    * by the generator). Null omission is pinned EXPLICITLY: the W3C
    * format contract must not depend on the session's
    * `spark.sql.jsonGenerator.ignoreNullFields` default, which a
    * caller may have set to false.
    */
  def jsonLineCol(solutions: DataFrame): Column =
    to_json(struct(solutions.columns.map(v =>
      when(col(v).isNotNull, bindingStruct(col(v))).as(v)): _*),
      Map("ignoreNullFields" -> "true"))

  /** The `{"head":{"vars":[…]}}` manifest for a variable list. */
  def headJson(vars: Seq[String]): String = {
    val esc = vars.map(v => "\"" + v.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"")
    s"""{"head":{"vars":[${esc.mkString(",")}]}}"""
  }

  /** RFC-4180 CSV field of one term-struct column (lossy lexical form,
    * `_:` marker on bnodes, quote-when-needed, unbound = empty).
    */
  private def csvFieldCol(t: Column): Column = {
    val lex = when(t("kind") === Rdf.BNODE, concat(lit("_:"), t("lex")))
      .otherwise(t("lex"))
    when(t.isNull, lit(""))
      .when(lex.rlike("[\",\n\r]"),
        concat(lit("\""), regexp_replace(lex, "\"", "\"\""), lit("\"")))
      .otherwise(lex)
  }

  /** One CSV row per solution (CR appended — `.text` adds the LF). */
  def csvLineCol(solutions: DataFrame): Column =
    concat(concat_ws(",",
      solutions.columns.map(v => coalesce(csvFieldCol(col(v)), lit(""))): _*),
      lit("\r"))

  def csvHeader(vars: Seq[String]): String = {
    def field(s: String): String =
      if (s.exists(c => c == '"' || c == ',' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    vars.map(field).mkString(",") + "\r"
  }

  private def writeSidecar(df: DataFrame, path: String, name: String,
      content: String): Unit = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, true)
    try os.write((content + "\n").getBytes("UTF-8")) finally os.close()
  }

  /** Partitioned NDJSON bindings export + `_head.json` sidecar. */
  def writeJsonBindings(solutions: DataFrame, path: String): Unit = {
    solutions.select(jsonLineCol(solutions).as("value"))
      .write.mode("overwrite").text(path)
    writeSidecar(solutions, path, "_head.json",
      headJson(solutions.columns.toSeq))
  }

  /** Partitioned CSV rows export + `_header.csv` sidecar. */
  def writeCsvRows(solutions: DataFrame, path: String): Unit = {
    solutions.select(csvLineCol(solutions).as("value"))
      .write.mode("overwrite").text(path)
    writeSidecar(solutions, path, "_header.csv",
      csvHeader(solutions.columns.toSeq))
  }
}

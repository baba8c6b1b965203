package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RDF term model for the quad store.
  *
  * The reference's unit of data is the RDF statement `(s, p, o, g)`
  * loaded into named graphs (`GraphDBSystemAdapter.java:286`, graph IRI
  * built at `:279`); terms are IRIs, blank nodes, or literals with an
  * optional datatype/language (`GraphDBSystemAdapter.java:254` shows the
  * `{"type":…,"value":…}` binding shape).
  *
  * Spark-native representation: a term is a non-null STRUCT column
  *
  * {{{ struct(lex: STRING, kind: INT, dt: STRING, lang: STRING, num: DOUBLE) }}}
  *
  *  - `lex`   lexical form (IRI text, bnode label, literal value) — never null
  *  - `kind`  0 = IRI, 1 = blank node, 2 = literal — never null
  *  - `dt`    literal datatype tag ("" for IRI/bnode) — never null
  *  - `lang`  BCP47 language tag or "" — never null
  *  - `num`   typed numeric sidecar (null unless numeric literal) — the
  *            "literal index" role (`repo-config.ttl:41`): value-space
  *            comparisons and range filters run on this double column and
  *            push down to parquet min/max, instead of parsing lexical
  *            forms per row.
  *
  * Term identity (sameTerm, join keys) is `(lex, kind)` — dt/lang
  * disambiguation is not needed because the canonicalizer writes one
  * lexical form per value space. Joins therefore compile to plain string
  * equality, which Catalyst pushes into shuffles/broadcasts untouched.
  *
  * Scale note (100 TB): the quad table is stored partitioned by `g` and
  * sorted by `(p.lex, s.lex)` within files, so a constant-predicate
  * triple pattern — the overwhelmingly common case — becomes a
  * min/max-pruned scan, playing the role of the reference's POS/PSO
  * statement indexes (`repo-config.ttl:31`). Dictionary-encoding of lex
  * strings is left to parquet dictionary pages at this layer; a
  * 64-bit-id term dictionary (SURVEY §1.5) can be layered on later
  * without changing the algebra.
  */
object Rdf {
  val IRI = 0
  val BNODE = 1
  val LIT = 2

  /** Harness-wide compacted namespace table (the four vocabularies the
    * store keeps in `prefix:local` form). Serializers that must emit
    * absolute IRIs ([[expandIri]], RdfXml's qname splitter) re-expand
    * through this one table so the mapping can never drift.
    */
  val wellKnownNs: Seq[(String, String)] = Seq(
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#" -> "rdf:",
    "http://www.w3.org/2000/01/rdf-schema#" -> "rdfs:",
    "http://www.w3.org/2002/07/owl#" -> "owl:",
    "http://www.w3.org/2001/XMLSchema#" -> "xsd:")

  /** Re-expand a harness-compacted IRI (`xsd:integer`) to its absolute
    * form; absolute IRIs pass through unchanged.
    */
  def expandIri(iri: String): String =
    wellKnownNs.collectFirst {
      case (ns, p) if iri.startsWith(p) => ns + iri.substring(p.length)
    }.getOrElse(iri)

  /** RFC 3986 §5.2.4 remove_dot_segments over a path component:
    * `a/./b` → `a/b`, `a/b/../c` → `a/c`, with trailing `.`/`..`
    * keeping their directory slash. Applied only to RESOLVED
    * references — already-absolute IRIs keep their lexical identity.
    */
  private def removeDotSegments(path: String): String = {
    var in = path
    val out = new StringBuilder
    def dropLastSeg(): Unit = {
      val i = out.lastIndexOf("/")
      out.setLength(if (i < 0) 0 else i)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); dropLastSeg() }
      else if (in == "/..") { in = "/"; dropLastSeg() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val i = in.indexOf('/', start)
        val seg = if (i < 0) in else in.substring(0, i)
        out.append(seg)
        in = if (i < 0) "" else in.substring(i)
      }
    }
    out.toString
  }

  /** Normalize the PATH component of a resolved IRI (leave scheme,
    * authority, query and fragment untouched).
    */
  private def normalizePath(iri: String): String = {
    val cut = {
      val q = iri.indexOf('?'); val f = iri.indexOf('#')
      if (q >= 0 && (f < 0 || q < f)) q else f
    }
    val (body, tail) =
      if (cut >= 0) (iri.substring(0, cut), iri.substring(cut)) else (iri, "")
    val schemeEnd = body.indexOf("://")
    val pathStart =
      if (schemeEnd >= 0) body.indexOf('/', schemeEnd + 3)
      else body.indexOf('/')
    if (pathStart < 0) iri
    else body.substring(0, pathStart) +
      removeDotSegments(body.substring(pathStart)) + tail
  }

  /** RFC 3986 relative-reference resolution for `@base` / `BASE`
    * (Turtle §6.3, SPARQL §19.8 prologue): scheme-qualified refs pass
    * through; fragment / network-path / absolute-path / relative-path
    * refs graft onto the base with §5.2.4 dot-segment removal, so
    * `<../up>` against `http://ex.org/data/` is `http://ex.org/up` —
    * term identity matches what a conformant engine mints.
    */
  def resolveIri(ref: String, base: String): String = {
    if (base.isEmpty) return ref
    if (ref.isEmpty) return base
    val isAbsolute = {
      val c = ref.indexOf(':')
      c > 0 && ref.substring(0, c).forall(ch =>
        ch.isLetterOrDigit || ch == '+' || ch == '.' || ch == '-') &&
        ref.charAt(0).isLetter
    }
    if (isAbsolute) ref
    else if (ref.startsWith("#")) base.takeWhile(_ != '#') + ref
    else if (ref.startsWith("//")) base.takeWhile(_ != ':') + ":" + ref
    else {
      val r = ref
      val schemeEnd = base.indexOf("://")
      val merged =
        if (r.startsWith("/")) {
          if (schemeEnd < 0) base.takeWhile(_ != '/') + r
          else {
            val pathStart = base.indexOf('/', schemeEnd + 3)
            (if (pathStart < 0) base else base.substring(0, pathStart)) + r
          }
        } else {
          val floor = if (schemeEnd < 0) -1 else schemeEnd + 2
          val lastSlash = base.lastIndexOf('/')
          if (lastSlash > floor) base.substring(0, lastSlash + 1) + r
          else base + "/" + r
        }
      normalizePath(merged)
    }
  }

  val XsdString = "xsd:string"
  val XsdDecimal = "xsd:decimal"
  val XsdInteger = "xsd:integer"
  val XsdDate = "xsd:date"
  val XsdDateTime = "xsd:dateTime"
  val XsdBoolean = "xsd:boolean"
  val RdfType = "rdf:type"

  def numericDt(dt: Column): Column = dt.isin(XsdDecimal, XsdInteger, "xsd:double")

  /** Canonical lexical form of a numeric value: fixed-scale DECIMAL(28,6)
    * rendering, identical across engines (Spark and DuckDB both print
    * decimals with all `scale` digits). Keeps float formatting out of
    * term identity.
    */
  def canonNumLex(c: Column): Column =
    c.cast("double").cast("decimal(28,6)").cast("string")

  /** DuckDB spelling of [[canonNumLex]] — used by oracle generators. */
  def canonNumLexSql(e: String): String =
    s"CAST(CAST(($e)::DOUBLE AS DECIMAL(28,6)) AS VARCHAR)"

  /** Canonical lexical form of an INTEGER-typed value: no decimal
    * point — `"5.000000"` is not a valid xsd:integer lexical per
    * XSD 1.1, so integer-datatyped terms render `"5"` (the value is
    * integral by construction; scale-0 decimal just drops the point).
    */
  def canonIntLex(c: Column): Column =
    c.cast("double").cast("decimal(28,0)").cast("string")

  /** DuckDB spelling of [[canonIntLex]] — used by oracle generators. */
  def canonIntLexSql(e: String): String =
    s"CAST(CAST(($e)::DOUBLE AS DECIMAL(28,0)) AS VARCHAR)"

  def term(lex: Column, kind: Column, dt: Column, lang: Column, num: Column): Column =
    struct(lex.as("lex"), kind.as("kind"), dt.as("dt"), lang.as("lang"), num.as("num"))

  def iri(lex: Column): Column =
    term(lex, lit(IRI), lit(""), lit(""), lit(null).cast("double"))

  def bnode(lex: Column): Column =
    term(lex, lit(BNODE), lit(""), lit(""), lit(null).cast("double"))

  def strLit(lex: Column): Column =
    term(lex, lit(LIT), lit(XsdString), lit(""), lit(null).cast("double"))

  def langLit(lex: Column, lang: Column): Column =
    term(lex, lit(LIT), lit(XsdString), lang, lit(null).cast("double"))

  def numLit(value: Column, dt: String = XsdDecimal): Column =
    term(canonNumLex(value), lit(LIT), lit(dt), lit(""), value.cast("double"))

  def dateLit(value: Column): Column =
    term(value.cast("date").cast("string"), lit(LIT), lit(XsdDate), lit(""),
      lit(null).cast("double"))

  def boolLit(value: Column): Column =
    term(when(value, "true").otherwise("false"), lit(LIT), lit(XsdBoolean), lit(""),
      when(value, 1.0).otherwise(0.0))

  /** A concrete term as a literal Column (for pattern constants). */
  def constTerm(lex: String, kind: Int, dt: String = "", lang: String = ""): Column = {
    val num =
      if (dt == XsdDecimal || dt == XsdInteger || dt == "xsd:double")
        lit(lex.toDouble)
      else if (dt == XsdBoolean) lit(if (lex == "true") 1.0 else 0.0)
      else lit(null).cast("double")
    term(lit(lex), lit(kind), lit(dt), lit(lang), num)
  }

  /** SPARQL total-order sort key over terms: unbound < bnode < IRI <
    * literal; literals numeric-first by value, then lexical
    * (SPARQL 1.1 §15.1 ORDER BY term ordering).
    */
  def sortKey(t: Column): Column =
    struct(
      when(t.isNull, 0).when(t("kind") === BNODE, 1).when(t("kind") === IRI, 2)
        .otherwise(3).as("rank"),
      when(t.isNull, 1).when(t("num").isNotNull, 0).otherwise(1).as("numflag"),
      coalesce(t("num"), lit(0.0)).as("num"),
      coalesce(t("lex"), lit("")).as("lex"))
}

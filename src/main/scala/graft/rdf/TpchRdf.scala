package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The deterministic quads view derived from the driver's TPC-H-ish
  * parquet tables — the RDF dataset the SPARQL engine is tested on
  * (SURVEY §5.2: "SPARQL-specific ops run over a quads view derived
  * from those tables so DuckDB can compute the same answer").
  *
  * Every mapping below is emitted TWICE from one spec: as a Spark
  * `DataFrame` of term-struct quads ([[graphDf]]) and as DuckDB SQL
  * text ([[quadsSql]]) used inside each oracle's `WITH quads AS (…)`.
  * Single-spec emission is what keeps the two engines from drifting.
  *
  * Graph layout mirrors the reference's versioned named graphs
  * (`GraphDBSystemAdapter.java:318`: one graph per load phase): one
  * graph per source table (`g:orders`, `g:customer`, …) plus a
  * `g:schema` ontology graph carrying the RDFS/OWL axioms that drive
  * the OWL-Horst materializer (ruleset per `repo-config.ttl:26`).
  */
object TpchRdf {
  import Rdf._

  // ---- single source of truth for the mapping -------------------------

  sealed trait OSpec
  /** object = IRI built as prefix + key column */
  final case class ORef(prefix: String, key: String) extends OSpec
  /** object = string literal column */
  final case class OStr(colName: String) extends OSpec
  /** object = numeric literal column */
  final case class ONum(colName: String) extends OSpec
  /** object = date literal column (timestamp in parquet) */
  final case class ODate(colName: String) extends OSpec
  /** object = constant IRI (rdf:type objects) */
  final case class OConst(iriLex: String) extends OSpec

  final case class TableMap(
      table: String, subjPrefix: String, subjKey: String,
      props: Seq[(String, OSpec)])

  /** The mapping spec. `lineitem`/`part`/`events` are deliberately left
    * relational-only: quads carry the graph-shaped slice of the schema
    * (orders→customer→nation→region + supplier), which is what the
    * SPARQL/path/inference operators exercise.
    */
  val maps: Seq[TableMap] = Seq(
    TableMap("orders", "ord:", "o_orderkey", Seq(
      RdfType -> OConst(":Order"),
      ":custkey" -> ORef("cust:", "o_custkey"),
      ":totalprice" -> ONum("o_totalprice"),
      ":orderdate" -> ODate("o_orderdate"),
      ":orderstatus" -> OStr("o_orderstatus"))),
    TableMap("customer", "cust:", "c_custkey", Seq(
      RdfType -> OConst(":Customer"),
      ":nation" -> ORef("nat:", "c_nationkey"),
      ":acctbal" -> ONum("c_acctbal"),
      ":mktsegment" -> OStr("c_mktsegment"),
      ":name" -> OStr("c_name"))),
    TableMap("supplier", "sup:", "s_suppkey", Seq(
      RdfType -> OConst(":Supplier"),
      ":nation" -> ORef("nat:", "s_nationkey"),
      ":acctbal" -> ONum("s_acctbal"),
      ":name" -> OStr("s_name"))),
    TableMap("nation", "nat:", "n_nationkey", Seq(
      RdfType -> OConst(":Nation"),
      ":region" -> ORef("reg:", "n_regionkey"),
      ":name" -> OStr("n_name"))),
    TableMap("region", "reg:", "r_regionkey", Seq(
      RdfType -> OConst(":Region"),
      ":name" -> OStr("r_name"))))

  /** Ontology axioms (graph `g:schema`): a small class hierarchy, a
    * transitive super-property of the nation/region links, and sameAs
    * aliases for the five regions — enough to exercise every OWL-Horst
    * rule family the materializer implements (SURVEY §2.C).
    */
  val schemaTriples: Seq[(String, String, String)] = Seq(
    (":Customer", "rdfs:subClassOf", ":Agent"),
    (":Supplier", "rdfs:subClassOf", ":Agent"),
    (":Agent", "rdfs:subClassOf", ":Thing"),
    (":Nation", "rdfs:subClassOf", ":Place"),
    (":Region", "rdfs:subClassOf", ":Place"),
    (":Place", "rdfs:subClassOf", ":Thing"),
    (":nation", "rdfs:subPropertyOf", ":locatedIn"),
    (":region", "rdfs:subPropertyOf", ":locatedIn"),
    (":locatedIn", RdfType, "owl:TransitiveProperty"),
    (":custkey", "rdfs:range", ":Customer"),
    (":custkey", "rdfs:domain", ":Order"),
    ("regalias:0", "owl:sameAs", "reg:0"),
    ("regalias:1", "owl:sameAs", "reg:1"),
    ("regalias:2", "owl:sameAs", "reg:2"),
    ("regalias:3", "owl:sameAs", "reg:3"),
    ("regalias:4", "owl:sameAs", "reg:4"),
    // pD* long-tail fixtures (the rest of `owl-horst-optimized`,
    // `repo-config.ttl:26`): a functional property with two values for
    // one subject (rdfp1 → derived sameAs), an inverse-functional
    // property shared by two subjects (rdfp2 → derived sameAs), an
    // owl:hasValue restriction on the transitive :locatedIn (rdfp14a/b),
    // a someValuesFrom restriction (rdfp15) and an allValuesFrom
    // restriction reached through rdfs9 (rdfp16)
    (":hq", RdfType, "owl:FunctionalProperty"),
    ("corp:1", ":hq", "hq:a"),
    ("corp:1", ":hq", "hq:b"),
    (":code", RdfType, "owl:InverseFunctionalProperty"),
    ("dup:a", ":code", "code:X"),
    ("dup:b", ":code", "code:X"),
    (":AfricanThing", "owl:onProperty", ":locatedIn"),
    (":AfricanThing", "owl:hasValue", "reg:0"),
    ("special:1", RdfType, ":AfricanThing"),
    (":Located", "owl:onProperty", ":locatedIn"),
    (":Located", "owl:someValuesFrom", ":Place"),
    (":GeoSourced", "owl:onProperty", ":region"),
    (":GeoSourced", "owl:allValuesFrom", ":MappedRegion"),
    (":Nation", "rdfs:subClassOf", ":GeoSourced"),
    // typed-literal hasValue (rdfp14a/b datatype fidelity): members of
    // :PriorityFive carry :prio "5"^^xsd:integer — the restriction's
    // value term, with its datatype, must round-trip through the rules
    (":PriorityFive", "owl:onProperty", ":prio"))

  /** Schema rows whose OBJECT is a typed literal — (s, p, lex,
    * datatype). Kept in a separate list because [[schemaTriples]] is
    * all-IRI; emitted into the same `g:schema` graph by BOTH engines.
    * `thing:9` asserts the value edge (rdfp14a premise: it gains
    * `rdf:type :PriorityFive`); `special:2` asserts only the typing
    * (rdfp14b premise: it gains the typed value edge).
    */
  val schemaTypedTriples: Seq[(String, String, String, String)] = Seq(
    (":PriorityFive", "owl:hasValue", "5", XsdInteger),
    ("thing:9", ":prio", "5", XsdInteger))

  /** IRI-object instance rows living alongside the typed fixtures. */
  private val schemaInstanceTriples: Seq[(String, String, String)] = Seq(
    ("special:2", RdfType, ":PriorityFive"))

  // ---- Spark emission -------------------------------------------------

  private def oTerm(df: DataFrame, o: OSpec): Column = o match {
    case ORef(pfx, key) => iri(concat(lit(pfx), df(key).cast("string")))
    case OStr(c)        => strLit(df(c))
    case ONum(c)        => numLit(df(c))
    case ODate(c)       => dateLit(df(c))
    case OConst(x)      => iri(lit(x))
  }

  /** Quads of one source table, columns (g, s, p, o). ONE scan per
    * table: all properties are built as an array of (p, o) structs and
    * exploded, instead of a union of per-property selects that re-reads
    * the parquet once per property — at load scale, the difference
    * between reading each source byte once and |props| times.
    */
  def tableDf(spark: SparkSession, dir: String, m: TableMap): DataFrame = {
    val src = Tables(spark, dir, m.table)
    val subj = iri(concat(lit(m.subjPrefix), src(m.subjKey).cast("string")))
    val pairs = m.props.map { case (pred, ospec) =>
      struct(iri(lit(pred)).as("p"), oTerm(src, ospec).as("o"))
    }
    src.select(lit("g:" + m.table).as("g"), subj.as("s"),
        explode(array(pairs: _*)).as("po"))
      .select(col("g"), col("s"), col("po")("p").as("p"), col("po")("o").as("o"))
  }

  def schemaDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val iriRows = (schemaTriples ++ schemaInstanceTriples)
      .toDF("sl", "pl", "ol").select(
        lit("g:schema").as("g"), iri(col("sl")).as("s"),
        iri(col("pl")).as("p"), iri(col("ol")).as("o"))
    val typedRows = schemaTypedTriples.toDF("sl", "pl", "olex", "odt").select(
      lit("g:schema").as("g"), iri(col("sl")).as("s"), iri(col("pl")).as("p"),
      term(col("olex"), lit(LIT), col("odt"), lit(""),
        when(numericDt(col("odt")), col("olex").cast("double"))
          .otherwise(lit(null).cast("double"))).as("o"))
    iriRows.unionAll(typedRows)
  }

  /** The full quads DataFrame (g, s, p, o term structs). */
  def graphDf(spark: SparkSession, dir: String): DataFrame =
    (maps.map(tableDf(spark, dir, _)) :+ schemaDf(spark)).reduce(_.unionAll(_))

  // ---- DuckDB emission (oracle side) ----------------------------------

  private def oSql(o: OSpec): (String, Int, String) = o match {
    case ORef(pfx, key) => (s"'$pfx' || CAST($key AS VARCHAR)", IRI, "NULL")
    case OStr(c)        => (s"$c", LIT, "NULL")
    case ONum(c)        => (canonNumLexSql(c), LIT, s"($c)::DOUBLE")
    case ODate(c)       => (s"CAST(CAST($c AS DATE) AS VARCHAR)", LIT, "NULL")
    case OConst(x)      => (s"'$x'", IRI, "NULL")
  }

  /** DuckDB CTE body: columns (g, s, p, o, okind, onum). Identity rules
    * match the Spark side exactly ([[Rdf]] term identity = lex+kind).
    */
  lazy val quadsSql: String = {
    val tableSelects = maps.flatMap { m =>
      val subj = s"'${m.subjPrefix}' || CAST(${m.subjKey} AS VARCHAR)"
      m.props.map { case (pred, ospec) =>
        val (oe, okind, onum) = oSql(ospec)
        s"SELECT 'g:${m.table}' AS g, $subj AS s, '$pred' AS p, $oe AS o, $okind AS okind, $onum AS onum FROM ${m.table}"
      }
    }
    val schemaRows = (schemaTriples ++ schemaInstanceTriples)
      .map { case (s, p, o) => s"('$s','$p','$o')" }.mkString(", ")
    val schemaSelect =
      s"SELECT 'g:schema' AS g, c0 AS s, c1 AS p, c2 AS o, $IRI AS okind, NULL::DOUBLE AS onum " +
        s"FROM (VALUES $schemaRows) t(c0,c1,c2)"
    // typed-literal schema rows: okind = LIT, numeric datatypes carry the
    // value sidecar (same identity rules as the Spark emission above)
    val typedSelects = schemaTypedTriples.map { case (s, p, lex, dt) =>
      val onum =
        if (dt == XsdInteger || dt == XsdDecimal || dt == "xsd:double")
          s"($lex)::DOUBLE"
        else "NULL::DOUBLE"
      s"SELECT 'g:schema' AS g, '$s' AS s, '$p' AS p, '$lex' AS o, $LIT AS okind, $onum AS onum"
    }
    (tableSelects ++ (schemaSelect +: typedSelects)).mkString("\n      UNION ALL ")
  }

  /** Wrap an oracle query body with the quads CTE. */
  def withQuads(body: String): String =
    s"WITH quads AS (\n      $quadsSql\n      )\n$body"

  /** Same, plus extra (possibly recursive) CTEs after the quads CTE. */
  def withQuadsAnd(extraCtes: String, body: String): String =
    s"WITH RECURSIVE quads AS (\n      $quadsSql\n      ),\n${extraCtes.trim}\n$body"
}

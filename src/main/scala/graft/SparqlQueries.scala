package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.rdf.{Rdf, TpchRdf}
import graft.sparql.Sparql
import Queries.Q

/** SPARQL operator registry (SURVEY §2.B): every entry runs REAL SPARQL
  * text through the full stack — parser → algebra → DataFrame — over
  * the quads view derived from the driver's parquet
  * ([[TpchRdf]]), with a relational DuckDB oracle over the
  * IDENTICAL quads CTE. This is the t2 contract for the delegated
  * query surface of the reference (`GraphDBSystemAdapter.java:246`).
  */
object SparqlQueries {

  private def canon(e: String): String = Rdf.canonNumLexSql(e)
  // integer-typed results (COUNT, STRLEN) render integer lexicals
  private def canonInt(e: String): String = Rdf.canonIntLexSql(e)

  // Per-(session, sfDir) caches (DfCache — applicationId+sessionUUID
  // keyed, evicted on application end): the quads view is shared by
  // every SPARQL entry and the OWL-Horst materialization is shared by
  // the inference entries — materializing once and persisting mirrors
  // the reference, where inference is a LOAD-time cost paid once, not
  // a per-query cost (`repo-config.ttl:26`).
  private def quads(s: SparkSession, dir: String): DataFrame =
    graft.core.DfCache.df(s, dir, "quads")(TpchRdf.graphDf(s, dir))

  private def materialized(s: SparkSession, dir: String): DataFrame =
    // OwlHorst.materialize returns an already-checkpointed leaf —
    // persisting a second copy on top would double the storage
    graft.core.DfCache.df(s, dir, "owlhorst_mat", persist = false) {
      graft.infer.OwlHorst.materialize(s, quads(s, dir))
    }

  /** Id-encoded view of a quads DataFrame (SURVEY §1.5 term
    * dictionary, the query-hot-path wiring): encoded quads + the
    * decode dictionary, built once per (session, dataset) and cached —
    * in a deployment this is read from the compacted store layout
    * ([[graft.ingest.QuadStore.snapshotEncoded]]), here derived from
    * the same quads view the oracle sees.
    */
  private def encodedOf(s: SparkSession, dir: String, key: String,
      q: => DataFrame): graft.core.EncodedQuads =
    graft.core.EncodedQuads(
      graft.core.DfCache.df(s, dir, s"${key}_encq")(
        graft.core.TermDictionary.encode(q)),
      graft.core.DfCache.df(s, dir, s"${key}_dict")(
        graft.core.TermDictionary.build(q)))

  // per-predicate statement counts — collected once per dataset and
  // fed to the compiler's join-order estimator (the statistics role of
  // `repo-config.ttl:46`); top-N-capped so driver state is bounded on
  // any predicate vocabulary (Sparql.predicateStats)
  private def stats(s: SparkSession, dir: String): Map[String, Long] =
    graft.core.DfCache.value(s, dir, "pred_stats") {
      Sparql.predicateStats(quads(s, dir))
    }

  private def sq(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => Sparql.query(s, quads(s, dir), text, stats(s, dir),
      Some(encodedOf(s, dir, "quads", quads(s, dir))))

  /** Versioned-graph view for the FROM / FROM NAMED gates: the base
    * quads plus `g:region_v2`, a NEW VERSION of the region graph — a
    * full copy of `g:region` plus one delta triple — the reference's
    * versioned-graph materialization shape
    * (`GraphDBSystemAdapter.java:318`: version N+1 repeats version N's
    * statements plus the changeset). Querying "version v2 merged with
    * v1" via FROM is exactly where the §13.2 RDF-merge dedup becomes
    * observable.
    */
  private def versionedQuads(s: SparkSession, dir: String): DataFrame =
    graft.core.DfCache.df(s, dir, "quads_versioned") {
      import org.apache.spark.sql.functions._
      val q = quads(s, dir)
      val v2 = q.filter(col("g") === "g:region").withColumn("g", lit("g:region_v2"))
      val delta = s.range(1).select(
        lit("g:region_v2").as("g"), Rdf.iri(lit("reg:99")).as("s"),
        Rdf.iri(lit(":name")).as("p"), Rdf.strLit(lit("ATLANTIS")).as("o"))
      q.unionAll(v2).unionAll(delta)
    }

  /** DuckDB mirror of [[versionedQuads]] as a CTE over `quads`. */
  private val vqCte = """
      vq AS (
        SELECT * FROM quads
        UNION ALL
        SELECT 'g:region_v2' AS g, s, p, o, okind, onum FROM quads
        WHERE g='g:region'
        UNION ALL
        SELECT 'g:region_v2', 'reg:99', ':name', 'ATLANTIS', 2, NULL::DOUBLE)"""

  private def sqv(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => Sparql.query(s, versionedQuads(s, dir), text, stats(s, dir),
      Some(encodedOf(s, dir, "quads_versioned", versionedQuads(s, dir))))

  /** query over the OWL-Horst-materialized dataset (explicit ∪ inferred) */
  private def sqInf(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => Sparql.query(s, materialized(s, dir), text, stats(s, dir),
      Some(encodedOf(s, dir, "owlhorst_mat", materialized(s, dir))))

  /** Post-DELETE maintained materialization (DRed, r15): the cached
    * materialized dataset minus three instance premises —
    * cust:1's :nation edge (kills its :locatedIn chain + :Located),
    * corp:1's second :hq value (collapses the rdfp1-derived sameAs
    * class), thing:9's :prio edge (the rdfp14a/b mutual-support
    * cycle) — maintained by [[graft.infer.OwlHorst.incrementalDelete]]
    * overdelete/rederive, NEVER re-closed from scratch. The oracle
    * recomputes the affected closures on the post-delete set.
    */
  private def materializedAfterDelete(s: SparkSession, dir: String): DataFrame =
    graft.core.DfCache.df(s, dir, "owlhorst_mat_del", persist = false) {
      import org.apache.spark.sql.functions._
      val del = quads(s, dir).filter(
        (col("s")("lex") === "cust:1" && col("p")("lex") === ":nation") ||
          (col("s")("lex") === "corp:1" && col("p")("lex") === ":hq" &&
            col("o")("lex") === "hq:b") ||
          (col("s")("lex") === "thing:9" && col("p")("lex") === ":prio"))
      graft.infer.OwlHorst.incrementalDelete(s, materialized(s, dir), del)
    }

  /** query over the DRed-maintained post-delete dataset */
  private def sqInfDel(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => Sparql.query(s, materializedAfterDelete(s, dir), text,
      stats(s, dir),
      Some(encodedOf(s, dir, "owlhorst_mat_del",
        materializedAfterDelete(s, dir))))

  val all: Seq[Q] = Seq(

    Q("r_bgp_join", sq("""
      SELECT ?c ?nname WHERE {
        ?c a :Customer . ?c :nation ?n . ?n :name ?nname }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c, nm.o AS nname
      FROM quads ty
      JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
      JOIN quads nm ON nm.p=':name' AND nm.s=nt.o
      WHERE ty.p='rdf:type' AND ty.o=':Customer'"""))),

    Q("r_bgp_filter", sq("""
      SELECT ?c ?bal WHERE {
        ?c a :Customer . ?c :acctbal ?bal . FILTER(?bal >= 9000) }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c, b.o AS bal
      FROM quads ty JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Customer' AND b.onum >= 9000"""))),

    Q("r_optional", sq("""
      SELECT ?s ?bal WHERE {
        ?s a :Supplier .
        OPTIONAL { ?s :acctbal ?bal . FILTER(?bal > 5000) } }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS s, b.o AS bal
      FROM quads ty
      LEFT JOIN quads b ON b.p=':acctbal' AND b.s=ty.s AND b.onum > 5000
      WHERE ty.p='rdf:type' AND ty.o=':Supplier'"""))),

    Q("r_union", sq("""
      SELECT ?name WHERE {
        { ?n a :Nation . ?n :name ?name } UNION { ?r a :Region . ?r :name ?name } }"""),
      Some(TpchRdf.withQuads("""
      SELECT nm.o AS name FROM quads ty JOIN quads nm ON nm.p=':name' AND nm.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Nation'
      UNION ALL
      SELECT nm.o AS name FROM quads ty JOIN quads nm ON nm.p=':name' AND nm.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Region'"""))),

    // branch-PARTIAL union vars (r8): ?r is bound only in the Region
    // branch — it dedups as a NULL id on the id plane (nullable
    // widening, Compiler.idFrameOf Union) and decodes to unbound
    Q("r_union_partial", sq("""
      SELECT DISTINCT ?name ?r WHERE {
        { ?n a :Nation . ?n :name ?name } UNION { ?r a :Region . ?r :name ?name } }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT * FROM (
        SELECT nm.o AS name, CAST(NULL AS VARCHAR) AS r
        FROM quads ty JOIN quads nm ON nm.p=':name' AND nm.s=ty.s
        WHERE ty.p='rdf:type' AND ty.o=':Nation'
        UNION ALL
        SELECT nm.o AS name, ty.s AS r
        FROM quads ty JOIN quads nm ON nm.p=':name' AND nm.s=ty.s
        WHERE ty.p='rdf:type' AND ty.o=':Region')"""))),

    // OPTIONAL over a UNION with branch-partial vars: the id plane's
    // null-compat join (r9) — branch-partial ?nm/?seg ride as NULL
    // ids through the outer join; Supplier rows (no mktsegment, but
    // :name matches) exercise the partially-matched case
    Q("r_optional_union", sq("""
      SELECT ?s ?b ?nm ?seg WHERE {
        ?s :acctbal ?b .
        OPTIONAL { { ?s :name ?nm } UNION { ?s :mktsegment ?seg } } }"""),
      Some(TpchRdf.withQuadsAnd("""
      base AS (SELECT s, o AS b FROM quads WHERE p=':acctbal'),
      u AS (
        SELECT s, o AS nm, CAST(NULL AS VARCHAR) AS seg
        FROM quads WHERE p=':name'
        UNION ALL
        SELECT s, CAST(NULL AS VARCHAR) AS nm, o AS seg
        FROM quads WHERE p=':mktsegment')""", """
      SELECT base.s AS s, base.b AS b, u.nm, u.seg
      FROM base LEFT JOIN u ON u.s = base.s"""))),

    Q("r_minus", sq("""
      SELECT ?c WHERE {
        ?c a :Customer .
        MINUS { ?c :nation ?n . ?n :region ?r . ?r :name "ASIA" . } }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c FROM quads ty
      WHERE ty.p='rdf:type' AND ty.o=':Customer' AND ty.s NOT IN (
        SELECT nt.s FROM quads nt
        JOIN quads rg ON rg.p=':region' AND rg.s=nt.o
        JOIN quads nm ON nm.p=':name' AND nm.s=rg.o AND nm.o='ASIA'
        WHERE nt.p=':nation')"""))),

    Q("r_graph_count", sq("""
      SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g"""),
      Some(TpchRdf.withQuads(s"""
      SELECT g, ${canonInt("count(*)")} AS n FROM quads GROUP BY g"""))),

    Q("r_path_2hop", sq("""
      SELECT ?c ?rn WHERE { ?c a :Customer . ?c :nation/:region/:name ?rn }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c, nm.o AS rn
      FROM quads ty
      JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
      JOIN quads rg ON rg.p=':region' AND rg.s=nt.o
      JOIN quads nm ON nm.p=':name' AND nm.s=rg.o
      WHERE ty.p='rdf:type' AND ty.o=':Customer'"""))),

    Q("r_path_closure", sq("""
      SELECT DISTINCT ?t WHERE { GRAPH g:schema { ?t rdfs:subClassOf+ :Thing } }"""),
      Some(TpchRdf.withQuadsAnd("""
      sc AS (
        SELECT s, o FROM quads WHERE g='g:schema' AND p='rdfs:subClassOf'
        UNION
        SELECT sc.s, q.o FROM sc
        JOIN quads q ON q.g='g:schema' AND q.p='rdfs:subClassOf' AND q.s=sc.o)""", """
      SELECT DISTINCT s AS t FROM sc WHERE o=':Thing'"""))),

    Q("r_agg_group", sq("""
      SELECT ?nname (SUM(?bal) AS ?sum_bal) (COUNT(*) AS ?n_cust) WHERE {
        ?c a :Customer . ?c :nation ?nt . ?nt :name ?nname . ?c :acctbal ?bal .
      } GROUP BY ?nname"""),
      Some(TpchRdf.withQuads(s"""
      SELECT nm.o AS nname, ${canon("sum(b.onum)")} AS sum_bal,
             ${canonInt("count(*)")} AS n_cust
      FROM quads ty
      JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
      JOIN quads nm ON nm.p=':name' AND nm.s=nt.o
      JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
      GROUP BY nm.o"""))),

    Q("r_agg_minmax_concat", sq("""
      SELECT ?rname (MIN(?bal) AS ?min_bal) (MAX(?bal) AS ?max_bal)
             (GROUP_CONCAT(?nname; SEPARATOR=",") AS ?nations) WHERE {
        ?c a :Customer . ?c :acctbal ?bal .
        ?c :nation ?nt . ?nt :name ?nname .
        ?nt :region ?r . ?r :name ?rname .
      } GROUP BY ?rname"""),
      // GROUP_CONCAT is order-unspecified in SPARQL; the engine sorts
      // collected values for determinism, mirrored with ORDER BY
      Some(TpchRdf.withQuads(s"""
      SELECT nmr.o AS rname,
             ${canon("min(b.onum)")} AS min_bal,
             ${canon("max(b.onum)")} AS max_bal,
             string_agg(nmn.o, ',' ORDER BY nmn.o) AS nations
      FROM quads ty
      JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
      JOIN quads nmn ON nmn.p=':name' AND nmn.s=nt.o
      JOIN quads rg ON rg.p=':region' AND rg.s=nt.o
      JOIN quads nmr ON nmr.p=':name' AND nmr.s=rg.o
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
      GROUP BY nmr.o"""))),

    // EXPRESSION aggregate arguments (§18.5.1 allows any expression):
    // the id plane decodes only the argument's vars pre-aggregate —
    // group keys and the BGP joins stay 8-byte ids (groupOverIds)
    Q("r_agg_expr", sq("""
      SELECT ?nname (SUM(?bal * 2) AS ?dbl_sum) (COUNT(STR(?bal)) AS ?n_bal) WHERE {
        ?c a :Customer . ?c :acctbal ?bal .
        ?c :nation ?nt . ?nt :name ?nname .
      } GROUP BY ?nname"""),
      Some(TpchRdf.withQuads(s"""
      SELECT nm.o AS nname,
             ${canon("sum(b.onum * 2)")} AS dbl_sum,
             ${canonInt("count(b.o)")} AS n_bal
      FROM quads ty
      JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
      JOIN quads nm ON nm.p=':name' AND nm.s=nt.o
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
      GROUP BY nm.o"""))),

    // EXPRESSION group keys (GROUP BY (expr AS ?v), §18.2.4): the id
    // plane computes the key over its decoded vars and groups on the
    // computed term; other columns stay 8-byte ids
    Q("r_group_expr_key", sq("""
      SELECT ?l (COUNT(?c) AS ?n) WHERE {
        ?c :mktsegment ?m .
      } GROUP BY (STRLEN(?m) AS ?l)"""),
      Some(TpchRdf.withQuads(s"""
      SELECT ${canonInt("len(m.o)")} AS l, ${canonInt("count(*)")} AS n
      FROM quads m WHERE m.p=':mktsegment'
      GROUP BY len(m.o)"""))),

    Q("r_ask", sq("""ASK { ?r :name "ASIA" }"""),
      Some(TpchRdf.withQuads("""
      SELECT CASE WHEN EXISTS (SELECT 1 FROM quads WHERE p=':name' AND o='ASIA')
             THEN 'true' ELSE 'false' END AS ask"""))),

    Q("r_values_bind", sq("""
      SELECT ?n ?rname ?nlen WHERE {
        VALUES ?rname { "ASIA" "EUROPE" }
        ?r :name ?rname . ?n :region ?r .
        BIND(STRLEN(?rname) AS ?nlen) }"""),
      Some(TpchRdf.withQuads(s"""
      SELECT rg.s AS n, nm.o AS rname, ${canonInt("length(nm.o)")} AS nlen
      FROM quads nm JOIN quads rg ON rg.p=':region' AND rg.o=nm.s
      WHERE nm.p=':name' AND nm.o IN ('ASIA','EUROPE')"""))),

    Q("r_not_exists", sq("""
      SELECT ?c WHERE {
        ?c a :Customer .
        FILTER NOT EXISTS { ?o :custkey ?c . ?o :orderstatus "P" } }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c FROM quads ty
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
        AND ty.s NOT IN (
          SELECT ck.o FROM quads ck
          JOIN quads st ON st.p=':orderstatus' AND st.o='P' AND st.s=ck.s
          WHERE ck.p=':custkey')"""))),

    // correlated EXISTS (§18.6): the inner FILTER reads ?bal, bound
    // only by the OUTER pattern — decorrelation substitutes it as a
    // join condition (Compiler.compCorrelatedExistsFilter)
    Q("r_exists_correlated", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { ?c :nation ?n . FILTER(?bal >= 7500) } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal' AND b.onum >= 7500
        AND b.s IN (SELECT s FROM quads WHERE p=':nation')"""))),

    // correlated EXISTS under a UNION branch (§18.6 via distribution,
    // r9): EXISTS { A UNION B } ≡ EXISTS{A} || EXISTS{B}; the
    // correlated branch decorrelates alone, the other is a plain
    // semi-join — high-balance suppliers enter through the correlated
    // branch, every customer through the uncorrelated one
    Q("r_exists_union_corr", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS {
          { ?c :nation ?n . FILTER(?bal >= 7500) } UNION { ?c a :Customer } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal FROM quads b
      WHERE b.p=':acctbal' AND (
        (b.onum >= 7500 AND b.s IN (SELECT s FROM quads WHERE p=':nation'))
        OR b.s IN (SELECT s FROM quads WHERE p='rdf:type' AND o=':Customer'))"""))),

    // correlated condition inside the MINUS RIGHT side of EXISTS
    // (§18.6 via per-key MINUS, r10): hoisting past the negation is
    // unsound, so the key-frame machinery evaluates the MINUS once per
    // distinct correlated binding (Compiler.compCorrExistsMinus) —
    // here r removes exactly l when the balance is high, so the
    // EXISTS keeps low-balance rows with a nation edge
    Q("r_exists_minus_corr", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { ?c :nation ?n
          MINUS { ?c :nation ?n . FILTER(?bal >= 7500) } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal' AND b.onum < 7500
        AND b.s IN (SELECT s FROM quads WHERE p=':nation')"""))),

    // correlated condition inside an INVISIBLE OPTIONAL within EXISTS
    // (§18.6 via simplification, r10): a left join never removes a
    // left row, and nothing reads ?nm — the OPTIONAL (and the
    // correlated filter inside it) drops, leaving the plain semi-join
    // (Compiler.dropUnreadOptionals)
    Q("r_exists_opt_drop", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { ?c :nation ?n .
          OPTIONAL { ?n :name ?nm . FILTER(?bal >= 7500) } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal'
        AND b.s IN (SELECT s FROM quads WHERE p=':nation')"""))),

    // correlated condition inside a VISIBLE OPTIONAL within EXISTS
    // (§18.6 via the key-frame left join, r11): ?nm IS read by the
    // BOUND filter above, so the invisible-OPTIONAL drop cannot
    // apply; the correlated ?bal condition decides the left join
    // per distinct outer binding (Compiler.compCorrExistsOptional)
    Q("r_exists_opt_corr", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { ?c :nation ?n .
          OPTIONAL { ?n :name ?nm . FILTER(?bal >= 7500) }
          FILTER(BOUND(?nm)) } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal' AND b.onum >= 7500
        AND b.s IN (SELECT n.s FROM quads n
                    WHERE n.p=':nation'
                      AND n.o IN (SELECT s FROM quads WHERE p=':name'))"""))),

    // correlated condition under a LIMIT subselect inside EXISTS
    // (§18.6 via simplification, r11): LIMIT n (offset 0, n >= 1)
    // preserves exactly non-emptiness, so the wrapper strips and the
    // correlated filter decorrelates normally
    // (Compiler.stripExistsTop)
    // correlated EXISTS over a WIDE UNION (8 branches): since r13,
    // splitCorrelated's branch-discriminator hoist compiles this as
    // ONE tagged probe (each branch's rows carry a discriminator id)
    // and ONE LeftSemi join against the outer keys — any branch
    // count; PlanQualitySpec pins exactly one semi join and zero
    // nested loops for this query. distributeCorrExistsUnions (the
    // EXISTS{A UNION …} ≡ EXISTS{A} || … rewrite) stays bounded at 3
    // disjuncts and no longer fires on this shape.
    Q("r_exists_union_wide", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS {
          { ?c :mktsegment "BUILDING" . FILTER(?bal > 1000) }
          UNION { ?c :mktsegment "AUTOMOBILE" . FILTER(?bal > 2000) }
          UNION { ?c :mktsegment "MACHINERY" . FILTER(?bal > 3000) }
          UNION { ?c :mktsegment "HOUSEHOLD" . FILTER(?bal > 4000) }
          UNION { ?c :mktsegment "FURNITURE" . FILTER(?bal > 5000) }
          UNION { ?c :nation ?n . FILTER(?bal > 9000) }
          UNION { ?c a :Customer . FILTER(?bal < 0) }
          UNION { ?c :name ?nm . FILTER(?bal > 9900) } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p = ':acctbal' AND (
        (b.onum > 1000 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':mktsegment' AND m.o='BUILDING'))
        OR (b.onum > 2000 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':mktsegment' AND m.o='AUTOMOBILE'))
        OR (b.onum > 3000 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':mktsegment' AND m.o='MACHINERY'))
        OR (b.onum > 4000 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':mktsegment' AND m.o='HOUSEHOLD'))
        OR (b.onum > 5000 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':mktsegment' AND m.o='FURNITURE'))
        OR (b.onum > 9000 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':nation'))
        OR (b.onum < 0 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p='rdf:type' AND m.o=':Customer'))
        OR (b.onum > 9900 AND EXISTS (SELECT 1 FROM quads m WHERE m.s=b.s
          AND m.p=':name')))"""))),

    Q("r_exists_limit_corr", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { { SELECT ?c WHERE {
          ?c :nation ?n . FILTER(?bal >= 7500) } LIMIT 3 } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal' AND b.onum >= 7500
        AND b.s IN (SELECT s FROM quads WHERE p=':nation')"""))),

    // correlated condition inside an AGGREGATION subselect within
    // EXISTS (§18.6 via the key-frame aggregation, r11): the grouped
    // pattern's spine reads ?bal from the outer row and HAVING reads
    // the per-key count — one aggregation grouped by (group keys ++
    // key columns) realizes the substitution per distinct binding
    // (Compiler.compCorrExistsAggregate)
    Q("r_exists_agg_corr", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { { SELECT ?c (COUNT(?o) AS ?n) WHERE {
            ?o :custkey ?c . FILTER(?bal >= 7500) }
          GROUP BY ?c HAVING(?n >= 3) } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal' AND b.onum >= 7500
        AND b.s IN (SELECT o FROM quads WHERE p=':custkey'
                    GROUP BY o HAVING count(*) >= 3)"""))),

    // SERVICE federation gate (r13, promotes the spec-only row to the
    // oracle set): an in-process endpoint registered inside the gate
    // holds the same dataset; the local side ships its distinct ?n
    // bindings into the endpoint sub-query as a VALUES block
    // (boundServiceJoin, FedX-style) — the oracle is the plain join
    Q("r_service_join", (s, dir) => {
      Sparql.registerService("http://graft.local/geo", quads(s, dir))
      sq("""
        SELECT ?c ?nm WHERE {
          ?c :nation ?n . ?c :acctbal ?bal . FILTER(?bal > 9000)
          SERVICE <http://graft.local/geo> { ?n :name ?nm }
        }""")(s, dir)
    }, Some(TpchRdf.withQuads("""
      SELECT b.s AS c, nm.o AS nm
      FROM quads b
      JOIN quads n ON n.s = b.s AND n.p = ':nation'
      JOIN quads nm ON nm.s = n.o AND nm.p = ':name'
      WHERE b.p = ':acctbal' AND b.onum > 9000"""))),

    // NESTED correlated EXISTS (§18.6 at depth 2, r13): the inner
    // EXISTS names ?seg from the OUTERMOST pattern (pattern-position
    // escape) and reads ?bal from the middle pattern (depth-1 at its
    // own site) — compNestedExistsFilter splices the distinct
    // (c, seg) key frame into the middle spine, so the inner level
    // decorrelates innermost-first ("is any same-segment customer
    // strictly richer than c?")
    Q("r_exists_nested_corr", sq("""
      SELECT ?c ?seg WHERE {
        ?c :nation ?n . ?c :mktsegment ?seg .
        FILTER EXISTS {
          ?c :acctbal ?bal .
          FILTER EXISTS {
            ?c2 :mktsegment ?seg . ?c2 :acctbal ?b2 .
            FILTER(?b2 > ?bal) } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT n.s AS c, seg.o AS seg
      FROM quads n
      JOIN quads seg ON seg.s = n.s AND seg.p = ':mktsegment'
      JOIN quads bal ON bal.s = n.s AND bal.p = ':acctbal'
      WHERE n.p = ':nation'
        AND EXISTS (SELECT 1 FROM quads s2
                    JOIN quads b2 ON b2.s = s2.s AND b2.p = ':acctbal'
                    WHERE s2.p = ':mktsegment' AND s2.o = seg.o
                      AND b2.onum > bal.onum)"""))),

    // EMPTY-GROUP HAVING inside correlated EXISTS (r13, the last
    // aggregation loud class): an implicit group aggregates the EMPTY
    // multiset per §18.5.1 (COUNT=0 here), so a customer whose
    // candidates all fail the substituted ?bal condition — or who has
    // no orders at all — still materializes a group for HAVING(?n=0)
    Q("r_exists_empty_group", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal . ?c a :Customer .
        FILTER EXISTS { { SELECT (COUNT(?o) AS ?n) WHERE {
            ?o :custkey ?c . FILTER(?bal >= 7500) }
          HAVING(?n = 0) } } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      JOIN quads ty ON ty.s = b.s AND ty.p = 'rdf:type'
                    AND ty.o = ':Customer'
      WHERE b.p = ':acctbal'
        AND (b.onum < 7500
             OR b.s NOT IN (SELECT o FROM quads WHERE p = ':custkey'))"""))),

    // correlated BIND inside EXISTS (§18.6): the inner BIND reads
    // ?bal from the OUTER pattern and a spine FILTER consumes the
    // bound var — decorrelation inlines the definition into the
    // hoisted condition (Compiler.splitCorrelated peels Extend)
    Q("r_exists_bind_corr", sq("""
      SELECT ?c ?bal WHERE {
        ?c :acctbal ?bal .
        FILTER EXISTS { ?c :nation ?n .
          BIND(?bal * 2 AS ?x) FILTER(?x >= 15000) } }"""),
      Some(TpchRdf.withQuads("""
      SELECT b.s AS c, b.o AS bal
      FROM quads b
      WHERE b.p=':acctbal' AND b.onum * 2 >= 15000
        AND b.s IN (SELECT s FROM quads WHERE p=':nation')"""))),

    Q("r_path_negset", sq("""
      SELECT ?s ?o WHERE { GRAPH g:nation { ?s !(:name|a) ?o } }"""),
      Some(TpchRdf.withQuads("""
      SELECT s, o FROM quads
      WHERE g='g:nation' AND p NOT IN (':name', 'rdf:type')"""))),

    // negated set with an inverse member (§9.1 PathOneInPropertySet):
    // !(F|^R) = forward edges with p∉F ∪ reverse edges with p∉R
    Q("r_path_neginv", sq("""
      SELECT DISTINCT ?r ?x WHERE { ?r a :Region . ?r !(:name|^:region) ?x }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT ty.s AS r, e.x AS x
      FROM quads ty
      JOIN (
        SELECT s AS r, o AS x FROM quads WHERE p <> ':name'
        UNION ALL
        SELECT o AS r, s AS x FROM quads WHERE p <> ':region'
      ) e ON e.r = ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Region'"""))),

    // blank-node property lists in the pattern (§4.1.4: query bnodes
    // are non-distinguished variables — nested joins, never projected)
    Q("r_bnode_plist", sq("""
      SELECT ?o ?nn WHERE {
        ?o a :Order ; :custkey [ :nation [ :name ?nn ] ] .
      }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS o, nm.o AS nn
      FROM quads ty
      JOIN quads ck ON ck.p=':custkey' AND ck.s=ty.s
      JOIN quads nt ON nt.p=':nation' AND nt.s=ck.o
      JOIN quads nm ON nm.p=':name' AND nm.s=nt.o
      WHERE ty.p='rdf:type' AND ty.o=':Order'"""))),

    Q("r_path_inverse", sq("""
      SELECT ?r ?n WHERE { ?r ^:region ?n . ?r a :Region }"""),
      Some(TpchRdf.withQuads("""
      SELECT rg.o AS r, rg.s AS n FROM quads rg
      JOIN quads ty ON ty.p='rdf:type' AND ty.o=':Region' AND ty.s=rg.o
      WHERE rg.p=':region'"""))),

    Q("r_construct", sq("""
      CONSTRUCT { ?c :inRegion ?r . ?r :hasMember ?c . }
      WHERE { ?c a :Customer . ?c :nation/:region ?r . }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT * FROM (
        SELECT ty.s AS s, ':inRegion' AS p, rg.o AS o
        FROM quads ty
        JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
        JOIN quads rg ON rg.p=':region' AND rg.s=nt.o
        WHERE ty.p='rdf:type' AND ty.o=':Customer'
        UNION ALL
        SELECT rg.o, ':hasMember', ty.s
        FROM quads ty
        JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
        JOIN quads rg ON rg.p=':region' AND rg.s=nt.o
        WHERE ty.p='rdf:type' AND ty.o=':Customer')"""))),

    Q("r_describe", sq("""DESCRIBE ?r WHERE { ?r a :Region }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT q.s, q.p, q.o FROM quads q
      JOIN (SELECT s FROM quads WHERE p='rdf:type' AND o=':Region') t
        ON q.s = t.s OR q.o = t.s"""))),

    // ---- inference (OWL-Horst materialization, SURVEY §2.C) ----

    Q("r_infer_types", sqInf("""
      SELECT ?t (COUNT(*) AS ?n) WHERE { ?x a ?t } GROUP BY ?t"""),
      Some(TpchRdf.withQuadsAnd("""
      scl AS (
        SELECT s, o FROM quads WHERE p='rdfs:subClassOf'
        UNION
        SELECT scl.s, q.o FROM scl
        JOIN quads q ON q.p='rdfs:subClassOf' AND q.s=scl.o),
      alias AS (
        SELECT s AS a, o AS b FROM quads WHERE p='owl:sameAs'
        UNION SELECT o, s FROM quads WHERE p='owl:sameAs'),
      african AS (SELECT DISTINCT x FROM (
        SELECT s AS x FROM quads WHERE p='rdf:type' AND o=':AfricanThing'
        UNION ALL
        SELECT rg.s FROM quads rg WHERE rg.p=':region' AND rg.o='reg:0'
        UNION ALL
        SELECT nt.s FROM quads nt
        JOIN quads rg ON rg.p=':region' AND rg.s=nt.o AND rg.o='reg:0'
        WHERE nt.p=':nation')),
      base AS (SELECT DISTINCT * FROM (
        SELECT s, o AS t FROM quads WHERE p='rdf:type'
        UNION ALL SELECT s, ':Order' FROM quads WHERE p=':custkey'
        UNION ALL SELECT o, ':Customer' FROM quads WHERE p=':custkey'
        -- rdfp14a: asserted :prio "5"^^xsd:integer edges type their
        -- subject :PriorityFive (typed-literal hasValue fixture)
        UNION ALL SELECT s, ':PriorityFive' FROM quads WHERE p=':prio' AND o='5'
        -- rdfp14a: hasValue members of :AfricanThing
        UNION ALL SELECT x, ':AfricanThing' FROM african
        -- rdfp15: someValuesFrom members of :Located (everything with a
        -- :locatedIn edge to a :Place, incl. special:1 via rdfp14b)
        UNION ALL SELECT s, ':Located' FROM quads WHERE p=':nation'
        UNION ALL SELECT s, ':Located' FROM quads WHERE p=':region'
        UNION ALL SELECT x, ':Located' FROM african
        -- rdfp16: allValuesFrom over :region (GeoSourced via rdfs9)
        UNION ALL SELECT o, ':MappedRegion' FROM quads WHERE p=':region')),
      expanded AS (SELECT DISTINCT * FROM (
        SELECT * FROM base
        UNION ALL SELECT al.b, base.t FROM base JOIN alias al ON al.a=base.s)),
      alltypes AS (SELECT DISTINCT * FROM (
        SELECT * FROM expanded
        UNION ALL SELECT e.s, scl.o FROM expanded e JOIN scl ON scl.s=e.t))""", s"""
      SELECT t, ${canonInt("count(*)")} AS n FROM alltypes GROUP BY t"""))),

    Q("r_infer_transitive", sqInf("""
      SELECT ?x WHERE { ?x :locatedIn reg:1 . ?x a :Customer }"""),
      Some(TpchRdf.withQuads("""
      SELECT nt.s AS x FROM quads nt
      JOIN quads rg ON rg.p=':region' AND rg.s=nt.o AND rg.o='reg:1'
      JOIN quads ty ON ty.p='rdf:type' AND ty.o=':Customer' AND ty.s=nt.s
      WHERE nt.p=':nation'"""))),

    Q("r_infer_sameas", sqInf("""
      SELECT ?n WHERE { ?n :region regalias:2 . ?n a :Nation }"""),
      Some(TpchRdf.withQuads("""
      SELECT rg.s AS n FROM quads rg
      JOIN quads ty ON ty.p='rdf:type' AND ty.o=':Nation' AND ty.s=rg.s
      WHERE rg.p=':region' AND rg.o='reg:2'"""))),

    // ---- pD* long-tail (rdfp1/2/14/15/16, round 4) ----
    // rdfp1: corp:1 carries two :hq values (functional) → hq:a/hq:b
    // become one sameAs class; the 2×2 pairs include the reflexive rows
    // the expansion derives
    Q("r_infer_funcprop", sqInf("""
      SELECT ?x ?y WHERE { corp:1 :hq ?x . ?x owl:sameAs ?y }"""),
      Some(TpchRdf.withQuads("""
      SELECT h1.o AS x, h2.o AS y
      FROM quads h1 JOIN quads h2 ON h2.p=':hq' AND h2.s=h1.s
      WHERE h1.p=':hq' AND h1.s='corp:1'"""))),

    // rdfp2: dup:a/dup:b share an inverse-functional :code value
    Q("r_infer_invfunc", sqInf("""
      SELECT ?x ?y WHERE { ?x :code ?c . ?x owl:sameAs ?y }"""),
      Some(TpchRdf.withQuads("""
      SELECT c1.s AS x, c2.s AS y
      FROM quads c1 JOIN quads c2 ON c2.p=':code' AND c2.o=c1.o
      WHERE c1.p=':code'"""))),

    // rdfp14a: everything :locatedIn reg:0 (through subPropertyOf +
    // transitivity) is typed :AfricanThing, plus the asserted special:1
    Q("r_infer_hasvalue", sqInf("""
      SELECT DISTINCT ?x WHERE { ?x a :AfricanThing }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT x FROM (
        SELECT s AS x FROM quads WHERE p='rdf:type' AND o=':AfricanThing'
        UNION ALL
        SELECT rg.s FROM quads rg WHERE rg.p=':region' AND rg.o='reg:0'
        UNION ALL
        SELECT nt.s FROM quads nt
        JOIN quads rg ON rg.p=':region' AND rg.s=nt.o AND rg.o='reg:0'
        WHERE nt.p=':nation')"""))),

    // rdfp14b: the asserted member special:1 gains the restriction's
    // value edge — plus its sameAs-expanded alias object
    Q("r_infer_hasvalue_prop", sqInf("""
      SELECT DISTINCT ?w WHERE { special:1 :locatedIn ?w }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT w FROM (
        SELECT hv.o AS w FROM quads hv
        WHERE hv.s=':AfricanThing' AND hv.p='owl:hasValue'
        UNION ALL
        SELECT sa.s FROM quads sa
        JOIN quads hv ON hv.s=':AfricanThing' AND hv.p='owl:hasValue'
          AND sa.o=hv.o
        WHERE sa.p='owl:sameAs')"""))),

    // rdfp14a/b typed-value fidelity: thing:9 (asserted :prio
    // "5"^^xsd:integer edge) gains rdf:type :PriorityFive via rdfp14a;
    // special:2 (asserted type) gains the value edge via rdfp14b whose
    // term must keep its xsd:integer datatype — the DATATYPE filter
    // makes a string-degraded derivation observable as a missing row
    Q("r_infer_hasvalue_typed", sqInf("""
      SELECT ?x ?v WHERE {
        ?x a :PriorityFive . ?x :prio ?v
        FILTER(DATATYPE(?v) = xsd:integer) }"""),
      Some(TpchRdf.withQuads("""
      SELECT m.x AS x, hv.o AS v
      FROM (SELECT s AS x FROM quads WHERE p='rdf:type' AND o=':PriorityFive'
            UNION SELECT s FROM quads WHERE p=':prio') m,
           (SELECT o FROM quads WHERE s=':PriorityFive'
            AND p='owl:hasValue') hv"""))),

    // rdfp15: members of the someValuesFrom(:locatedIn, :Place)
    // restriction — every customer/supplier/nation, and special:1
    // through its rdfp14b-derived edge
    Q("r_infer_somevalues", sqInf("""
      SELECT DISTINCT ?x WHERE { ?x a :Located }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT x FROM (
        SELECT s AS x FROM quads WHERE p=':nation'
        UNION ALL SELECT s FROM quads WHERE p=':region'
        UNION ALL SELECT s FROM quads WHERE p='rdf:type' AND o=':AfricanThing')"""))),

    // rdfp16: :Nation ⊑ :GeoSourced (allValuesFrom(:region,
    // :MappedRegion)) types every region object — and its aliases, via
    // the sameAs expansion in both directions
    Q("r_infer_allvalues", sqInf("""
      SELECT DISTINCT ?x WHERE { ?x a :MappedRegion }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT x FROM (
        SELECT o AS x FROM quads WHERE p=':region'
        UNION ALL
        SELECT sa.s FROM quads sa
        JOIN quads rg ON rg.p=':region' AND sa.o=rg.o
        WHERE sa.p='owl:sameAs'
        UNION ALL
        SELECT sa.o FROM quads sa
        JOIN quads rg ON rg.p=':region' AND sa.s=rg.o
        WHERE sa.p='owl:sameAs')"""))),

    // DRed delete-incremental inference (r15): three instance
    // premises are DELETED and the materialization is maintained by
    // overdelete/rederive (never re-closed); the probe reads every
    // statement of six subjects chosen to cross each affected rule
    // family — cust:1 keeps its subclass typings but loses the
    // :locatedIn chain; the hq sameAs class dies with its rdfp1
    // premise; thing:9's rdfp14a/b mutual-support cycle dies entirely
    // while special:2 (explicitly typed) keeps its derived value
    // edge. The oracle recomputes the affected closures (subclass,
    // locatedIn, sameAs, hasValue) on the post-delete set with
    // recursive CTEs.
    Q("r_infer_delete", sqInfDel("""
      SELECT DISTINCT ?s ?p ?o WHERE {
        VALUES ?s { cust:1 corp:1 hq:a hq:b thing:9 special:2 }
        ?s ?p ?o }"""),
      Some(TpchRdf.withQuadsAnd("""
      pd AS MATERIALIZED (
        SELECT * FROM quads
        WHERE NOT (s='cust:1' AND p=':nation')
          AND NOT (s='corp:1' AND p=':hq' AND o='hq:b')
          AND NOT (s='thing:9' AND p=':prio')),
      tgt AS (SELECT unnest(['cust:1','corp:1','hq:a','hq:b','thing:9',
                             'special:2']) AS t),
      scl AS (
        SELECT s, o FROM pd WHERE p='rdfs:subClassOf'
        UNION
        SELECT scl.s, q.o FROM scl
        JOIN pd q ON q.p='rdfs:subClassOf' AND q.s=scl.o),
      sa0 AS (
        SELECT s AS a, o AS b FROM pd WHERE p='owl:sameAs'
        UNION SELECT h1.o, h2.o FROM pd h1 JOIN pd h2
          ON h1.p=':hq' AND h2.p=':hq' AND h1.s=h2.s AND h1.o<>h2.o
        UNION SELECT c1.s, c2.s FROM pd c1 JOIN pd c2
          ON c1.p=':code' AND c2.p=':code' AND c1.o=c2.o AND c1.s<>c2.s),
      sae AS (SELECT a, b FROM sa0 UNION SELECT b, a FROM sa0),
      sacl AS (
        SELECT a, b FROM sae
        UNION SELECT sacl.a, sae.b FROM sacl JOIN sae ON sae.a = sacl.b),
      loce AS (SELECT s, o FROM pd
               WHERE p IN (':nation', ':region', ':locatedIn')),
      loc AS (
        SELECT s, o FROM loce
        UNION SELECT loc.s, e.o FROM loc JOIN loce e ON e.s = loc.o),
      bt AS (
        SELECT s, o AS ty FROM pd WHERE p='rdf:type'
        UNION ALL SELECT s, ':Order' FROM pd WHERE p=':custkey'
        UNION ALL SELECT o, ':Customer' FROM pd WHERE p=':custkey'
        UNION ALL SELECT s, ':PriorityFive' FROM pd WHERE p=':prio' AND o='5'
        UNION ALL SELECT s, ':AfricanThing' FROM loc WHERE o='reg:0'
        UNION ALL SELECT s, ':Located' FROM loc
        UNION ALL SELECT o, ':MappedRegion' FROM pd WHERE p=':region'),
      alltypes AS (SELECT DISTINCT s, ty FROM (
        SELECT s, ty FROM bt
        UNION ALL SELECT bt.s, scl.o FROM bt JOIN scl ON scl.s = bt.ty))""", """
      SELECT DISTINCT s, p, o FROM (
        SELECT s, p, o FROM pd WHERE s IN (SELECT t FROM tgt)
        UNION ALL SELECT s, 'rdf:type', ty FROM alltypes
          WHERE s IN (SELECT t FROM tgt)
        UNION ALL SELECT s, ':prio', '5' FROM alltypes
          WHERE ty=':PriorityFive' AND s IN (SELECT t FROM tgt)
        UNION ALL SELECT s, ':locatedIn', o FROM loc
          WHERE s IN (SELECT t FROM tgt)
        UNION ALL SELECT a, 'owl:sameAs', b FROM sacl
          WHERE a IN (SELECT t FROM tgt)
        UNION ALL SELECT cl.b, r.p, r.o FROM pd r
          JOIN sacl cl ON cl.a = r.s WHERE cl.b IN (SELECT t FROM tgt)
        UNION ALL SELECT r.s, r.p, cl.b FROM pd r
          JOIN sacl cl ON cl.a = r.o
          WHERE r.s IN (SELECT t FROM tgt))"""))),

    // Temporal casts (§17.5): xsd:date → xsd:dateTime promotes to
    // midnight, xsd:dateTime → xsd:date truncates back; casting a
    // status string ("O"/"F"/"P") is a type error → ?bad unbound on
    // every row, which the !BOUND filter asserts. The dateTime
    // comparison exercises the same-datatype lexical ordering plane.
    Q("r_cast_datetime", sq("""
      SELECT ?o ?dt ?d2 WHERE {
        GRAPH g:orders { ?o :orderdate ?d . ?o :orderstatus ?st }
        BIND(xsd:dateTime(?d) AS ?dt)
        BIND(xsd:date(?dt) AS ?d2)
        BIND(xsd:dateTime(?st) AS ?bad)
        FILTER(!BOUND(?bad))
        FILTER(?dt >= "1998-07-01T00:00:00"^^xsd:dateTime)
      }"""),
      Some(TpchRdf.withQuads("""
      SELECT od.s AS o,
             strftime(CAST(od.o AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS dt,
             od.o AS d2
      FROM quads od
      WHERE od.g='g:orders' AND od.p=':orderdate'
        AND CAST(od.o AS DATE) >= DATE '1998-07-01'"""))),
    // oracle filter uses a DATE (not TIMESTAMP) cast: DuckDB rewrites
    // CAST(varchar AS TIMESTAMP) >= TIMESTAMP 'x' into a raw string
    // compare, and '1998-07-01' < '1998-07-01 00:00:00' lexically — the
    // boundary rows vanish. Date lexicals are fixed-width, so the same
    // rewrite is harmless for DATE (the projection keeps the real
    // timestamp cast).

    // ORDER BY + OFFSET/LIMIT: row CONTENT depends on correct term
    // ordering (the driver's compare re-sorts rows, so order alone
    // would not be observable — the offset window makes it so).
    // Unique secondary key ?c keeps the window deterministic.
    Q("r_order_offset", sq("""
      SELECT ?c ?bal WHERE { ?c a :Customer . ?c :acctbal ?bal }
      ORDER BY DESC(?bal) ?c OFFSET 5 LIMIT 10"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c, b.o AS bal
      FROM quads ty JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
      ORDER BY b.onum DESC, ty.s ASC LIMIT 10 OFFSET 5"""))),

    // top-k with EXPRESSION sort keys: the id-plane cut decodes only
    // the vars the sort expressions read before TakeOrdered
    Q("r_topk_expr", sq("""
      SELECT ?c ?bal WHERE { ?c a :Customer . ?c :acctbal ?bal }
      ORDER BY DESC(?bal * 2) (STRLEN(?c)) ?c LIMIT 10"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c, b.o AS bal
      FROM quads ty JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
      ORDER BY b.onum * 2 DESC, len(ty.s) ASC, ty.s ASC LIMIT 10"""))),

    // path alternation + zero-or-one in one gate:
    // x ∈ {nation, region(nation), name(nation)}
    Q("r_path_alt_opt", sq("""
      SELECT ?c ?x WHERE { ?c a :Customer . ?c :nation/(:region|:name)? ?x }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT ty.s AS c, x FROM (
        SELECT nt.s AS s, nt.o AS x FROM quads nt WHERE nt.p=':nation'
        UNION
        SELECT nt.s, rg.o FROM quads nt
        JOIN quads rg ON rg.p=':region' AND rg.s=nt.o WHERE nt.p=':nation'
        UNION
        SELECT nt.s, nm.o FROM quads nt
        JOIN quads nm ON nm.p=':name' AND nm.s=nt.o WHERE nt.p=':nation') px
      JOIN quads ty ON ty.s=px.s
      WHERE ty.p='rdf:type' AND ty.o=':Customer'"""))),

    // SAMPLE over a functionally-determined value (one :name per
    // region), so "any value" is deterministic on both engines
    Q("r_sample", sq("""
      SELECT ?r (SAMPLE(?rname) AS ?sname) WHERE {
        ?n :region ?r . ?r :name ?rname } GROUP BY ?r"""),
      Some(TpchRdf.withQuads("""
      SELECT rg.o AS r, min(nm.o) AS sname
      FROM quads rg JOIN quads nm ON nm.p=':name' AND nm.s=rg.o
      WHERE rg.p=':region' GROUP BY rg.o"""))),

    Q("r_having", sq("""
      SELECT ?nname (COUNT(*) AS ?ncust) WHERE {
        ?c a :Customer . ?c :nation ?nt . ?nt :name ?nname
      } GROUP BY ?nname HAVING (COUNT(*) >= 5)"""),
      Some(TpchRdf.withQuads(s"""
      SELECT nm.o AS nname, ${canonInt("count(*)")} AS ncust
      FROM quads ty
      JOIN quads nt ON nt.p=':nation' AND nt.s=ty.s
      JOIN quads nm ON nm.p=':name' AND nm.s=nt.o
      WHERE ty.p='rdf:type' AND ty.o=':Customer'
      GROUP BY nm.o HAVING count(*) >= 5"""))),

    // closure inside GRAPH ?var: each named graph closes independently
    // and the graph binding is projected
    Q("r_path_graphvar", sq("""
      SELECT DISTINCT ?g ?t WHERE { GRAPH ?g { ?t rdfs:subClassOf+ :Thing } }"""),
      Some(TpchRdf.withQuadsAnd("""
      sc AS (
        SELECT g, s, o FROM quads WHERE p='rdfs:subClassOf'
        UNION
        SELECT sc.g, sc.s, q.o FROM sc
        JOIN quads q ON q.p='rdfs:subClassOf' AND q.s=sc.o AND q.g=sc.g)""", """
      SELECT DISTINCT g, s AS t FROM sc WHERE o=':Thing'"""))),

    Q("r_subquery_max", sq("""
      SELECT ?c ?bal WHERE {
        { SELECT (MAX(?b) AS ?bal) WHERE { ?x a :Customer . ?x :acctbal ?b } }
        ?c :acctbal ?bal . ?c a :Customer . }"""),
      Some(TpchRdf.withQuads("""
      SELECT ty.s AS c, b.o AS bal
      FROM quads ty JOIN quads b ON b.p=':acctbal' AND b.s=ty.s
      WHERE ty.p='rdf:type' AND ty.o=':Customer' AND b.onum = (
        SELECT max(b2.onum) FROM quads ty2
        JOIN quads b2 ON b2.p=':acctbal' AND b2.s=ty2.s
        WHERE ty2.p='rdf:type' AND ty2.o=':Customer')"""))),

    // REDUCED permits (and this engine performs) duplicate elimination
    // (SPARQL §15.3.2) — compiled identically to DISTINCT
    Q("r_reduced", sq("""
      SELECT REDUCED ?rname WHERE { ?nt :region ?r . ?r :name ?rname }"""),
      Some(TpchRdf.withQuads("""
      SELECT DISTINCT nm.o AS rname
      FROM quads rg JOIN quads nm ON nm.p=':name' AND nm.s=rg.o
      WHERE rg.p=':region'"""))),

    // ---- dataset clauses (§13.2) over the versioned-graph view ----

    // FROM v1 FROM v2: default graph = RDF MERGE of the two region
    // versions — the five v1 triple-pairs repeated in v2 appear ONCE
    // (n=2 per region, not 4), plus the v2-only delta (n=1). A
    // union-all (non-merge) implementation is observably wrong.
    Q("r_from_graph", sqv("""
      SELECT ?s (COUNT(*) AS ?n) FROM g:region FROM g:region_v2
      WHERE { ?s ?p ?o } GROUP BY ?s"""),
      Some(TpchRdf.withQuadsAnd(vqCte, s"""
      SELECT s, ${canonInt("count(*)")} AS n
      FROM (SELECT DISTINCT s, p, o FROM vq
            WHERE g IN ('g:region','g:region_v2')) m
      GROUP BY s"""))),

    // FROM NAMED restricts the graphs GRAPH ?g ranges over: only the
    // two listed graphs answer — customer/supplier/region names (and
    // every other graph) are excluded even though they carry :name.
    Q("r_from_named", sqv("""
      SELECT ?g (COUNT(*) AS ?n) FROM NAMED g:nation FROM NAMED g:region_v2
      WHERE { GRAPH ?g { ?s :name ?nm } } GROUP BY ?g"""),
      Some(TpchRdf.withQuadsAnd(vqCte, s"""
      SELECT g, ${canonInt("count(*)")} AS n FROM vq
      WHERE g IN ('g:nation','g:region_v2') AND p=':name'
      GROUP BY g""")))
  )
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.infer.OwlHorst
import graft.rdf.TpchRdf
import graft.sparql.Sparql

/** OWL-Horst materializer semantics at sf0.001 (SURVEY §2.C). */
class OwlHorstSpec extends GraftSuite {

  lazy val mat: DataFrame =
    OwlHorst.materialize(spark, TpchRdf.graphDf(spark, sf)).cache()

  def q(text: String): Array[org.apache.spark.sql.Row] =
    Sparql.query(spark, mat, text).collect()

  test("subclass propagation: customers and suppliers are Agents and Things") {
    val nCust = q("SELECT ?x WHERE { ?x a :Customer }").length
    val nSup = q("SELECT ?x WHERE { ?x a :Supplier }").length
    val nAgent = q("SELECT ?x WHERE { ?x a :Agent }").length
    assert(nAgent == nCust + nSup)
  }

  test("domain/range typing: orders typed via :custkey") {
    val nOrd = q("SELECT ?x WHERE { ?x a :Order }").length
    assert(nOrd > 0)
  }

  test("transitive property: customer located in region via nation") {
    val rows = q("SELECT ?x WHERE { ?x :locatedIn reg:1 . ?x a :Customer }")
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).startsWith("cust:")))
  }

  test("sameAs: alias object answers match canonical") {
    val viaAlias = q("SELECT ?n WHERE { ?n :region regalias:2 . ?n a :Nation }")
      .map(_.getString(0)).toSet
    val viaCanon = q("SELECT ?n WHERE { ?n :region reg:2 . ?n a :Nation }")
      .map(_.getString(0)).toSet
    assert(viaAlias == viaCanon && viaAlias.nonEmpty)
  }

  test("distributed sameAs (GraphX CC) matches the driver union-find path") {
    val quads = TpchRdf.graphDf(spark, sf)
    def key(df: DataFrame) = df.select(col("g"), col("s")("lex"),
      col("p")("lex"), col("o")("lex")).distinct()
    sys.props("graft.sameas.broadcast.limit") = "0" // force distributed
    try {
      val dist = OwlHorst.materialize(spark, quads)
      assert(key(dist).except(key(mat)).isEmpty)
      assert(key(mat).except(key(dist)).isEmpty)
    } finally sys.props.remove("graft.sameas.broadcast.limit")
  }

  test("distributed sameAs scales to many classes with no driver pair set") {
    import spark.implicits._
    import graft.rdf.Rdf
    // 500 classes x 3 members (x~y, y~z; diameter 2) + one typed
    // statement per canonical member — class count, not class size,
    // is what the driver path cannot hold at entity-resolution scale
    val n = 500
    val triples =
      (0 until n).flatMap(i => Seq(
        (s"e:$i-x", "owl:sameAs", s"e:$i-y"),
        (s"e:$i-y", "owl:sameAs", s"e:$i-z"),
        (s"e:$i-x", Rdf.RdfType, ":Entity")))
    val quads = triples.toDF("sl", "pl", "ol").select(
      lit("g:x").as("g"), Rdf.iri(col("sl")).as("s"),
      Rdf.iri(col("pl")).as("p"), Rdf.iri(col("ol")).as("o"))
    sys.props("graft.sameas.broadcast.limit") = "0" // force distributed
    try {
      val m = OwlHorst.materialize(spark, quads).cache()
      // type expands to all 3 members of each class
      assert(m.filter(col("p")("lex") === Rdf.RdfType).count() == 3L * n)
      // 6 ordered cross pairs + 3 reflexive eq-ref statements per
      // class (expansion of (a sameAs b) by b→a yields a sameAs a)
      assert(m.filter(col("p")("lex") === "owl:sameAs").count() == 9L * n)
    } finally sys.props.remove("graft.sameas.broadcast.limit")
  }

  test("incremental maintenance equals full materialization") {
    val quads = TpchRdf.graphDf(spark, sf)
    val base = quads.filter(col("g") =!= "g:customer")
    val delta = quads.filter(col("g") === "g:customer")
    val inc = OwlHorst.incremental(spark, OwlHorst.materialize(spark, base), delta)
    def key(df: DataFrame) = df.select(col("g"), col("s")("lex"), col("p")("lex"),
      col("o")("lex")).distinct()
    assert(key(inc).except(key(mat)).isEmpty && key(mat).except(key(inc)).isEmpty)
  }

  test("transitive closure crosses blank-node objects") {
    import spark.implicits._
    import graft.rdf.Rdf
    // _:b1 partOf _:b2 partOf ex:c with partOf transitive — bnode
    // intermediates must participate (only LITERAL objects are excluded)
    val rows = Seq(
      ("ex:partOf", Rdf.RdfType, "owl:TransitiveProperty", Rdf.IRI),
      ("b1", "ex:partOf", "b2", Rdf.BNODE),
      ("b2", "ex:partOf", "ex:c", Rdf.IRI))
    val quads = rows.toDF("sl", "pl", "ol", "ok").select(
      lit("g:x").as("g"),
      Rdf.term(col("sl"), when(col("sl").startsWith("b"), Rdf.BNODE)
        .otherwise(Rdf.IRI), lit(""), lit(""), lit(null).cast("double")).as("s"),
      Rdf.iri(col("pl")).as("p"),
      Rdf.term(col("ol"), col("ok"), lit(""), lit(""),
        lit(null).cast("double")).as("o"))
    val m = OwlHorst.materialize(spark, quads)
    assert(m.filter(col("s")("lex") === "b1" && col("p")("lex") === "ex:partOf" &&
      col("o")("lex") === "ex:c").count() == 1)
  }

  test("incremental: delta referencing a base-resident sameAs alias expands") {
    import spark.implicits._
    import graft.rdf.Rdf
    // base holds the sameAs class; the axiom-free delta only MENTIONS
    // the aliased term — expansion must still fire (round-1 harvest
    // reads the whole base, not just the delta)
    val base = Seq(("e:a", "owl:sameAs", "e:b"))
      .toDF("sl", "pl", "ol").select(lit("g:x").as("g"),
        Rdf.iri(col("sl")).as("s"), Rdf.iri(col("pl")).as("p"),
        Rdf.iri(col("ol")).as("o"))
    val matBase = OwlHorst.materialize(spark, base)
    val delta = Seq(("e:x", ":p", "e:a"))
      .toDF("sl", "pl", "ol").select(lit("g:x").as("g"),
        Rdf.iri(col("sl")).as("s"), Rdf.iri(col("pl")).as("p"),
        Rdf.iri(col("ol")).as("o"))
    val inc = OwlHorst.incremental(spark, matBase, delta)
    assert(inc.filter(col("s")("lex") === "e:x" && col("p")("lex") === ":p" &&
      col("o")("lex") === "e:b").count() == 1)
  }

  test("delta carrying ontology axioms falls back to full re-materialization") {
    import spark.implicits._
    val quads = TpchRdf.graphDf(spark, sf)
    val base = quads.filter(col("g") =!= "g:schema")
    val delta = quads.filter(col("g") === "g:schema")
    // schema arrives last: the semi-naive shortcut would miss base
    // premises, so incremental() must still produce the full closure
    val inc = OwlHorst.incremental(spark, OwlHorst.materialize(spark, base), delta)
    def key(df: DataFrame) = df.select(col("g"), col("s")("lex"), col("p")("lex"),
      col("o")("lex")).distinct()
    assert(key(inc).except(key(mat)).isEmpty && key(mat).except(key(inc)).isEmpty)
  }

  test("fixpoint terminates on cyclic class hierarchies") {
    import spark.implicits._
    import graft.rdf.Rdf
    // A ⊑ B ⊑ C ⊑ A (cycle) + one instance: materialization must
    // terminate and type the instance with all three classes
    val tris = Seq(
      (":A", "rdfs:subClassOf", ":B"),
      (":B", "rdfs:subClassOf", ":C"),
      (":C", "rdfs:subClassOf", ":A"),
      ("i:1", "rdf:type", ":A"))
    val quads = tris.toDF("sl", "pl", "ol").select(
      org.apache.spark.sql.functions.lit("g:t").as("g"),
      Rdf.iri(col("sl")).as("s"), Rdf.iri(col("pl")).as("p"),
      Rdf.iri(col("ol")).as("o"))
    val m = OwlHorst.materialize(spark, quads)
    val types = Sparql.query(spark, m, "SELECT ?t WHERE { i:1 a ?t }")
      .collect().map(_.getString(0)).toSet
    assert(types == Set(":A", ":B", ":C"))
  }

  // ---- pD* long-tail per-rule fixtures (round 4) ----

  private def iriQuads(tris: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    import graft.rdf.Rdf
    tris.toDF("sl", "pl", "ol").select(lit("g:t").as("g"),
      Rdf.iri(col("sl")).as("s"), Rdf.iri(col("pl")).as("p"),
      Rdf.iri(col("ol")).as("o"))
  }

  private def spo(m: DataFrame): Set[(String, String, String)] =
    m.select(col("s")("lex"), col("p")("lex"), col("o")("lex")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("rdfp1: functional property derives sameAs between its values") {
    val m = spo(OwlHorst.materialize(spark, iriQuads(Seq(
      ("ex:hq", "rdf:type", "owl:FunctionalProperty"),
      ("ex:c", "ex:hq", "ex:a"),
      ("ex:c", "ex:hq", "ex:b")))))
    assert(m(("ex:a", "owl:sameAs", "ex:b")) && m(("ex:b", "owl:sameAs", "ex:a")))
  }

  test("rdfp2: inverse-functional property derives sameAs between subjects") {
    val m = spo(OwlHorst.materialize(spark, iriQuads(Seq(
      ("ex:k", "rdf:type", "owl:InverseFunctionalProperty"),
      ("ex:a", "ex:k", "ex:w"),
      ("ex:b", "ex:k", "ex:w"),
      // a statement only ex:a carries: the derived class must copy it
      ("ex:a", "ex:q", "ex:z")))))
    assert(m(("ex:a", "owl:sameAs", "ex:b")))
    assert(m(("ex:b", "ex:q", "ex:z")), "derived sameAs must feed expansion")
  }

  test("rdfp14: hasValue types members (a) and derives value edges (b)") {
    val m = spo(OwlHorst.materialize(spark, iriQuads(Seq(
      ("ex:R", "owl:onProperty", "ex:p"),
      ("ex:R", "owl:hasValue", "ex:v"),
      ("ex:u", "ex:p", "ex:v"),
      ("ex:t", "rdf:type", "ex:R")))))
    assert(m(("ex:u", "rdf:type", "ex:R")), "rdfp14a")
    assert(m(("ex:t", "ex:p", "ex:v")), "rdfp14b")
  }

  test("rdfp14b rebuilds a typed-literal hasValue term exactly") {
    import spark.implicits._
    import graft.rdf.Rdf
    // ex:R has hasValue "5"^^xsd:integer on ex:p; ex:t is asserted a
    // member → rdfp14b must derive (ex:t, ex:p, "5"^^xsd:integer) with
    // the datatype AND numeric sidecar intact, not a plain string; ex:u
    // asserts the value edge → rdfp14a types it (datatype-sensitive join)
    val typed = Seq(("ex:R", "owl:hasValue"), ("ex:u", "ex:p"))
      .toDF("sl", "pl").select(lit("g:t").as("g"), Rdf.iri(col("sl")).as("s"),
        Rdf.iri(col("pl")).as("p"),
        Rdf.term(lit("5"), lit(Rdf.LIT), lit(Rdf.XsdInteger), lit(""),
          lit(5.0)).as("o"))
    val quads = iriQuads(Seq(
      ("ex:R", "owl:onProperty", "ex:p"),
      ("ex:t", "rdf:type", "ex:R"))).unionAll(typed)
    val m = OwlHorst.materialize(spark, quads)
    val derived = m.filter(col("s")("lex") === "ex:t" &&
        col("p")("lex") === "ex:p")
      .select(col("o")("lex"), col("o")("kind"), col("o")("dt"),
        col("o")("lang"), col("o")("num")).collect()
    assert(derived.length == 1, "rdfp14b derives exactly one value edge")
    val r = derived.head
    assert(r.getString(0) == "5" && r.getInt(1) == Rdf.LIT &&
      r.getString(2) == Rdf.XsdInteger && r.getString(3) == "" &&
      r.getDouble(4) == 5.0, s"typed term must round-trip, got $r")
    assert(spo(m)(("ex:u", "rdf:type", "ex:R")),
      "rdfp14a matches on the typed value")
  }

  test("single-premise dispatch keeps per-materialize task count bounded") {
    import java.util.concurrent.atomic.LongAdder
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // the full sf fixture exercises every single-premise family
    // (subClassOf, subPropertyOf, domain, range, symmetric, inverse,
    // hasValue) — with the compiled dispatch table each round runs ONE
    // broadcast join over the delta for all of them, so total task
    // count stays far below the one-scan-per-family shape (~25
    // branches × partitions × rounds; measured ~3900 tasks at local[4]
    // before the rule-table compilation, ~2400 after)
    val tasks = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.increment()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val m = OwlHorst.materialize(spark, TpchRdf.graphDf(spark, sf))
      assert(m.count() > 0)
      org.apache.spark.graft.ListenerSync.await(spark.sparkContext)
      val total = tasks.sum()
      assert(total < 3200,
        s"materialize ran $total tasks — the single-premise families are " +
          "scanning per-family again instead of through the dispatch table")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("rdfp15: someValuesFrom types subjects whose value is typed") {
    val m = spo(OwlHorst.materialize(spark, iriQuads(Seq(
      ("ex:R", "owl:onProperty", "ex:p"),
      ("ex:R", "owl:someValuesFrom", "ex:C"),
      ("ex:u", "ex:p", "ex:x"),
      ("ex:x", "rdf:type", "ex:C"),
      // value not typed ex:C → no membership
      ("ex:n", "ex:p", "ex:y")))))
    assert(m(("ex:u", "rdf:type", "ex:R")))
    assert(!m(("ex:n", "rdf:type", "ex:R")))
  }

  test("rdfp16: allValuesFrom types the values of typed subjects") {
    val m = spo(OwlHorst.materialize(spark, iriQuads(Seq(
      ("ex:R", "owl:onProperty", "ex:p"),
      ("ex:R", "owl:allValuesFrom", "ex:C"),
      ("ex:u", "rdf:type", "ex:R"),
      ("ex:u", "ex:p", "ex:x"),
      // untyped subject → its values stay untyped
      ("ex:m", "ex:p", "ex:y")))))
    assert(m(("ex:x", "rdf:type", "ex:C")))
    assert(!m(("ex:y", "rdf:type", "ex:C")))
  }

  test("rdfp chain: derived sameAs + restriction types converge") {
    // IFP merges ex:a/ex:b; ex:a's p-edge copies to ex:b; hasValue then
    // types BOTH; multi-rule interaction across fixpoint rounds
    val m = spo(OwlHorst.materialize(spark, iriQuads(Seq(
      ("ex:k", "rdf:type", "owl:InverseFunctionalProperty"),
      ("ex:R", "owl:onProperty", "ex:p"),
      ("ex:R", "owl:hasValue", "ex:v"),
      ("ex:a", "ex:k", "ex:w"),
      ("ex:b", "ex:k", "ex:w"),
      ("ex:a", "ex:p", "ex:v")))))
    assert(m(("ex:a", "rdf:type", "ex:R")) && m(("ex:b", "rdf:type", "ex:R")))
  }

  test("distributed sameAs: multi-round fixpoint runs CC exactly once") {
    import graft.infer.SameAs
    // cascade forcing 4 fixpoint rounds alongside a 3-member sameAs
    // class: r1 types ex:u (rdfp14a) + seeds CC, r2 types ex:v1
    // (rdfp16), r3 derives ex:v1's hasValue edge (rdfp14b). Every
    // later round's delta re-derives sameAs expansion statements whose
    // endpoints already share a component — none may re-run CC.
    val quads = iriQuads(Seq(
      ("e:a", "owl:sameAs", "e:b"),
      ("e:b", "owl:sameAs", "e:c"),
      ("e:a", "ex:q", "ex:z"),
      ("ex:R1", "owl:onProperty", "ex:p1"),
      ("ex:R1", "owl:hasValue", "ex:v1"),
      ("ex:R1", "owl:allValuesFrom", "ex:C1"),
      ("ex:C1", "owl:onProperty", "ex:p2"),
      ("ex:C1", "owl:hasValue", "ex:v2"),
      ("ex:u", "ex:p1", "ex:v1")))
    sys.props("graft.sameas.broadcast.limit") = "0" // force distributed
    try {
      val before = SameAs.ccRuns.get()
      val m = spo(OwlHorst.materialize(spark, quads))
      val runs = SameAs.ccRuns.get() - before
      assert(m(("ex:u", "rdf:type", "ex:R1")))
      assert(m(("ex:v1", "rdf:type", "ex:C1")))
      assert(m(("ex:v1", "ex:p2", "ex:v2")))
      assert(m(("e:c", "ex:q", "ex:z")), "3-member class expansion")
      assert(runs == 1L, s"expected a single seed CC run, got $runs")
    } finally sys.props.remove("graft.sameas.broadcast.limit")
  }

  test("degenerate giant sameAs class is excluded from expansion with a warning") {
    import graft.infer.SameAs
    // one 12-member chain with cap 8: expansion must drop it (no
    // quadratic blowup) while a small class still expands
    val giant = (0 until 11).map(i => (s"g:$i", "owl:sameAs", s"g:${i + 1}"))
    val quads = iriQuads(giant ++ Seq(
      ("e:a", "owl:sameAs", "e:b"), ("e:a", "ex:q", "ex:z")))
    sys.props("graft.sameas.broadcast.limit") = "0"
    sys.props("graft.sameas.class.cap") = "8"
    try {
      val m = spo(OwlHorst.materialize(spark, quads))
      assert(m(("e:b", "ex:q", "ex:z")), "small class still expands")
      assert(!m.exists { case (s, p, o) =>
        p == "owl:sameAs" && s.startsWith("g:") && o.startsWith("g:") &&
          s != o && !giant.contains((s, "owl:sameAs", o)) },
        "capped class must not emit derived cross pairs")
    } finally {
      sys.props.remove("graft.sameas.broadcast.limit")
      sys.props.remove("graft.sameas.class.cap")
    }
  }

  test("inferred quads live in g:inferred, explicit untouched") {
    val inf = mat.filter(col("g") === "g:inferred").count()
    val exp = TpchRdf.graphDf(spark, sf).count()
    assert(inf > 0 && mat.count() == inf + exp)
  }
}

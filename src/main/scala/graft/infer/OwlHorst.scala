package graft.infer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Fixpoint
import graft.rdf.Rdf

/** OWL-Horst (pD*) forward-chaining materializer — the reference's one
  * "hard" operator: `owlim:ruleset "owl-horst-optimized"` with sameAs
  * reasoning enabled (`repo-config.ttl:26,45`) materializes entailments
  * at load/insert time so queries run over explicit ∪ inferred
  * statements (SURVEY §2.C).
  *
  * Rule families implemented (the pD* subset exercised by the schema
  * vocabulary present in the data):
  *  - rdfs7         property inheritance through subPropertyOf (closed)
  *  - rdfs9/rdfs11  type propagation through subClassOf (closed)
  *  - rdfs2/rdfs3   domain / range typing
  *  - prp-trp       owl:TransitiveProperty closure
  *  - prp-symp      owl:SymmetricProperty
  *  - prp-inv       owl:inverseOf (both directions)
  *  - eq-*          owl:sameAs symmetric-transitive closure →
  *                  equivalence classes → statement expansion
  *
  * Execution model: the ONTOLOGY (rdfs:* and owl:* triples between classes
  * and properties) is tiny by nature, so its closures are computed
  * driver-side once and broadcast into the instance rules — mirroring
  * how GraphDB compiles the ruleset before streaming instances through
  * it. INSTANCE-level work is all distributed: per-rule DataFrame
  * joins, plus a semi-naive [[Fixpoint]] for transitive properties.
  * Rules run in rounds until no new triple appears (datalog fixpoint,
  * `delta = rules(all) ∖ all`), with `localCheckpoint` per round.
  *
  * sameAs: equivalence classes are tiny (entity aliases), so the class
  * map is collected and broadcast, and affected statements are
  * replicated per member. At 100 TB the scale path is dictionary-level
  * canonicalization at ingest (GraphX connectedComponents for class
  * discovery, rewrite term ids to representatives) — SURVEY §2.C.
  */
object OwlHorst {
  import Rdf.{IRI, RdfType}

  private val G = "g:inferred"

  final case class Ontology(
      subClassOf: Seq[(String, String)],
      subPropOf: Seq[(String, String)],
      domain: Seq[(String, String)],
      range: Seq[(String, String)],
      transitive: Seq[String],
      symmetric: Seq[String],
      inverseOf: Seq[(String, String)])

  private def closePairs(pairs: Seq[(String, String)]): Seq[(String, String)] = {
    var acc = pairs.toSet
    var grew = true
    while (grew) {
      val next = for ((a, b) <- acc; (c, d) <- acc if b == c) yield (a, d)
      val merged = acc ++ next
      grew = merged.size > acc.size
      acc = merged
    }
    acc.toSeq.sortBy(identity)
  }

  def ontology(quads: DataFrame): Ontology = {
    val schema = quads
      .filter(col("p")("lex").isin(
        "rdfs:subClassOf", "rdfs:subPropertyOf", "rdfs:domain", "rdfs:range",
        "owl:inverseOf", RdfType))
      .select(col("s")("lex").as("s"), col("p")("lex").as("p"), col("o")("lex").as("o"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def pairs(pred: String) = schema.collect { case (s, `pred`, o) => (s, o) }.toSeq
    Ontology(
      subClassOf = closePairs(pairs("rdfs:subClassOf")),
      subPropOf = closePairs(pairs("rdfs:subPropertyOf")),
      domain = pairs("rdfs:domain"),
      range = pairs("rdfs:range"),
      transitive = schema.collect { case (s, RdfType, "owl:TransitiveProperty") => s }.toSeq,
      symmetric = schema.collect { case (s, RdfType, "owl:SymmetricProperty") => s }.toSeq,
      inverseOf = pairs("owl:inverseOf"))
  }

  /** One application of every rule family to the current triple set.
    * Families CASCADE in dependency order (inheritance → transitive
    * closure → symmetric/inverse → typing → subclass → sameAs), each
    * seeing the union of `all` and everything derived earlier in the
    * pass — so for acyclic rule dependencies the outer loop converges
    * in one productive round instead of one round per family, and the
    * expensive whole-dataset `except` runs twice, not five times.
    */
  private def onePass(spark: SparkSession, ont: Ontology, all: DataFrame,
      newIn: DataFrame,
      prevClosures: scala.collection.mutable.Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    var deltas = Seq.empty[DataFrame]
    // One branch per rule FAMILY (ontology pairs ride in as broadcast
    // join tables, not per-pair plan branches), each delta eagerly
    // localCheckpoint'ed: `cur` is then a union of LEAF nodes, keeping
    // plans linear in family count instead of nested per stage.
    def emit(df: DataFrame): Unit = {
      val d = df
        .select(col("s").as("s"), col("p").as("p"), col("o").as("o"))
        .localCheckpoint()
      if (!d.isEmpty) deltas :+= d
    }
    def cur: DataFrame = (all +: deltas).reduce(_.unionByName(_))
    // semi-naive seed for the single-premise rules: statements new
    // this round plus anything derived earlier in this pass — a
    // single-premise rule applied to base statements already fired in
    // the round that introduced them
    def newer: DataFrame = (newIn +: deltas).reduce(_.unionByName(_))

    // rdfs7: property inheritance via broadcast (sub, sup) pairs
    if (ont.subPropOf.nonEmpty) {
      val c = newer
      emit(c.join(broadcast(ont.subPropOf.toDF("sub", "sup")),
          c("p")("lex") === col("sub"))
        .select(col("s"), Rdf.iri(col("sup")).as("p"), col("o")))
    }
    // prp-trp: distributed semi-naive closure per transitive property.
    // If every tp edge that is new this round is already in the
    // previous round's closure output, the edge set is closed and the
    // (expensive) fixpoint is skipped — one subset check instead.
    ont.transitive.foreach { tp =>
      val c = cur
      val edges = c.filter(c("p")("lex") === tp && c("o")("kind") === IRI)
        .select(col("s").as("a"), col("o").as("b"))
      val alreadyClosed = prevClosures.get(tp) match {
        case Some(prev) =>
          val n = newer
          n.filter(n("p")("lex") === tp && n("o")("kind") === IRI)
            .select(col("s").as("a"), col("o").as("b"))
            .except(prev).isEmpty
        case None => false
      }
      if (!alreadyClosed) {
        val closed = Fixpoint.closureTerms(edges)
        prevClosures(tp) = closed
        emit(closed.select(col("a").as("s"), Rdf.iri(lit(tp)).as("p"), col("b").as("o")))
      }
    }
    // prp-symp / prp-inv
    if (ont.symmetric.nonEmpty) {
      val c = newer
      emit(c.filter(c("p")("lex").isin(ont.symmetric: _*))
        .select(col("o").as("s"), col("p"), col("s").as("o")))
    }
    if (ont.inverseOf.nonEmpty) {
      val c = newer
      val inv = ont.inverseOf ++ ont.inverseOf.map(_.swap)
      emit(c.join(broadcast(inv.toDF("from_p", "to_p")),
          c("p")("lex") === col("from_p"))
        .select(col("o").as("s"), Rdf.iri(col("to_p")).as("p"), col("s").as("o")))
    }
    // rdfs2 / rdfs3: domain/range typing via broadcast pairs
    if (ont.domain.nonEmpty) {
      val c = newer
      emit(c.join(broadcast(ont.domain.toDF("dp", "dc")), c("p")("lex") === col("dp"))
        .select(col("s"), Rdf.iri(lit(RdfType)).as("p"), Rdf.iri(col("dc")).as("o")))
    }
    if (ont.range.nonEmpty) {
      val c = newer
      emit(c.join(broadcast(ont.range.toDF("rp", "rc")),
          c("p")("lex") === col("rp") && c("o")("kind") === IRI)
        .select(col("o").as("s"), Rdf.iri(lit(RdfType)).as("p"), Rdf.iri(col("rc")).as("o")))
    }
    // rdfs9: type propagation via the (driver-closed) subClassOf pairs
    if (ont.subClassOf.nonEmpty) {
      val c = newer
      emit(c.join(broadcast(ont.subClassOf.toDF("sc", "sd")),
          c("p")("lex") === RdfType && c("o")("lex") === col("sc"))
        .select(col("s"), col("p"), Rdf.iri(col("sd")).as("o")))
    }
    // eq-*: sameAs classes (collected; tiny by construction)
    val curSame = cur
    val sameAsPairs = curSame.filter(curSame("p")("lex") === "owl:sameAs")
      .select(col("s")("lex"), col("o")("lex")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (sameAsPairs.nonEmpty) {
      var rep = Map.empty[String, String]
      def find(x: String): String = rep.get(x) match {
        case Some(p) if p != x => val r = find(p); rep += (x -> r); r
        case _ => rep.getOrElse(x, { rep += (x -> x); x })
      }
      sameAsPairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          val r = if (ra < rb) ra else rb
          rep += (ra -> r); rep += (rb -> r)
        }
      }
      val members = rep.keys.toSeq.groupBy(find)
      val crossPairs = members.values.flatMap { ms =>
        for (a <- ms; b <- ms if a != b) yield (a, b)
      }.toSeq
      if (crossPairs.nonEmpty) {
        emit(crossPairs.toDF("a", "b")
          .select(Rdf.iri(col("a")).as("s"), Rdf.iri(lit("owl:sameAs")).as("p"),
            Rdf.iri(col("b")).as("o")))
        val equivDf = broadcast(crossPairs.toDF("from", "to"))
        val c = cur // expansion sees everything derived earlier this pass
        emit(c.join(equivDf, c("s")("lex") === col("from"))
          .select(Rdf.iri(col("to")).as("s"), col("p"), col("o")))
        val c2 = cur
        emit(c2.join(equivDf, c2("o")("lex") === col("from"))
          .select(col("s"), col("p"), Rdf.iri(col("to")).as("o")))
      }
    }
    deltas.reduceOption(_.unionByName(_)).getOrElse(all.limit(0))
  }

  /** Materialize entailments: returns explicit ∪ inferred quads (the
    * inferred ones in graph `g:inferred` — the `inferred` marker of
    * SURVEY §1.5).
    */
  def materialize(spark: SparkSession, quads: DataFrame): DataFrame =
    run(spark, quads, quads)

  /** Incremental maintenance for streaming inserts (SURVEY §2.C hard
    * part 1, §3.2): `base` is an already-materialized dataset, `delta`
    * a batch of new quads. Single-premise rules fire only against the
    * delta; the transitive closure and sameAs expansion see the full
    * set (they are the genuinely non-local rules). If the delta itself
    * carries ontology axioms the semi-naive shortcut is unsound
    * (existing base statements become new premises), so fall back to a
    * full re-materialization — the reference pins its ruleset at
    * repository-init time (`repo-config.ttl:26`), making that the
    * rare path.
    */
  def incremental(spark: SparkSession, base: DataFrame, delta: DataFrame): DataFrame = {
    val schemaPreds = Seq("rdfs:subClassOf", "rdfs:subPropertyOf", "rdfs:domain",
      "rdfs:range", "owl:inverseOf")
    val deltaHasAxioms = !delta.filter(
      col("p")("lex").isin(schemaPreds: _*) ||
        (col("p")("lex") === RdfType &&
          col("o")("lex").isin("owl:TransitiveProperty", "owl:SymmetricProperty"))
    ).isEmpty
    if (deltaHasAxioms) materialize(spark, base.unionByName(delta))
    else run(spark, base.unionByName(delta), delta)
  }

  private def run(spark: SparkSession, quads: DataFrame, seed: DataFrame): DataFrame = {
    // The deep Union-of-self-joined-lineage plans built below trip
    // Catalyst's Union constraint rewriting on struct-typed columns
    // (NoSuchElementException in rewriteConstraints). Constraint
    // propagation only infers redundant filters — safe to disable.
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    val ont = ontology(quads)
    // prior g:inferred rows participate in the closure but the output
    // inferred graph is rebuilt against the EXPLICIT statements only —
    // a triple that has become explicitly asserted since it was first
    // inferred must not appear twice in the default-graph union
    val explicitRows = quads.filter(col("g") =!= G)
    val explicit = explicitRows.select(col("s"), col("p"), col("o"))
    var all = quads.select(col("s"), col("p"), col("o")).distinct().localCheckpoint()
    var delta =
      if (seed eq quads) all // full materialization: seed IS the dataset
      else seed.select(col("s"), col("p"), col("o")).distinct().localCheckpoint()
    val prevClosures = scala.collection.mutable.Map.empty[String, DataFrame]
    var freshes = Seq.empty[DataFrame]
    var rounds = 0
    var grew = true
    while (grew && rounds < 8) {
      rounds += 1
      val fresh = onePass(spark, ont, all, delta, prevClosures)
        .distinct().except(all).localCheckpoint()
      if (fresh.isEmpty) grew = false
      else {
        all = all.unionByName(fresh).localCheckpoint()
        delta = fresh
        freshes :+= fresh
      }
    }
    // the inferred set is exactly the union of the per-round deltas
    // (each is `except`-disjoint from everything before it) plus any
    // PRIOR inferred rows still absent from the explicit statements —
    // no whole-dataset anti-join needed at the end
    val prior = quads.filter(col("g") === G).select(col("s"), col("p"), col("o"))
    val priorInferred =
      if (prior.isEmpty) Seq.empty[DataFrame]
      else Seq(prior.distinct().except(explicit.distinct()))
    val inferred = (priorInferred ++ freshes).reduceOption(_.unionByName(_))
    inferred match {
      case None => explicitRows
      case Some(inf) => explicitRows.unionByName(
        inf.select(lit(G).as("g"), col("s"), col("p"), col("o")))
    }
  }
}

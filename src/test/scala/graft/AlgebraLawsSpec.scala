package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.rdf.TpchRdf
import graft.sparql.Sparql

/** Property-based algebraic laws over the SPARQL engine (SURVEY §5.2
  * test plan #5): UNION commutativity, FILTER fusion, DISTINCT
  * idempotence, ORDER/LIMIT prefix stability, `p+ ≡ p/p*`, and
  * MINUS ≡ NOT EXISTS on fully-shared-variable patterns.
  */
class AlgebraLawsSpec extends GraftSuite {

  /** deterministic ScalaCheck sampling (no forAll bridge in the
    * offline dependency set — seeds are fixed so failures reproduce)
    */
  def forAllSampled[A](g: Gen[A], n: Int = 5)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      check(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  lazy val quads: DataFrame = TpchRdf.graphDf(spark, sf).cache()

  def rows(text: String): Seq[String] =
    Sparql.query(spark, quads, text).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  def bag(text: String): Map[String, Int] =
    rows(text).groupBy(identity).view.mapValues(_.size).toMap

  val preds: Gen[(String, String)] = for {
    p1 <- Gen.oneOf(":nation", ":region", ":name", ":acctbal")
    p2 <- Gen.oneOf(":nation", ":region", ":name", ":acctbal")
  } yield (p1, p2)
  val thresholds: Gen[(Int, Int)] = for {
    t1 <- Gen.choose(-1000, 10000); t2 <- Gen.choose(-1000, 10000)
  } yield (t1, t2)

  test("UNION is commutative (bag semantics)") {
    forAllSampled(preds) { case (p1, p2) =>
      val a = bag(s"SELECT ?s WHERE { { ?s $p1 ?o } UNION { ?s $p2 ?o } }")
      val b = bag(s"SELECT ?s WHERE { { ?s $p2 ?o } UNION { ?s $p1 ?o } }")
      assert(a == b)
    }
  }

  test("FILTER(e1) FILTER(e2) ≡ FILTER(e1 && e2)") {
    forAllSampled(thresholds) { case (t1, t2) =>
      val a = bag(s"""SELECT ?c WHERE {
        ?c :acctbal ?b . FILTER(?b > $t1) FILTER(?b < $t2) }""")
      val b = bag(s"""SELECT ?c WHERE {
        ?c :acctbal ?b . FILTER(?b > $t1 && ?b < $t2) }""")
      assert(a == b)
    }
  }

  test("DISTINCT is idempotent and subsumes duplicates") {
    forAllSampled(Gen.oneOf(":nation", ":region", ":name", ":acctbal"), 4) { p =>
      val d = rows(s"SELECT DISTINCT ?s WHERE { ?s $p ?o }")
      assert(d.distinct.size == d.size)
      val raw = rows(s"SELECT ?s WHERE { ?s $p ?o }")
      assert(raw.distinct.toSet == d.toSet)
    }
  }

  test("ORDER BY + LIMIT n is a prefix of ORDER BY (deterministic keys)") {
    val full = rows("""SELECT ?c ?b WHERE { ?c :acctbal ?b . ?c a :Customer }
      ORDER BY DESC(?b) ?c""")
    forAllSampled(Gen.choose(1, 20)) { n =>
      val lim = rows(s"""SELECT ?c ?b WHERE { ?c :acctbal ?b . ?c a :Customer }
        ORDER BY DESC(?b) ?c LIMIT $n""")
      assert(lim == full.take(n))
    }
  }

  test("p+ ≡ p/p* over the schema hierarchy") {
    val plus = bag("SELECT ?a ?b WHERE { GRAPH g:schema { ?a rdfs:subClassOf+ ?b } }")
    val seqStar = bag(
      "SELECT ?a ?b WHERE { GRAPH g:schema { ?a rdfs:subClassOf/rdfs:subClassOf* ?b } }")
    assert(plus == seqStar && plus.nonEmpty)
  }

  test("seeded closure ≡ var-var closure restricted to the endpoint") {
    // the bound-endpoint walk and the full relation closure must agree
    // for every constant choice: seed from each node of the hierarchy
    // and compare against the var-var evaluation filtered driver-side
    val full = rows("""
      SELECT ?a ?b WHERE { GRAPH g:schema { ?a rdfs:subClassOf+ ?b } }""")
      .map(_.split('|')).map(r => (r(0), r(1))).toSet
    val nodes = (full.map(_._1) ++ full.map(_._2)).toSeq.sorted
    nodes.foreach { n =>
      val fwd = rows(s"""
        SELECT ?b WHERE { GRAPH g:schema { $n rdfs:subClassOf+ ?b } }""").toSet
      assert(fwd == full.filter(_._1 == n).map(_._2), s"forward from $n")
      val bwd = rows(s"""
        SELECT ?a WHERE { GRAPH g:schema { ?a rdfs:subClassOf+ $n } }""").toSet
      assert(bwd == full.filter(_._2 == n).map(_._1), s"backward to $n")
    }
  }

  test("MINUS ≡ FILTER NOT EXISTS when every variable is shared") {
    val minus = bag("""SELECT ?c WHERE {
      ?c a :Customer . MINUS { ?c a :Customer . ?c :mktsegment "BUILDING" } }""")
    val notEx = bag("""SELECT ?c WHERE {
      ?c a :Customer . FILTER NOT EXISTS { ?c :mktsegment "BUILDING" } }""")
    assert(minus == notEx)
  }

  test("mid-group BIND ≡ end-of-group BIND when later patterns are blind to it") {
    // the hoistExtends normalization: Join(Extend(A), B) ≡
    // Extend(Join(A, B)) when B neither binds the target nor binds a
    // var the expression reads as unbound — equal bags, any position
    val mid = bag("""SELECT ?s ?v ?nn WHERE {
      ?s :acctbal ?b . BIND(?b * 2 AS ?v) . ?s :nation ?n . ?n :name ?nn }""")
    val end = bag("""SELECT ?s ?v ?nn WHERE {
      ?s :acctbal ?b . ?s :nation ?n . ?n :name ?nn . BIND(?b * 2 AS ?v) }""")
    assert(mid == end && mid.nonEmpty)
  }

  test("BIND lexical scope survives normalization: later-bound vars stay unbound") {
    // ?nn is bound only AFTER the BIND — §10.1 scope says the BIND
    // reads it as unbound, and the hoist legality check must refuse to
    // move the Extend above the join that binds it
    val rs = rows("""SELECT ?n ?v WHERE {
      ?n a :Nation . BIND(?nn AS ?v) . ?n :name ?nn }""")
    assert(rs.size == 25 && rs.forall(_.endsWith("|null")),
      s"BIND must see ?nn as unbound at its lexical position: ${rs.take(3)}")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.rdf.TpchRdf
import graft.sparql.Sparql

/** Property-based fuzz of the parser→algebra→DataFrame pipeline
  * (VERDICT r5 task 7): randomly composed small SELECTs over the
  * fixture vocabulary must parse, compile and execute without
  * throwing, and the solution-modifier laws (LIMIT bound, ORDER+
  * LIMIT/OFFSET prefix, DISTINCT dedup) must hold on whatever the
  * generator produced — an adversarial complement to the law tests in
  * [[AlgebraLawsSpec]] that fix the query shapes by hand.
  */
class SparqlFuzzSpec extends GraftSuite {

  /** deterministic ScalaCheck sampling (no forAll bridge in the
    * offline dependency set — seeds are fixed so failures reproduce)
    */
  def forAllSampled[A](g: Gen[A], n: Int)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      check(g.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  lazy val quads: DataFrame = TpchRdf.graphDf(spark, sf).cache()

  private def rows(text: String): Seq[String] =
    Sparql.query(spark, quads, text).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  // connected pattern pool: every pattern shares a var with some other
  private val patternPool = Seq(
    "?s a :Customer", "?s :nation ?n", "?s :acctbal ?b", "?s :name ?nm",
    "?n :name ?nn", "?n :region ?r", "?r :name ?rn",
    "?s :mktsegment \"BUILDING\"", "?s :nation/:region ?r",
    "?s !(:acctbal|:name) ?n",
    // blank-node sugar and the full negated-set grammar
    "?s :nation [ :name ?nn ]",
    "?s :nation [ :region [ :name ?rn ] ]",
    "_:o :custkey ?s",
    "?s !(:acctbal|^:custkey) ?n")

  // filters may reference vars the sampled BGP never binds — SPARQL
  // evaluates those to an error, i.e. FILTER drops the row; they must
  // never throw
  private val filterPool = Seq(
    "?b > 1000", "?b < 5000 && ?b > -100", "STRLEN(?nm) > 5",
    "BOUND(?b)", "!BOUND(?zz)", "isIRI(?s)", "REGEX(?nn, \"^A\")",
    "?b * 2 >= ?b + ?b", "COALESCE(?b, 0) >= 0", "DATATYPE(?b) = xsd:decimal")

  private val optionalPool = Seq(
    "OPTIONAL { ?s :acctbal ?ob }",
    "OPTIONAL { ?n :name ?onn . FILTER(?onn > \"F\") }",
    "OPTIONAL { ?s :name ?onm . ?s :mktsegment ?oms }")

  // probe clauses: id-plane semi/anti joins vs struct fallbacks
  private val probePool = Seq(
    "MINUS { ?s :mktsegment \"BUILDING\" }",
    "FILTER NOT EXISTS { ?s :acctbal ?zb . FILTER(?zb > 9000) }",
    "FILTER EXISTS { ?s :nation ?zn }",
    "MINUS { ?q :unrelated ?w }") // disjoint-domain MINUS removes nothing

  private final case class QShape(pats: Seq[String], opt: Option[String],
      filt: Option[String], probe: Option[String],
      distinct: Boolean, limit: Option[Int], offset: Int)

  private val qGen: Gen[QShape] = for {
    nPats <- Gen.choose(1, 3)
    pats <- Gen.pick(nPats, patternPool)
    opt <- Gen.option(Gen.oneOf(optionalPool))
    filt <- Gen.option(Gen.oneOf(filterPool))
    probe <- Gen.option(Gen.oneOf(probePool))
    distinct <- Gen.oneOf(true, false)
    limit <- Gen.option(Gen.choose(1, 40))
    offset <- Gen.oneOf(0, 0, 3)
  } yield QShape(pats.toSeq, opt, filt, probe, distinct, limit, offset)

  private def render(q: QShape, withSlice: Boolean): String = {
    val body = (q.pats.map(_ + " .") ++ q.opt.toSeq ++ q.probe.toSeq ++
      q.filt.map(f => s"FILTER($f)")).mkString(" ")
    val dist = if (q.distinct) "DISTINCT " else ""
    // ORDER BY every projected var: two solutions that compare equal on
    // all vars are the SAME row, so the ordered sequence is unique and
    // the slice laws can compare exact sequences
    val vars = "?s ?n ?b ?nm ?nn ?r ?rn ?ob ?onn ?onm ?oms".split(" ")
      .filter(v => body.contains(v + " ") || body.contains(v + ")")).distinct
    val order = s" ORDER BY ${vars.mkString(" ")}"
    val slice = if (!withSlice) ""
      else q.limit.map(l => s" LIMIT $l").getOrElse("") +
        (if (q.offset > 0) s" OFFSET ${q.offset}" else "")
    s"SELECT $dist* WHERE { $body }$order$slice"
  }

  test("random SELECTs execute; LIMIT/OFFSET/DISTINCT laws hold") {
    forAllSampled(qGen, 20) { q =>
      val sliced = rows(render(q, withSlice = true))
      q.limit.foreach(l => assert(sliced.size <= l, render(q, withSlice = true)))
      if (q.distinct)
        assert(sliced.distinct.size == sliced.size, render(q, withSlice = true))
      // slice law: the sliced result is exactly the ordered full
      // sequence with OFFSET dropped and LIMIT taken
      val full = rows(render(q, withSlice = false))
      val expect = q.limit.map(l => full.slice(q.offset, q.offset + l))
        .getOrElse(full.drop(q.offset))
      assert(sliced == expect, render(q, withSlice = true))
    }
  }

  lazy val enc: graft.core.EncodedQuads = graft.core.EncodedQuads(
    graft.core.TermDictionary.encode(quads),
    graft.core.TermDictionary.build(quads))

  private def rowsEnc(text: String): Seq[String] =
    Sparql.query(spark, quads, text, encoded = Some(enc)).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("struct and id planes agree on random shapes") {
    forAllSampled(qGen, 12) { q =>
      val text = render(q, withSlice = false)
      assert(rowsEnc(text).sorted == rows(text).sorted, text)
    }
  }

  test("struct and id planes agree on random aggregates") {
    // exercises the DISTINCT / GROUP BY id-plane pushdown and its
    // struct-plane fallbacks on the same sampled patterns
    forAllSampled(qGen, 12) { q =>
      val body = (q.pats.map(_ + " .") ++
        q.filt.map(f => s"FILTER($f)")).mkString(" ")
      val bound = "?s ?n ?b ?nm ?nn ?r ?rn".split(" ")
        .filter(v => body.contains(v + " ") || body.contains(v + ")"))
      val key = bound.head
      val other = bound.last
      val agg = s"SELECT $key (COUNT(*) AS ?c1) (COUNT(DISTINCT $other) AS ?c2) " +
        s"WHERE { $body } GROUP BY $key"
      assert(rowsEnc(agg).sorted == rows(agg).sorted, agg)
      val dist = s"SELECT DISTINCT ${bound.mkString(" ")} WHERE { $body }"
      assert(rowsEnc(dist).sorted == rows(dist).sorted, dist)
      // EXPRESSION group keys: computed over decoded vars, grouped on
      // the computed term — equal across planes
      val kagg = s"SELECT ?kx (COUNT(*) AS ?c) WHERE { $body } " +
        s"GROUP BY (STR($key) AS ?kx)"
      assert(rowsEnc(kagg).sorted == rows(kagg).sorted, kagg)
      // value aggregates (the full pushdown family): ROUND the float
      // folds — double addition is partition-order dependent, and the
      // two planes may fold in different orders; MIN/MAX are exact
      if (bound.contains("?b")) {
        val vagg = s"SELECT $key (ROUND(SUM(?b)) AS ?sb) " +
          s"(ROUND(AVG(?b)) AS ?ab) (MIN(?b) AS ?mn) (MAX(?b) AS ?mx) " +
          s"WHERE { $body } GROUP BY $key"
        assert(rowsEnc(vagg).sorted == rows(vagg).sorted, vagg)
        // EXPRESSION aggregate arguments (SUM(?b * 2), COUNT(STR(?b)))
        // — the id plane decodes only the argument vars, keys stay ids
        val eagg = s"SELECT $key (ROUND(SUM(?b * 2)) AS ?s2) " +
          s"(COUNT(STR(?b)) AS ?cs) (MAX(?b - 1) AS ?m1) " +
          s"WHERE { $body } GROUP BY $key"
        assert(rowsEnc(eagg).sorted == rows(eagg).sorted, eagg)
      }
    }
  }

  // expression-bearing BIND shapes for the cross-plane property: the
  // id plane computes the bound term after partial decode of only the
  // expression-read vars (extendOverIds); results must match the
  // struct plane exactly, including unbound-arg → unbound-result
  private val bindPool = Seq(
    "BIND(?b * 2 AS ?dbl)",
    "BIND(CONCAT(?nm, \"!\") AS ?exc)",
    "BIND(IF(?b > 1000, \"hi\", \"lo\") AS ?band)",
    "BIND(STRLEN(?nm) AS ?len)",
    "BIND(COALESCE(?b, 0) AS ?bz)")

  test("struct and id planes agree on BIND / FILTER expression shapes") {
    forAllSampled(qGen, 8) { q =>
      val body = (q.pats.map(_ + " .") ++
        q.filt.map(f => s"FILTER($f)")).mkString(" ")
      for (b <- bindPool) {
        val text = s"SELECT * WHERE { $body $b }"
        assert(rowsEnc(text).sorted == rows(text).sorted, text)
      }
    }
  }

  test("struct and id planes agree on MID-GROUP BIND shapes") {
    // exercises the hoistExtends normalization: the BIND sits BETWEEN
    // triple patterns, so without the rewrite the whole tree falls to
    // struct joins; with it the join runs on ids on the encoded plane
    forAllSampled(qGen, 8) { q =>
      if (q.pats.size >= 2) {
        for (b <- bindPool) {
          val body = q.pats.head + " . " + b + " . " +
            q.pats.tail.map(_ + " .").mkString(" ")
          val text = s"SELECT * WHERE { $body }"
          assert(rowsEnc(text).sorted == rows(text).sorted, text)
        }
      }
    }
  }

  test("struct and id planes agree on expression sort keys with LIMIT") {
    // the id-plane top-k decodes only the vars the sort EXPRESSIONS
    // read before the cut; sequences (not just sets) must match
    for (text <- Seq(
      "SELECT ?s ?b WHERE { ?s :acctbal ?b . ?s :nation ?n } " +
        "ORDER BY DESC(?b * 2) ?s LIMIT 7",
      "SELECT ?nn WHERE { ?n :name ?nn . ?n :region ?r } " +
        "ORDER BY (STRLEN(?nn)) ?nn LIMIT 5"))
      assert(rowsEnc(text) == rows(text), text)
  }

  test("struct and id planes agree on UNION-in-join shapes (nullable ids)") {
    // the null-compat id join (idJoin's null-or-equal form): a UNION
    // leaf joined inside a Join tree, with branch-partial vars as NULL
    // ids — including the fan-out case where the JOIN var itself is
    // unbound on one branch (§18.3: unbound is compatible with every
    // binding, so branch-1 rows join ALL right rows)
    val shapes = Seq(
      // shared join var bound in both branches; partials ride as nulls
      """SELECT * WHERE { ?s :acctbal ?b .
         { ?s a :Customer . ?s :name ?nm } UNION { ?s :nation ?n } }""",
      // the JOIN var (?n) is unbound on one branch: null-compat fan-out
      """SELECT * WHERE {
         { ?s a :Customer } UNION { ?s :nation ?n } . ?n :name ?nn }""",
      // three-leaf tree: BGP ⋈ UNION ⋈ BGP
      """SELECT * WHERE { ?s :acctbal ?b .
         { ?s :name ?nm } UNION { ?s :mktsegment ?ms } . ?s :nation ?n }""",
      // DISTINCT over the joined union (wide-scope dedup on nullable ids)
      """SELECT DISTINCT ?s ?nm ?n WHERE { ?s :acctbal ?b .
         { ?s a :Customer . ?s :name ?nm } UNION { ?s :nation ?n } }""",
      // GROUP BY over the joined union; COUNT(?nm) skips unbound
      """SELECT ?s (COUNT(?nm) AS ?c) WHERE { ?s :acctbal ?b .
         { ?s a :Customer . ?s :name ?nm } UNION { ?s :nation ?n } }
         GROUP BY ?s""",
      // OPTIONAL over UNION: right side is a union with partial vars
      """SELECT * WHERE { ?s :acctbal ?b .
         OPTIONAL { { ?s :name ?nm } UNION { ?s :nation ?n } } }""",
      // OPTIONAL whose LEFT side is union-partial: the shared var can
      // be unbound on the left (null-compat left join, coalesce merge)
      """SELECT * WHERE {
         { ?s a :Customer } UNION { ?s :nation ?n } .
         OPTIONAL { ?n :name ?nn } }""",
      // LEFT-side union-partial vars NOT shared with the OPTIONAL
      // right (?nm, ?n): their NULL ids must still decode (left
      // dictionary join) instead of silently dropping every row
      """SELECT * WHERE {
         { ?s :name ?nm } UNION { ?s :nation ?n } .
         OPTIONAL { ?s :acctbal ?b } }""",
      // same shape with a condition on the OPTIONAL and a left FILTER
      // reading one partial var — both planes must agree on survivors
      """SELECT * WHERE {
         { ?s :name ?nm } UNION { ?s :nation ?n } .
         OPTIONAL { ?s :acctbal ?b . FILTER(?b > 0) } }""",
      // the shared var (?n) is nullable on BOTH sides: the partitioned
      // id join tiles (l null?, r null?) into three branches — bound
      // hash join + the two §18.3 fan-out slices
      """SELECT * WHERE {
         { ?s :nation ?n } UNION { ?s a :Customer } .
         { ?n :name ?nn } UNION { ?nn a :Region } }""")
    for (text <- shapes)
      assert(rowsEnc(text).sorted == rows(text).sorted, text)
  }

  test("struct and id planes agree on random UNION/OPTIONAL/EXISTS mixes") {
    // adversarial generator for the nullable-id machinery: UNION
    // leaves with branch-partial vars joined against tails that share
    // a bound, a partial, or no var; OPTIONAL tails (the partitioned
    // left join); EXISTS conjunctions/disjunctions (the partition-
    // union split) over the unioned scope
    val branchPool = Seq(
      "?s a :Customer", "?s :nation ?n", "?s :name ?nm",
      "?s :acctbal ?b", "?s :mktsegment ?ms", "?s :nation [ :name ?nn ]")
    val tailPool = Seq(
      "?s :acctbal ?b .", "?n :name ?nn .",
      "OPTIONAL { ?s :acctbal ?b }", "OPTIONAL { ?n :name ?nn }",
      "OPTIONAL { ?s :name ?nm . FILTER(?b > 0) }", "")
    val existsPool = Seq(
      "FILTER(EXISTS { ?s :nation ?zn } || EXISTS { ?s a :Customer })",
      "FILTER(EXISTS { ?s :acctbal ?zb . FILTER(?zb > 2000) } || " +
        "EXISTS { ?s :mktsegment \"BUILDING\" })",
      "FILTER(NOT EXISTS { ?s :acctbal ?zb } && EXISTS { ?s :nation ?zn })",
      "FILTER NOT EXISTS { ?s :nation ?zn . OPTIONAL { ?zn :name ?zx } }",
      "")
    val gen = for {
      b1 <- Gen.oneOf(branchPool)
      b2 <- Gen.oneOf(branchPool.filterNot(_ == b1))
      tail <- Gen.oneOf(tailPool)
      ex <- Gen.oneOf(existsPool)
      distinct <- Gen.oneOf(true, false)
    } yield (b1, b2, tail, ex, distinct)
    forAllSampled(gen, 14) { case (b1, b2, tail, ex, distinct) =>
      val d = if (distinct) "DISTINCT " else ""
      val text = s"SELECT $d* WHERE { { $b1 } UNION { $b2 } . $tail $ex }"
      assert(rowsEnc(text).sorted == rows(text).sorted, text)
    }
  }

  test("degenerate shapes: empty group, unbound-only filter, zero limit") {
    assert(rows("SELECT * WHERE { }").size == 1) // Unit0 solution
    assert(rows("SELECT ?s WHERE { ?s a :Customer . FILTER(?nope) }").isEmpty)
    assert(rows("SELECT ?s WHERE { ?s a :Customer } LIMIT 0").isEmpty)
  }

  test("correlated EXISTS ≡ manual decorrelation across random thresholds") {
    // §18.6 substitution: the decorrelated plan must agree with the
    // hand-joined formulation for every threshold, for EXISTS and its
    // complement, in the direct-FILTER and compound-boolean positions.
    // (one nation per subject in the fixture → the manual join does
    // not fan out, so sequences compare exactly)
    val thrGen = Gen.choose(-5000, 9999)
    forAllSampled(thrGen, 8) { t =>
      val ex = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        FILTER EXISTS { ?s :nation ?n . FILTER(?b > $t) } } ORDER BY ?s ?b""")
      val manual = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        ?s :nation ?n0 . FILTER(?b > $t) } ORDER BY ?s ?b""")
      assert(ex == manual, s"threshold $t")
      // complement partitions the acctbal-bearing subjects
      val notEx = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        FILTER NOT EXISTS { ?s :nation ?n . FILTER(?b > $t) } } ORDER BY ?s ?b""")
      val all = rows("SELECT ?s ?b WHERE { ?s :acctbal ?b } ORDER BY ?s ?b")
      assert((ex ++ notEx).sorted == all.sorted, s"threshold $t")
      // compound position: flag path must substitute identically
      val comp = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        FILTER(EXISTS { ?s :nation ?n . FILTER(?b > $t) } && ?b < 9000) }
        ORDER BY ?s ?b""")
      val compManual = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        ?s :nation ?n0 . FILTER(?b > $t && ?b < 9000) } ORDER BY ?s ?b""")
      assert(comp == compManual, s"threshold $t (compound)")
      // outer+inner mixed condition through a two-hop inner pattern
      val mix = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        FILTER EXISTS { ?s :nation ?n . ?n :name ?nn .
          FILTER(STRLEN(?nn) * 1000 > ?b + $t) } } ORDER BY ?s ?b""")
      val mixManual = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        ?s :nation ?n0 . ?n0 :name ?nn0 .
        FILTER(STRLEN(?nn0) * 1000 > ?b + $t) } ORDER BY ?s ?b""")
      assert(mix == mixManual, s"threshold $t (mixed)")
      // invisible-OPTIONAL drop law: EXISTS { A OPTIONAL B } ≡
      // EXISTS { A } when nothing reads B's vars — for every
      // threshold, correlated-inside-the-optional or not
      val opt = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        FILTER EXISTS { ?s :nation ?n .
          OPTIONAL { ?n :name ?x . FILTER(?b > $t) } } } ORDER BY ?s ?b""")
      val optBase = rows(s"""SELECT ?s ?b WHERE { ?s :acctbal ?b .
        FILTER EXISTS { ?s :nation ?n } } ORDER BY ?s ?b""")
      assert(opt == optBase, s"threshold $t (optional drop)")
    }
  }
}

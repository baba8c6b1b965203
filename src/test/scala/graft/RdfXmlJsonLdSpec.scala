package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.rdf.Rdf
import graft.rio.{JsonLd, RdfXml, Rio, Turtle}

/** RDF/XML and JSON-LD parser tests — the remaining RDF4J Rio input
  * formats of the reference's delegated stack
  * (`GraphDBSystemAdapter.java:286` itself only ever sends Turtle).
  * Each format: term fidelity, structural features, cross-format
  * agreement with the Turtle parser, and the Spark reader path.
  */
class RdfXmlJsonLdSpec extends GraftSuite {

  private def spo(stmts: Seq[Turtle.Stmt]): Set[(String, String, String)] =
    stmts.map(st => (st.s.lex, st.p.lex, st.o.lex)).toSet

  // ---- RDF/XML --------------------------------------------------------

  test("rdfxml: descriptions, typed nodes, datatypes, lang, nesting") {
    val doc = """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/" xml:lang="en">
      |  <rdf:Description rdf:about="http://ex.org/a">
      |    <ex:name>Alice</ex:name>
      |    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
      |    <ex:knows rdf:resource="http://ex.org/b"/>
      |    <ex:likes>
      |      <ex:Thing rdf:about="http://ex.org/t"/>
      |    </ex:likes>
      |  </rdf:Description>
      |  <ex:Person rdf:about="http://ex.org/b">
      |    <ex:name xml:lang="de">Bob</ex:name>
      |  </ex:Person>
      |</rdf:RDF>""".stripMargin
    val stmts = RdfXml.parseDoc(doc, "f:")
    val m = spo(stmts)
    assert(m(("http://ex.org/a", "http://ex.org/name", "Alice")))
    assert(m(("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b")))
    assert(m(("http://ex.org/a", "http://ex.org/likes", "http://ex.org/t")))
    assert(m(("http://ex.org/t", "rdf:type", "http://ex.org/Thing")),
      "nested typed node emits rdf:type")
    assert(m(("http://ex.org/b", "rdf:type", "http://ex.org/Person")))
    val age = stmts.find(_.p.lex == "http://ex.org/age").get.o
    assert(age.dt == Rdf.XsdInteger && age.lex == "30" && age.num.contains(30.0),
      "xsd namespace compacts and numeric sidecar is set")
    val alice = stmts.find(st => st.o.lex == "Alice").get.o
    assert(alice.lang == "en", "xml:lang inherits from rdf:RDF")
    val bob = stmts.find(st => st.o.lex == "Bob").get.o
    assert(bob.lang == "de", "xml:lang overrides per element")
  }

  test("rdfxml: nodeID, rdf:ID with xml:base, property attributes, li") {
    val doc = """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/" xml:base="http://base.org/doc">
      |  <rdf:Description rdf:ID="frag">
      |    <ex:ref rdf:nodeID="n1"/>
      |  </rdf:Description>
      |  <rdf:Description rdf:nodeID="n1" ex:inline="yes">
      |    <rdf:li>first</rdf:li>
      |    <rdf:li>second</rdf:li>
      |  </rdf:Description>
      |</rdf:RDF>""".stripMargin
    val stmts = RdfXml.parseDoc(doc, "f:")
    val m = spo(stmts)
    assert(m(("http://base.org/doc#frag", "http://ex.org/ref", "f:n1")),
      "rdf:ID resolves against xml:base; nodeID is scope-salted")
    assert(m(("f:n1", "http://ex.org/inline", "yes")), "property attribute")
    assert(m(("f:n1", "rdf:_1", "first")) && m(("f:n1", "rdf:_2", "second")),
      "rdf:li numbers per node element")
  }

  test("rdfxml: parseType Resource, Collection, Literal") {
    val doc = """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/">
      |  <rdf:Description rdf:about="http://ex.org/a">
      |    <ex:addr rdf:parseType="Resource">
      |      <ex:city>Springfield</ex:city>
      |    </ex:addr>
      |    <ex:items rdf:parseType="Collection">
      |      <rdf:Description rdf:about="http://ex.org/i1"/>
      |      <rdf:Description rdf:about="http://ex.org/i2"/>
      |    </ex:items>
      |    <ex:note rdf:parseType="Literal">plain <b>bold</b> text</ex:note>
      |  </rdf:Description>
      |</rdf:RDF>""".stripMargin
    val stmts = RdfXml.parseDoc(doc, "f:")
    val addr = stmts.find(_.p.lex == "http://ex.org/addr").get.o
    assert(addr.kind == Rdf.BNODE)
    assert(spo(stmts)((addr.lex, "http://ex.org/city", "Springfield")))
    val head = stmts.find(_.p.lex == "http://ex.org/items").get.o
    assert(head.kind == Rdf.BNODE)
    val firsts = stmts.filter(_.p.lex == "rdf:first").map(_.o.lex)
    assert(firsts == Seq("http://ex.org/i1", "http://ex.org/i2"))
    val rests = stmts.filter(_.p.lex == "rdf:rest").map(_.o.lex)
    assert(rests.count(_ == "rdf:nil") == 1 && rests.length == 2)
    val note = stmts.find(_.p.lex == "http://ex.org/note").get.o
    assert(note.dt == "rdf:XMLLiteral" && note.lex.contains("<b>bold</b>"))
  }

  test("rdfxml: an owl ontology drives the same lexical space as turtle") {
    val xml = """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
      |         xmlns:owl="http://www.w3.org/2002/07/owl#">
      |  <owl:Class rdf:about="http://ex.org/Dog">
      |    <rdfs:subClassOf rdf:resource="http://ex.org/Animal"/>
      |  </owl:Class>
      |  <owl:ObjectProperty rdf:about="http://ex.org/owns">
      |    <owl:inverseOf rdf:resource="http://ex.org/ownedBy"/>
      |  </owl:ObjectProperty>
      |</rdf:RDF>""".stripMargin
    val ttl = """
      |<http://ex.org/Dog> a <owl:Class> ;
      |  <rdfs:subClassOf> <http://ex.org/Animal> .
      |<http://ex.org/owns> a <owl:ObjectProperty> ;
      |  <owl:inverseOf> <http://ex.org/ownedBy> .
      |""".stripMargin
    assert(spo(RdfXml.parseDoc(xml)) == spo(Turtle.parseDoc(ttl)),
      "w3c vocab compaction makes rdf/xml and turtle term-identical")
  }

  test("rdfxml: rejects DTDs, reification and aboutEach") {
    val dtd = """<?xml version="1.0"?>
      |<!DOCTYPE rdf:RDF [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/">
      |  <rdf:Description rdf:about="http://ex.org/a"><ex:p>&xxe;</ex:p></rdf:Description>
      |</rdf:RDF>""".stripMargin
    intercept[Exception](RdfXml.parseDoc(dtd))
    val reify = """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/">
      |  <rdf:Description rdf:about="http://ex.org/a">
      |    <ex:p rdf:ID="stmt1">v</ex:p>
      |  </rdf:Description>
      |</rdf:RDF>""".stripMargin
    intercept[IllegalArgumentException](RdfXml.parseDoc(reify))
  }

  // ---- JSON-LD --------------------------------------------------------

  test("jsonld: context prefixes, terms, coercion, typed values") {
    val doc = """{
      |  "@context": {
      |    "ex": "http://ex.org/",
      |    "name": "ex:name",
      |    "knows": {"@id": "ex:knows", "@type": "@id"},
      |    "age": {"@id": "ex:age", "@type": "http://www.w3.org/2001/XMLSchema#integer"}
      |  },
      |  "@id": "http://ex.org/a",
      |  "@type": "ex:Person",
      |  "name": "Alice",
      |  "age": "30",
      |  "knows": ["http://ex.org/b", "_:b0"],
      |  "ex:score": 4.5,
      |  "ex:active": true,
      |  "ex:note": {"@value": "hallo", "@language": "de"}
      |}""".stripMargin
    val quads = JsonLd.parseDoc(doc, "f:")
    assert(quads.forall(_._1 == ""))
    val stmts = quads.map(_._2)
    val m = spo(stmts)
    assert(m(("http://ex.org/a", "rdf:type", "http://ex.org/Person")))
    assert(m(("http://ex.org/a", "http://ex.org/name", "Alice")))
    assert(m(("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b")))
    assert(m(("http://ex.org/a", "http://ex.org/knows", "f:b0")),
      "_: reference coerced via @type:@id, scope-salted")
    val age = stmts.find(_.p.lex == "http://ex.org/age").get.o
    assert(age.dt == Rdf.XsdInteger && age.num.contains(30.0))
    val score = stmts.find(_.p.lex == "http://ex.org/score").get.o
    assert(score.dt == "xsd:double" && score.num.contains(4.5))
    val active = stmts.find(_.p.lex == "http://ex.org/active").get.o
    assert(active.dt == Rdf.XsdBoolean && active.lex == "true")
    val note = stmts.find(_.p.lex == "http://ex.org/note").get.o
    assert(note.lang == "de" && note.lex == "hallo")
  }

  test("jsonld: @graph named graphs, default array form, lists, nesting") {
    val doc = """{
      |  "@context": {"ex": "http://ex.org/"},
      |  "@graph": [
      |    {"@id": "http://g.org/1", "@graph": [
      |      {"@id": "ex:a", "ex:p": "in-g1"}
      |    ]},
      |    {"@id": "ex:b",
      |     "ex:list": {"@list": [1, 2]},
      |     "ex:child": {"ex:leaf": "v"}}
      |  ]
      |}""".stripMargin
    val quads = JsonLd.parseDoc(doc, "f:")
    val inG1 = quads.filter(_._1 == "http://g.org/1").map(_._2)
    assert(spo(inG1)(("http://ex.org/a", "http://ex.org/p", "in-g1")))
    val dflt = quads.filter(_._1 == "").map(_._2)
    val firsts = dflt.filter(_.p.lex == "rdf:first").map(_.o.lex)
    assert(firsts == Seq("1", "2"))
    val child = dflt.find(_.p.lex == "http://ex.org/child").get.o
    assert(child.kind == Rdf.BNODE)
    assert(spo(dflt)((child.lex, "http://ex.org/leaf", "v")))
  }

  test("jsonld: remote context rejected, unmapped keys dropped") {
    intercept[IllegalArgumentException](
      JsonLd.parseDoc("""{"@context": "http://remote.org/ctx.jsonld"}"""))
    val quads = JsonLd.parseDoc(
      """{"@id": "http://ex.org/a", "unmapped": "x", "http://ex.org/p": "y"}""")
    assert(quads.length == 1, "unmapped key dropped, absolute-IRI key kept")
    assert(quads.head._2.o.lex == "y")
  }

  test("jsonld and turtle parsers agree on shared content") {
    val jsonld = """{
      |  "@context": {"ex": "http://ex.org/",
      |    "rdfs": "http://www.w3.org/2000/01/rdf-schema#"},
      |  "@id": "ex:Dog",
      |  "@type": "http://www.w3.org/2002/07/owl#Class",
      |  "rdfs:subClassOf": {"@id": "ex:Animal"},
      |  "rdfs:label": "Dog"
      |}""".stripMargin
    val ttl = """
      |<http://ex.org/Dog> a <owl:Class> ;
      |  <rdfs:subClassOf> <http://ex.org/Animal> ;
      |  <rdfs:label> "Dog" .
      |""".stripMargin
    assert(spo(JsonLd.parseDoc(jsonld).map(_._2)) == spo(Turtle.parseDoc(ttl)))
  }

  test("generated statements round-trip through rdf/xml and json-ld") {
    // same deterministic corpus shape as the n-quads/trig round-trip
    val rnd = new scala.util.Random(7)
    def iri() = Turtle.Term(s"http://ex.org/r${rnd.nextInt(50)}", Rdf.IRI, "", "", None)
    def bnode() = Turtle.Term(s"f1:-a${rnd.nextInt(20)}", Rdf.BNODE, "", "", None)
    def literal() = rnd.nextInt(5) match {
      case 0 => Turtle.Term("plain \"quote\\back\n\ttab <&>", Rdf.LIT, Rdf.XsdString, "", None)
      case 1 => Turtle.Term("tagged", Rdf.LIT, Rdf.XsdString,
        Seq("en", "fr", "en-US")(rnd.nextInt(3)), None)
      case 2 =>
        val v = rnd.nextInt(1000) - 500
        Turtle.Term(v.toString, Rdf.LIT, Rdf.XsdInteger, "", Some(v.toDouble))
      case 3 =>
        val v = BigDecimal(rnd.nextInt(100000)) / 1000
        Turtle.Term(v.setScale(6).bigDecimal.toPlainString, Rdf.LIT,
          Rdf.XsdDecimal, "", Some(v.toDouble))
      case _ => Turtle.Term("typed", Rdf.LIT, "http://ex.org/custom", "", None)
    }
    def subj() = if (rnd.nextBoolean()) iri() else bnode()
    def obj() = rnd.nextInt(3) match {
      case 0 => iri(); case 1 => bnode(); case _ => literal()
    }
    val stmts = (1 to 150).map(_ => Turtle.Stmt(subj(), iri(), obj()))
    assert(RdfXml.parseDoc(RdfXml.emit(stmts)) == stmts,
      "rdf/xml emit → parse is the identity")
    val quads = stmts.map { st =>
      (Seq("", "g:one", "http://graph.version.2")(rnd.nextInt(3)), st)
    }
    assert(JsonLd.parseDoc(JsonLd.emit(quads)).toSet == quads.toSet,
      "json-ld emit → parse preserves the quad set incl. named graphs")
  }

  test("spark readers: .rdf and .jsonld via Rio.readAuto") {
    val dir = Files.createTempDirectory("graft_riofmt")
    val xml = dir.resolve("data.rdf")
    Files.write(xml, """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/">
      |  <rdf:Description rdf:about="http://ex.org/a"><ex:p>from-xml</ex:p></rdf:Description>
      |</rdf:RDF>""".stripMargin.getBytes(UTF_8))
    val jl = dir.resolve("data.jsonld")
    Files.write(jl, """{"@id": "http://ex.org/b",
      |  "http://ex.org/p": "from-jsonld",
      |  "@graph": [{"@id": "http://ex.org/c", "http://ex.org/p": "in-named"}]
      |}""".stripMargin.getBytes(UTF_8))
    try {
      val df = Rio.readAuto(spark,
        Seq(xml.toString, jl.toString), "g:default")
      val rows = df.select("g", "s.lex", "p.lex", "o.lex")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSet
      assert(rows.contains(("g:default", "http://ex.org/a", "from-xml")))
      assert(rows.contains(("g:default", "http://ex.org/b", "from-jsonld")))
      assert(rows.contains(("http://ex.org/b", "http://ex.org/c", "in-named")),
        "@graph under a labelled node lands in that named graph")
    } finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}

package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.rdf.Rdf
import graft.rio.{NQuads, Turtle}

/** N-Triples / N-Quads / TriG format tests (the RDF4J Rio surface the
  * reference accepts beyond Turtle, `GraphDBSystemAdapter.java:286`):
  * parse, emit round-trip, Spark readers, and cross-format agreement
  * with the Turtle parser.
  */
class RioFormatsSpec extends GraftSuite {

  test("n-triples: IRIs, bnodes, typed and lang literals") {
    val doc = """
      |<http://ex.org/a> <http://ex.org/name> "Alice" .
      |# comment line
      |<http://ex.org/a> <http://ex.org/knows> _:b1 .
      |_:b1 <http://ex.org/name> "Bob"@en .
      |_:b1 <http://ex.org/age> "30"^^<xsd:integer> .
      |_:b1 <http://ex.org/score> "4.5"^^<xsd:decimal> .
      |""".stripMargin
    val quads = NQuads.parseDoc(doc, "f:")
    assert(quads.length == 5)
    assert(quads.forall(_._1 == "")) // all default graph
    val age = quads.collect {
      case (_, st) if st.p.lex == "http://ex.org/age" => st.o
    }.head
    assert(age.lex == "30" && age.dt == Rdf.XsdInteger && age.num.contains(30.0))
    val score = quads.collect {
      case (_, st) if st.p.lex == "http://ex.org/score" => st.o
    }.head
    assert(score.lex == "4.500000" && score.num.contains(4.5))
    assert(quads.exists { case (_, st) =>
      st.o.lang == "en" && st.s.kind == Rdf.BNODE && st.s.lex == "f:b1" })
  }

  test("n-quads: graph labels and emit round-trip") {
    val doc = """
      |<http://ex.org/a> <http://ex.org/p> "v" <http://graph.version.1> .
      |<http://ex.org/a> <http://ex.org/p> "w" .
      |_:b <http://ex.org/p> <http://ex.org/o> <http://graph.version.2> .
      |""".stripMargin
    val quads = NQuads.parseDoc(doc)
    assert(quads.map(_._1) == Seq("http://graph.version.1", "", "http://graph.version.2"))
    val emitted = NQuads.emit(quads)
    assert(NQuads.parseDoc(emitted) == quads)
  }

  test("n-quads: escapes survive the emit/parse round-trip") {
    val tricky = Turtle.Term("line1\nline2\t\"q\"\\end", Rdf.LIT, "", "", None)
    val quad = ("g:x", Turtle.Stmt(
      Turtle.Term("http://ex.org/s", Rdf.IRI, "", "", None),
      Turtle.Term("http://ex.org/p", Rdf.IRI, "", "", None), tricky))
    val back = NQuads.parseDoc(NQuads.emit(Seq(quad)))
    assert(back.head._2.o.lex == tricky.lex)
    assert(back.head._1 == "g:x")
  }

  test("trig: GRAPH blocks, label shorthand, default block, prefixes") {
    val doc = """
      |@prefix ex: <http://ex.org/> .
      |ex:outer ex:p "default" .
      |GRAPH ex:g1 { ex:a ex:name "Alice" ; ex:age 30 . ex:b a ex:Person . }
      |ex:g2 { ex:c ex:name "Carol" }
      |{ ex:d ex:p ex:e . }
      |""".stripMargin
    val quads = Turtle.parseTriG(doc, "f:")
    def inGraph(g: String) = quads.filter(_._1 == g).map(_._2)
    assert(inGraph("").exists(st => st.s.lex == "http://ex.org/outer"))
    assert(inGraph("").exists(st => st.s.lex == "http://ex.org/d"))
    assert(inGraph("http://ex.org/g1").length == 3)
    assert(inGraph("http://ex.org/g1").exists(st =>
      st.p.lex == "http://ex.org/age" && st.o.lex == "30"))
    assert(inGraph("http://ex.org/g2").map(_.o.lex) == Seq("Carol"))
  }

  test("trig: bnode property lists and collections inside blocks") {
    val doc = """
      |@prefix ex: <http://ex.org/> .
      |GRAPH ex:g {
      |  ex:a ex:knows [ ex:name "Anon" ] .
      |  ex:a ex:list (1 2) .
      |}
      |""".stripMargin
    val quads = Turtle.parseTriG(doc, "f:")
    assert(quads.forall(_._1 == "http://ex.org/g")) // embedded stmts inherit the block graph
    assert(quads.exists(_._2.o.lex == "Anon"))
    assert(quads.count(_._2.p.lex == "rdf:first") == 2)
  }

  test("turtle and n-triples parsers agree on shared content") {
    val ttl = """
      |@prefix ex: <http://ex.org/> .
      |ex:a ex:name "Alice" ; ex:age 30 .
      |""".stripMargin
    val nt = """
      |<http://ex.org/a> <http://ex.org/name> "Alice" .
      |<http://ex.org/a> <http://ex.org/age> "30"^^<xsd:integer> .
      |""".stripMargin
    val a = Turtle.parseDoc(ttl, "x:").toSet
    val b = NQuads.parseDoc(nt, "x:").map(_._2).toSet
    assert(a == b)
  }

  test("generated statements round-trip through n-quads and trig") {
    // deterministic pseudo-random statement corpus over every term
    // shape: IRIs, salted bnodes, plain/lang/typed/numeric literals,
    // gnarly characters in literals, several graphs
    val rnd = new scala.util.Random(42)
    def iri() = Turtle.Term(s"http://ex.org/r${rnd.nextInt(50)}", Rdf.IRI, "", "", None)
    def bnode() = Turtle.Term(s"f1:-a${rnd.nextInt(20)}", Rdf.BNODE, "", "", None)
    def literal() = rnd.nextInt(5) match {
      case 0 => Turtle.Term("plain " + "\"quote\\back\n\ttab" * (1 + rnd.nextInt(2)),
        Rdf.LIT, Rdf.XsdString, "", None)
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
    val quads = (1 to 200).map { _ =>
      val g = Seq("", "g:one", "http://graph.version.2")(rnd.nextInt(3))
      (g, Turtle.Stmt(subj(), iri(), obj()))
    }
    assert(NQuads.parseDoc(NQuads.emit(quads)) == quads)
    assert(Turtle.parseTriG(NQuads.emitTriG(quads)).toSet == quads.toSet)
  }

  test("spark readers: n-quads line source and trig file source") {
    val dir = Files.createTempDirectory("rio").toFile
    val nq = new java.io.File(dir, "d.nq")
    Files.write(nq.toPath,
      ("<http://ex.org/a> <http://ex.org/p> \"1\"^^<xsd:integer> <g:one> .\n" +
        "<http://ex.org/a> <http://ex.org/p> \"x\" .\n" +
        "_:n <http://ex.org/p> \"y\" <g:one> .\n").getBytes(UTF_8))
    val nqDf = NQuads.read(spark, Seq(nq.getAbsolutePath), "g:default")
    val byG = nqDf.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("g:one" -> 2L, "g:default" -> 1L))
    assert(nqDf.filter(org.apache.spark.sql.functions.col("o")("lex") === "1")
      .select("o.dt").collect().head.getString(0) == Rdf.XsdInteger)

    val trig = new java.io.File(dir, "d.trig")
    Files.write(trig.toPath,
      ("@prefix ex: <http://ex.org/> .\n" +
        "ex:s ex:p ex:o .\n" +
        "GRAPH ex:g1 { ex:a ex:p \"v\" . }\n").getBytes(UTF_8))
    val tgDf = Turtle.readTriG(spark, Seq(trig.getAbsolutePath), "g:default")
    val tgByG = tgDf.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tgByG == Map("g:default" -> 1L, "http://ex.org/g1" -> 1L))
  }

  test("distributed N-Quads export round-trips through the reader") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("rio-export").toFile
    // a battery of the tricky shapes: bnodes (label round-trip through
    // the salt/encode codec), lang tags, typed literals, escapes
    val ttl = new java.io.File(dir, "battery.ttl")
    Files.write(ttl.toPath,
      ("@prefix ex: <http://ex.org/> .\n" +
        "ex:a ex:name \"caf\\u00E9 \\\"q\\\" b\\\\s\\nnl\"@en .\n" +
        "ex:a ex:n 42 .\n" +
        "_:b1 ex:p ex:a .\n" +
        "_:b1 ex:q \"plain\" .\n").getBytes(UTF_8))
    val orig = Turtle.read(spark, Seq(ttl.getAbsolutePath), "g:one")
    val out = new java.io.File(dir, "export").getAbsolutePath
    NQuads.write(orig, out)
    val back = NQuads.read(spark, Seq(out), "g:default")
    // bnode labels are FILE-scoped (RDF 1.1 N-Quads §3): the reader
    // salts them per source unit, so round-trip equality holds up to
    // bnode RENAMING — normalize to the label's local part
    def key(df: org.apache.spark.sql.DataFrame) = df.select(
      col("g"),
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.split(col("s")("lex"), ":"), -1),
      col("s")("kind"),
      col("p")("lex"), col("o")("lex"), col("o")("kind"),
      col("o")("dt"), col("o")("lang"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(key(back) == key(orig) && orig.count() == 4)

    // and the store facade: export → reload under a fresh store =
    // identical snapshot
    val g = Graft.open(spark, new java.io.File(dir, "store").getAbsolutePath)
    g.update("""INSERT DATA { GRAPH <g:x> { <s:1> <p:v> "a" . } }""")
    g.exportNQuads(new java.io.File(dir, "dump").getAbsolutePath)
    val re = NQuads.read(spark,
      Seq(new java.io.File(dir, "dump").getAbsolutePath), "g:default")
    assert(re.count() == 1 &&
      re.select("g").head.getString(0) == "g:x")
  }

  test("bnode GRAPH labels export as bnodes, not salt-bearing IRIs") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("rio-bnodeg").toFile
    val nq = new java.io.File(dir, "in.nq")
    Files.write(nq.toPath,
      "<s:1> <p:v> \"a\" _:gb .\n<s:2> <p:v> \"b\" <g:iri> .\n"
        .getBytes(UTF_8))
    val orig = NQuads.read(spark, Seq(nq.getAbsolutePath), "g:default")
    // in-store the bnode graph is the salted label (16 hex + ':')
    val gs = orig.select("g").collect().map(_.getString(0)).sorted
    assert(gs.exists(_.matches("^[0-9a-f]{16}:gb$")) && gs.contains("g:iri"))

    // distributed export: the bnode graph line must say `_:…`, the IRI
    // graph line `<g:iri>` — never an IRI wrapping the internal salt
    val out = new java.io.File(dir, "export").getAbsolutePath
    NQuads.write(orig, out)
    val lines = spark.read.textFile(out).collect().toSeq
    assert(lines.exists(l => l.contains("\"a\" _:") && !l.contains("<g")))
    assert(lines.exists(_.endsWith("<g:iri> .")))
    // …and the re-read sees a bnode graph again (re-salted per file)
    val back = NQuads.read(spark, Seq(out), "g:default")
    val gs2 = back.select("g").collect().map(_.getString(0))
    assert(gs2.exists(_.matches("^[0-9a-f]{16}:[0-9a-f]{16}:gb$")))

    // driver-side emitters agree with the distributed form
    val quads = orig.collect().map { r =>
      def t(i: Int) = Turtle.Term(r.getStruct(i).getString(0),
        r.getStruct(i).getInt(1), r.getStruct(i).getString(2),
        r.getStruct(i).getString(3), None)
      (r.getString(0), Turtle.Stmt(t(1), t(2), t(3)))
    }.toSeq
    val emitted = NQuads.emit(quads.filter(_._1 != "g:default")
      ++ quads.filter(_._1 == "g:default"))
    assert(!emitted.matches("(?s).*<[0-9a-f]{16}:.*"))
    val trig = NQuads.emitTriG(quads)
    assert(trig.contains("GRAPH _:") && !trig.matches("(?s).*GRAPH <[0-9a-f]{16}.*"))
  }

  test("UCHAR and ECHAR escapes decode in string literals") {
    // canonical N-Triples escapes every non-ASCII char as \uXXXX /
    // \U00XXXXXX — built by concatenation so Scala's own unicode
    // processing can't pre-decode the source text
    val bs = "\\"
    val doc = "ex:a ex:label \"caf" + bs + "u00E9 " + bs +
      "U0001F600 b" + bs + "fc" + bs + "'d\" ."
    val stmts = graft.rio.Turtle.parseDoc(doc)
    assert(stmts.head.o.lex ==
      "café " + new String(Character.toChars(0x1F600)) + " b\fc'd")
    // an escaped backslash followed by 'u' stays backslash + 'u'
    val doc2 = "ex:a ex:label \"x" + bs + bs + "u0041\" ."
    assert(graft.rio.Turtle.parseDoc(doc2).head.o.lex == "x" + bs + "u0041")
    // malformed hex degrades to the literal sequence instead of a crash
    val doc3 = "ex:a ex:label \"x" + bs + "uZZZZ\" ."
    assert(graft.rio.Turtle.parseDoc(doc3).head.o.lex == "x" + bs + "uZZZZ")
  }

  test("@base resolves relative IRI references") {
    val doc = """
      @base <http://ex.org/data/> .
      @prefix s: <schema/> .
      <item1> s:type <#v1> .
      <item1> </abs/p> <../up> .
      @base <sub/> .
      <item2> s:type <#v2> .
    """
    val stmts = graft.rio.Turtle.parseDoc(doc)
    val m = stmts.map(s => s.s.lex -> s).toMap
    assert(stmts.exists(s => s.s.lex == "http://ex.org/data/item1" &&
      s.p.lex == "http://ex.org/data/schema/type"))
    assert(stmts.exists(_.o.lex == "http://ex.org/data/#v1"))
    // RFC 3986 §5.2.4: `..` climbs out of the base directory
    assert(stmts.exists(s => s.p.lex == "http://ex.org/abs/p" &&
      s.o.lex == "http://ex.org/up"))
    // nested @base resolves against the outer one
    assert(m.contains("http://ex.org/data/sub/item2"))
    // absolute and harness-compact IRIs pass through untouched
    assert(graft.rdf.Rdf.resolveIri("ex:a", "http://b/") == "ex:a")
    assert(graft.rdf.Rdf.resolveIri("http://x/y", "http://b/") == "http://x/y")
    // §5.2.4 remove_dot_segments corner cases
    assert(graft.rdf.Rdf.resolveIri("../up", "http://ex.org/data/") ==
      "http://ex.org/up")
    assert(graft.rdf.Rdf.resolveIri("./here", "http://ex.org/data/") ==
      "http://ex.org/data/here")
    assert(graft.rdf.Rdf.resolveIri("a/./b/../c", "http://ex.org/d/") ==
      "http://ex.org/d/a/c")
    // above-root `..` segments drop (RFC: ignored)
    assert(graft.rdf.Rdf.resolveIri("../../../x", "http://ex.org/d/") ==
      "http://ex.org/x")
    // trailing dot segments keep the directory slash
    assert(graft.rdf.Rdf.resolveIri("a/b/..", "http://ex.org/") ==
      "http://ex.org/a/")
    assert(graft.rdf.Rdf.resolveIri("a/.", "http://ex.org/") ==
      "http://ex.org/a/")
    // query/fragment survive path normalization
    assert(graft.rdf.Rdf.resolveIri("../up?q=1#f", "http://ex.org/data/") ==
      "http://ex.org/up?q=1#f")
  }

  test("long and single-quoted string literals, dot-decimals") {
    val q3 = "\"\"\""
    // multi-line long string with an embedded quote and two quotes
    val doc = "ex:a ex:abstract " + q3 + "line one\nline \"two\" and \"\"pair\n" + q3 +
      " ; ex:note 'single' ; ex:w '''tri'ple''' ; ex:frac .5 ."
    val stmts = graft.rio.Turtle.parseDoc(doc)
    val byP = stmts.map(s => s.p.lex -> s.o).toMap
    assert(byP("ex:abstract").lex == "line one\nline \"two\" and \"\"pair\n")
    assert(byP("ex:note").lex == "single")
    assert(byP("ex:w").lex == "tri'ple")
    assert(byP("ex:frac").lex == "0.500000" &&
      byP("ex:frac").num.contains(0.5))
  }

  test("distributed SELECT export: NDJSON/CSV lines match the streamed " +
      "writers and survive a 1e6-row round-trip") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def term(lex: org.apache.spark.sql.Column, kind: Int, dt: String = "", lang: String = "") =
      struct(lex.as("lex"), lit(kind).as("kind"),
        lit(dt).as("dt"), lit(lang).as("lang"))
    // small result with every binding shape: IRI, plain literal, typed
    // literal, lang literal, bnode, unbound, quote/comma-bearing lexs
    val small = Seq(
      (0L, false), (1L, true), (2L, false), (3L, true)
    ).toDF("i", "unbind").select(
      term(concat(lit("http://ex/s"), col("i")), graft.rdf.Rdf.IRI).as("s"),
      when(!col("unbind"), term(concat(lit("v,\"q\" "), col("i")),
        graft.rdf.Rdf.LIT,
        dt = "http://www.w3.org/2001/XMLSchema#integer")).as("v"),
      term(concat(lit("b"), col("i")), graft.rdf.Rdf.BNODE).as("b"),
      term(lit("hola"), graft.rdf.Rdf.LIT, lang = "es").as("l"))
    // NDJSON lines parse to the same objects the streamed writer emits
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    val streamed = om.readTree(graft.rio.SparqlJson.select(small))
    val lines = small
      .select(graft.rio.SparqlDistExport.jsonLineCol(small).as("line"))
      .collect().map(_.getString(0))
    val streamBindings = streamed.get("results").get("bindings")
    assert(streamBindings.size() == lines.length)
    val distSet = lines.map(om.readTree).toSet
    (0 until streamBindings.size()).foreach { i =>
      assert(distSet.contains(streamBindings.get(i)),
        s"streamed binding $i missing from distributed lines")
    }
    assert(graft.rio.SparqlDistExport.headJson(small.columns.toSeq) ==
      """{"head":{"vars":["s","v","b","l"]}}""")
    // CSV rows equal the streamed writer's (order-insensitive)
    val csvStream = graft.rio.SparqlCsvTsv.csv(small)
      .split("\r\n").drop(1).toSet
    val csvDist = small
      .select(graft.rio.SparqlDistExport.csvLineCol(small).as("line"))
      .collect().map(_.getString(0).stripSuffix("\r")).toSet
    assert(csvStream == csvDist, s"csv mismatch:\n$csvStream\nvs\n$csvDist")

    // 1e6-row partitioned export: map-only write, counts + spot values
    val big = spark.range(0, 1000000L).select(
      term(concat(lit("http://ex/o"), col("id")), graft.rdf.Rdf.IRI).as("s"),
      term(col("id").cast("string"), graft.rdf.Rdf.LIT,
        dt = "http://www.w3.org/2001/XMLSchema#integer").as("n"))
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    graft.rio.SparqlDistExport.writeJsonBindings(big, dir + "/json")
    val back = spark.read.text(dir + "/json")
    assert(back.count() == 1000000L)
    val parsed = spark.read.json(spark.read.text(dir + "/json").as[String])
      .selectExpr("s.type AS stype", "s.value AS sval",
        "n.datatype AS ndt", "n.value AS nval")
    assert(parsed.where(col("stype") === "uri"
      && col("sval") === "http://ex/o999999"
      && col("ndt") === "http://www.w3.org/2001/XMLSchema#integer"
      && col("nval") === "999999").count() == 1)
    assert(new java.io.File(dir + "/json/_head.json").exists())
    graft.rio.SparqlDistExport.writeCsvRows(big, dir + "/csv")
    assert(spark.read.text(dir + "/csv").count() == 1000000L)
    assert(new java.io.File(dir + "/csv/_header.csv").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}

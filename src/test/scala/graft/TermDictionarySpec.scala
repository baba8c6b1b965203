package graft

import org.apache.spark.sql.functions._

import graft.core.TermDictionary
import graft.rdf.TpchRdf

/** Dictionary-encoding round-trip + id-stability (SURVEY §1.5). */
class TermDictionarySpec extends GraftSuite {

  lazy val quads = TpchRdf.graphDf(spark, sf).cache()

  test("encode → decode round-trips the quad set") {
    val dict = TermDictionary.build(quads)
    val enc = TermDictionary.encode(quads)
    val dec = TermDictionary.decode(enc, dict)
    assert(dec.count() == quads.count())
    assert(dec.select(col("s")("lex"), col("p")("lex"), col("o")("lex"))
      .except(quads.select(col("s")("lex"), col("p")("lex"), col("o")("lex")))
      .isEmpty)
  }

  test("ids are stable across independent builds (content-derived)") {
    val ids1 = TermDictionary.encode(quads).select("s_id").distinct()
    val ids2 = TermDictionary.encode(quads.repartition(7)).select("s_id").distinct()
    assert(ids1.except(ids2).isEmpty && ids2.except(ids1).isEmpty)
  }

  test("identity-sharing structs resolve to one representative, no false collision") {
    import spark.implicits._
    import graft.rdf.Rdf
    // a plain and a lang-tagged literal with one lexical form are ONE
    // term identity (lex, kind) — build() must not see a collision and
    // must resolve the id to a single deterministic representative
    val q = Seq(
      ("g", "ex:a", "ex:p", "hallo", ""),
      ("g", "ex:b", "ex:q", "hallo", "de"))
      .toDF("g", "sl", "pl", "ol", "olang").select(col("g"),
        Rdf.iri(col("sl")).as("s"), Rdf.iri(col("pl")).as("p"),
        Rdf.term(col("ol"), lit(Rdf.LIT), lit(Rdf.XsdString), col("olang"),
          lit(null).cast("double")).as("o"))
    val dict = TermDictionary.build(q)
    val hallo = dict.filter(col("term")("lex") === "hallo").collect()
    assert(hallo.length == 1)
    // struct-least representative: "" lang sorts before "de"
    assert(hallo(0).getStruct(1).getString(3) == "")
  }

  test("driver-side litTermId equals the column-form term id") {
    // the compiler turns pattern constants into literal longs via
    // litTermId; they must land on exactly the ids encode() wrote
    val got = quads.select(
        TermDictionary.termId(col("p")).as("col_id"), col("p")("lex").as("lex"))
      .distinct().collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(0) == TermDictionary.litTermId(r.getString(1), graft.rdf.Rdf.IRI),
        s"id mismatch for predicate ${r.getString(1)}")
    }
  }

  test("auditUnion catches cross-segment collisions the local checks miss") {
    import spark.implicits._
    import graft.rdf.Rdf
    def dictOf(lex: String, id: Long) = Seq((id, lex))
      .toDF("id", "lexv").select(col("id"), Rdf.iri(col("lexv")).as("term"))
    // two segment dictionaries whose terms never co-occurred: each is
    // locally collision-free, but they map DIFFERENT identities to one
    // forged id — exactly the case only the global audit can see
    val collided = dictOf("ex:a", 7L).unionByName(dictOf("ex:b", 7L))
    val e = intercept[IllegalArgumentException] {
      TermDictionary.auditUnion(collided)
    }
    assert(e.getMessage.contains("collision"))
    // disjoint ids pass; the SAME term appearing in both segments
    // (duplicate (id, identity) row) is not a collision either
    TermDictionary.auditUnion(dictOf("ex:a", 1L).unionByName(dictOf("ex:b", 2L)))
    TermDictionary.auditUnion(dictOf("ex:a", 1L).unionByName(dictOf("ex:a", 1L)))
  }

  test("encoded joins equal lexical joins") {
    // customers' nations via id-join must match the lexical join
    val enc = TermDictionary.encode(quads).cache()
    val nat = enc.filter(col("p_id") === TermDictionary.termId(
      graft.rdf.Rdf.iri(lit(":nation"))))
    val reg = enc.filter(col("p_id") === TermDictionary.termId(
      graft.rdf.Rdf.iri(lit(":region"))))
    val idJoin = nat.as("n").join(reg.as("r"),
      col("n.o_id") === col("r.s_id")).count()
    val lexJoin = quads.filter(col("p")("lex") === ":nation").as("a")
      .join(quads.filter(col("p")("lex") === ":region").as("b"),
        col("a.o.lex") === col("b.s.lex")).count()
    assert(idJoin == lexJoin && idJoin > 0)
  }
}

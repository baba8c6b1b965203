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

package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics checks for the registry queries at sf0.001.
  * Full hash-equality vs DuckDB is checked by tools/selfcheck.py; here
  * we assert structural invariants cheap enough for every `sbt test`.
  */
class QueriesSpec extends GraftSuite {

  test("every query runs and has stable schema") {
    Queries.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.count() // forces execution
    }
  }

  test("every oracle name matches a query name") {
    val qnames = Queries.queries.keySet
    assert(Queries.oracleSql.keySet.subsetOf(qnames))
  }

  test("q1_agg groups are the 6 TPC-H flag/status combos") {
    val rows = Queries.queries("q1_agg")(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 9)
  }

  test("exact dedup keeps the minimum doc_id per text") {
    val df = Queries.queries("d_exact_groups")(spark, sf)
    val total = df.agg(sum("n_dups")).head.getLong(0)
    val docs = graft.core.Tables(spark, sf, "documents").count()
    assert(total == docs, "dup group sizes must partition the corpus")
  }

  test("minhash LSH finds the planted near-duplicates at sf0.001") {
    val pairs = Queries.queries("d_minhash_lsh")(spark, sf).collect()
    // every reported pair must truly have shingle-jaccard >= 0.5
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("brute-force topk returns k neighbours per query, ranked") {
    val df = Queries.queries("s_bruteforce_topk")(spark, sf)
    val byQuery = df.groupBy("query_id").count().collect()
    byQuery.foreach(r => assert(r.getLong(1) == 5))
    val ranks = df.select("rank").distinct().collect().map(_.getInt(0)).sorted
    assert(ranks.sameElements(1 to 5))
  }

  test("simhash of identical texts is identical") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val fp = docs.select(col("text"), graft.ext.Dedup.simHash(col("text")).as("sh"))
      .groupBy("text").agg(countDistinct("sh").as("n"))
      .agg(max("n")).head.getLong(0)
    assert(fp == 1L)
  }
}

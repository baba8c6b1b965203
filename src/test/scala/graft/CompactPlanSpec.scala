package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.QuadStore
import graft.rdf.TpchRdf

/** The store-layout scale contract (SURVEY §2.A A8): after
  * `QuadStore.compact()` the snapshot is parquet partitioned by graph
  * and sorted by `(p.lex, s.lex)` within files, so a `GRAPH <g>` +
  * constant-predicate query must show partition pruning AND a nested
  * pushed filter on `p.lex` in its scan — the directory-pruning +
  * row-group-min/max analogue of the reference's context and POS
  * indexes (`repo-config.ttl:29,31`).
  */
class CompactPlanSpec extends GraftSuite {

  test("compacted snapshot prunes partitions on g and pushes p.lex") {
    val dir = Files.createTempDirectory("graft-compact-spec").toString
    val store = new QuadStore(spark, dir)
    store.append(TpchRdf.graphDf(spark, sf), "fixture")
    store.compact()

    val snap = store.snapshot()
      .filter(col("g") === "g:orders" && col("p")("lex") === ":orderdate")
    val scan = snap.queryExecution.executedPlan.toString()

    // partition pruning: the g predicate must land in PartitionFilters
    // (directory-level), not in the data filter
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters", "").contains("g:orders"),
      s"no partition filter on g in scan:\n$scan")
    // nested pushdown: the constant predicate must reach the parquet
    // reader as a pushed filter on the p.lex leaf
    assert(scan.contains("PushedFilters") &&
      scan.replaceAll("(?s).*PushedFilters", "").takeWhile(_ != ']')
        .contains("p.lex"),
      s"p.lex not pushed to the parquet scan:\n$scan")

    // and the compacted snapshot is still the same relation
    val n = snap.count()
    val expect = TpchRdf.graphDf(spark, sf)
      .filter(col("g") === "g:orders" && col("p")("lex") === ":orderdate")
      .count()
    assert(n == expect && n > 0)
  }
}

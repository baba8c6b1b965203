package graft.infer

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed sameAs equivalence classes — the 100 TB path of
  * OWL-Horst's eq-* rules (SURVEY §2.C "hard parts"). The driver-side
  * union-find in [[OwlHorst]] is right for alias-scale sameAs (a few
  * thousand pairs); entity-resolution-scale sameAs (millions of links)
  * must never be resident on the driver. Here classes are discovered
  * with GraphX connected components over 64-bit term-hash vertex ids
  * (the [[graft.core.TermDictionary]] id scheme: content-derived, no
  * allocator) and the expansion pair table stays a DataFrame end to
  * end.
  *
  * Reference behavior: GraphDB's sameAs optimization groups equivalent
  * IRIs behind a single id and expands at query time
  * (`repo-config.ttl:45` `owlim:disable-sameAs "false"`); the
  * materialized cross-pair expansion below reproduces the same visible
  * statements.
  */
object SameAs {

  /** `(member, cc)` — every term appearing in a sameAs statement with
    * its connected-component id (GraphX convention: min vertex id in
    * the component, deterministic).
    */
  def classes(spark: SparkSession, triples: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = triples.filter(col("p")("lex") === "owl:sameAs")
      .select(col("s")("lex").as("a"), col("o")("lex").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val members = pairs.select(col("a").as("member"))
      .unionByName(pairs.select(col("b").as("member"))).distinct()
      .select(xxhash64(col("member")).as("id"), col("member"))
    // id = content hash is the vertex IDENTITY: a collision would merge
    // unrelated equivalence classes, so fail loudly instead (same
    // discipline as TermDictionary.build)
    val nMembers = members.count()
    val nIds = members.select("id").distinct().count()
    require(nMembers == nIds,
      s"sameAs term-hash collision: $nMembers members, $nIds ids — widen the id")
    val edges = pairs
      .select(xxhash64(col("a")).as("src"), xxhash64(col("b")).as("dst"))
      .as[(Long, Long)].rdd.map { case (s, d) => Edge(s, d, 1) }
    val cc = Graph.fromEdges(edges, 0).connectedComponents().vertices
    members.join(cc.toDF("id", "cc"), "id").select(col("member"), col("cc"))
  }

  /** Ordered `(from, to)` cross pairs within each class (`from ≠ to`)
    * — the eq-rep expansion table, never resident on the driver. Class
    * sizes bound the within-class self-join; degenerate giant classes
    * are an input-data smell (everything equals everything) rather
    * than an engine limit.
    */
  def crossPairs(spark: SparkSession, triples: DataFrame): DataFrame = {
    val m = classes(spark, triples)
    val l = m.select(col("cc"), col("member").as("from"))
    val r = m.select(col("cc"), col("member").as("to"))
    l.join(r, "cc").filter(col("from") =!= col("to")).select("from", "to")
  }
}

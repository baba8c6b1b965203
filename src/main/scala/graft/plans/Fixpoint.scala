package graft.plans

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Driver-side iterative fixpoints over DataFrames — the one thing
  * Catalyst cannot express (no recursion; SURVEY §4.2). Used by
  * property paths (`p+`/`p*`), OWL-Horst materialization, and the
  * graph-analytics operators.
  *
  * Discipline at scale (SURVEY §2.C "hard parts"):
  *  - semi-naive: each round joins only the NEW pairs (delta) against
  *    the base relation, never the whole accumulator;
  *  - the accumulator lives as cached RDD deltas sharing ONE
  *    `HashPartitioner`: the novelty check is `subtractByKey` against
  *    their partitioner-aware union, and both operations are NARROW
  *    when co-partitioned — a round shuffles O(|candidate|) records,
  *    never the accumulated closure. (A DataFrame `except(acc)`
  *    re-shuffles the whole closure every round — O(diameter ×
  *    |closure|) shuffle volume — and checkpointed-leaf partitioning
  *    is not reusable by Catalyst, so this is the one place the
  *    engine drops to the RDD API: partitioner-preserving union and
  *    set-difference are per-partition logic Catalyst cannot see.)
  *  - per-delta caching truncates recompute lineage (the union DAG is
  *    narrow over cached leaves), bounding rounds by graph diameter,
  *    not path count. FixpointSpec asserts the shuffle-records budget.
  */
object Fixpoint {

  /** Transitive closure of a binary relation with columns (a, b).
    * Equality on pairs uses whole-row semantics (external `Row`
    * equality is structural), so strings, numerics, and nested term
    * STRUCTS all work — but NOT binary columns: `Row.equals` compares
    * `Array[Byte]` by content while `Row.hashCode` hashes the array by
    * identity, so the HashPartitioner would scatter equal keys and
    * `subtractByKey` would miss duplicates (normalize binary to base64
    * first). `groupCols` closes each group independently (e.g. per
    * named graph) in one shared fixpoint whose rounds are bounded by
    * the max diameter across groups.
    */
  def closure(edges0: DataFrame, joinCond: (DataFrame, DataFrame) => Column,
      maxRounds: Int = 64, groupCols: Seq[String] = Nil): DataFrame = {
    val spark = edges0.sparkSession
    val sc = spark.sparkContext
    val parts = spark.sessionState.conf.numShufflePartitions
    val part = new HashPartitioner(parts)
    // normalize column order to (groupCols, a, b): candidate rows are
    // built in that order and Row-level set ops are positional
    val edges = edges0
      .select((groupCols.map(col) :+ col("a") :+ col("b")): _*)
      .distinct().localCheckpoint()
    val schema = edges.schema
    def keyed(df: DataFrame): RDD[(Row, Unit)] =
      df.rdd.map(r => (r, ())).partitionBy(part)

    var deltas = List(
      keyed(edges).persist(StorageLevel.MEMORY_AND_DISK))
    deltas.head.count()
    var frontier = edges
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val step = groupCols.foldLeft(
          edges.withColumnRenamed("a", "m").withColumnRenamed("b", "b2")) {
        (d, g) => d.withColumnRenamed(g, s"__$g")
      }
      val cond = (joinCond(frontier, step) +:
        groupCols.map(g => frontier(g) === step(s"__$g"))).reduce(_ && _)
      val cand = frontier.join(step, cond)
        .select((groupCols.map(g => frontier(g).as(g)) :+
          frontier("a").as("a") :+ col("b2").as("b")): _*)
        .distinct()
      // novelty: narrow set-difference against the partitioner-aware
      // union of all cached deltas — count() materializes the cache in
      // one pass and doubles as the emptiness test
      val next = keyed(cand).subtractByKey(sc.union(deltas))
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (next.count() == 0) { done = true; next.unpersist(blocking = false) }
      else {
        deltas = next :: deltas
        frontier = spark.createDataFrame(next.keys, schema)
      }
    }
    if (!done) System.err.println(
      s"[fixpoint] WARNING: closure stopped at the $maxRounds-round cap " +
        "before convergence — results may be incomplete")
    finish(spark.createDataFrame(sc.union(deltas).keys, schema), deltas)
  }

  /** Materialize the fixpoint result (localCheckpoint truncates the
    * lineage onto fresh blocks owned by the returned DataFrame), then
    * release every per-round delta — otherwise each closure/BFS call
    * leaks `diameter` cached RDDs for the session lifetime, exactly
    * the heap/disk creep that destabilizes long benchmark runs. The
    * checkpointed blocks themselves are reclaimed by the
    * ContextCleaner once the caller drops the DataFrame.
    */
  private def finish(result: DataFrame, deltas: List[RDD[(Row, Unit)]]): DataFrame = {
    val out = result.localCheckpoint(true)
    deltas.foreach(_.unpersist(blocking = false))
    out
  }

  /** Closure for term-struct pairs (join on lex+kind identity). */
  def closureTerms(edges: DataFrame): DataFrame =
    closure(edges, (f, s) =>
      f("b")("lex") === s("m")("lex") && f("b")("kind") === s("m")("kind"))

  /** Closure of term-struct pairs `(g, a, b)` WITHIN each named graph
    * (the GRAPH ?var property-path case).
    */
  def closureTermsGrouped(edges: DataFrame): DataFrame =
    closure(edges, (f, s) =>
      f("b")("lex") === s("m")("lex") && f("b")("kind") === s("m")("kind"),
      groupCols = Seq("g"))

  /** Closure of 8-byte term-id pairs `(a, b)` — the encoded-plane
    * variant: every fixpoint round shuffles 16-byte rows instead of
    * lexical term structs (SURVEY §1.5/§7 hard-part (5) applied to the
    * one iterative operator, where the multiplier is the round count).
    */
  def closureLongs(edges: DataFrame): DataFrame =
    closure(edges, (f, s) => f("b") === s("m"))

  /** Id-pair closure `(g, a, b)` within each named graph. */
  def closureLongsGrouped(edges: DataFrame): DataFrame =
    closure(edges, (f, s) => f("b") === s("m"), groupCols = Seq("g"))

  /** Node set reachable in ≥1 application of `step` from `n0` (a
    * single-column "n" DataFrame). The seeded counterpart of
    * [[closure]]: when a path endpoint is bound, BFS from it touches
    * only the reachable subgraph instead of closing the whole edge
    * relation — the difference between O(reachable) and O(graph) work
    * at store scale. Same discipline: distinct frontier, narrow
    * subtract against co-partitioned visited deltas.
    */
  def reachNodes(n0: DataFrame, step: DataFrame => DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val spark = n0.sparkSession
    val sc = spark.sparkContext
    val parts = spark.sessionState.conf.numShufflePartitions
    val part = new HashPartitioner(parts)
    var frontier = n0.distinct().localCheckpoint()
    val schema = frontier.schema
    def keyed(df: DataFrame): RDD[(Row, Unit)] =
      df.rdd.map(r => (r, ())).partitionBy(part)

    var deltas: List[RDD[(Row, Unit)]] = Nil
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val s = step(frontier).distinct()
      val sk = keyed(s)
      val next = (if (deltas.isEmpty) sk else sk.subtractByKey(sc.union(deltas)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (next.count() == 0) { done = true; next.unpersist(blocking = false) }
      else {
        deltas = next :: deltas
        frontier = spark.createDataFrame(next.keys, schema)
      }
    }
    if (!done) System.err.println(
      s"[fixpoint] WARNING: reachability stopped at the $maxRounds-round cap " +
        "before convergence — results may be incomplete")
    if (deltas.isEmpty) n0.limit(0)
    else finish(spark.createDataFrame(sc.union(deltas).keys, schema), deltas)
  }

  /** Closure for plain string pairs. */
  def closureStrings(edges: DataFrame): DataFrame =
    closure(edges, (f, s) => f("b") === s("m"))
}

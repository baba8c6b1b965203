package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-side iterative fixpoints over DataFrames — the one thing
  * Catalyst cannot express (no recursion; SURVEY §4.2). Used by
  * property paths (`p+`/`p*`), OWL-Horst materialization, and the
  * graph-analytics operators.
  *
  * Discipline at scale (SURVEY §2.C "hard parts"):
  *  - semi-naive: each round joins only the NEW pairs (delta) against
  *    the base relation, never the whole accumulator;
  *  - `localCheckpoint` per round truncates plan lineage, otherwise
  *    the logical plan doubles every iteration and the driver dies
  *    long before the executors do;
  *  - `distinct`/`except` keep the frontier minimal, bounding rounds
  *    by graph diameter, not path count.
  */
object Fixpoint {

  /** Transitive closure of a binary relation with columns (a, b).
    * Equality on pairs uses whole-row semantics (`except`), so any
    * column type — strings, term structs — works. `groupCols` closes
    * each group independently (e.g. per named graph) in one shared
    * fixpoint whose rounds are bounded by the max diameter across
    * groups.
    */
  def closure(edges0: DataFrame, joinCond: (DataFrame, DataFrame) => Column,
      maxRounds: Int = 64, groupCols: Seq[String] = Nil): DataFrame = {
    val edges = edges0.distinct().localCheckpoint()
    var acc = edges
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
      val next = frontier.join(step, cond)
        .select((groupCols.map(g => frontier(g).as(g)) :+
          frontier("a").as("a") :+ col("b2").as("b")): _*)
        .except(acc)
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        acc = acc.unionByName(next).localCheckpoint()
        frontier = next
      }
    }
    if (!done) System.err.println(
      s"[fixpoint] WARNING: closure stopped at the $maxRounds-round cap " +
        "before convergence — results may be incomplete")
    acc
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

  /** Node set reachable in ≥1 application of `step` from `n0` (a
    * single-column "n" DataFrame). The seeded counterpart of
    * [[closure]]: when a path endpoint is bound, BFS from it touches
    * only the reachable subgraph instead of closing the whole edge
    * relation — the difference between O(reachable) and O(graph) work
    * at store scale. Same semi-naive discipline: distinct frontier,
    * `except` against the accumulator, `localCheckpoint` per round.
    */
  def reachNodes(n0: DataFrame, step: DataFrame => DataFrame,
      maxRounds: Int = 64): DataFrame = {
    var frontier = n0.distinct().localCheckpoint()
    var acc: Option[DataFrame] = None
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val s = step(frontier).distinct()
      val next = acc.fold(s)(s.except(_)).localCheckpoint()
      if (next.isEmpty) done = true
      else {
        acc = Some(acc.fold(next)(_.unionByName(next)))
        frontier = next
      }
    }
    if (!done) System.err.println(
      s"[fixpoint] WARNING: reachability stopped at the $maxRounds-round cap " +
        "before convergence — results may be incomplete")
    acc.getOrElse(n0.limit(0))
  }

  /** Closure for plain string pairs. */
  def closureStrings(edges: DataFrame): DataFrame =
    closure(edges, (f, s) => f("b") === s("m"))
}

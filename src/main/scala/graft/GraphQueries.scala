package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.GraphOps
import Queries.Q

/** Graph-analytics registry entries (SURVEY §2.D): connected
  * components, fixed-iteration PageRank, BFS shortest hops — run over
  * a deterministic vertex-id scheme derived from the harness keys so
  * a DuckDB oracle can compute the same answers in closed form:
  *
  *   nation = n_nationkey · region = 1000+r_regionkey ·
  *   customer = 10000+c_custkey · supplier = 100000+s_suppkey
  *
  * The OPERATORS are generic (any (src,dst) edge list — at RDF scale,
  * dictionary-encoded terms); the test graph is the
  * customer/supplier→nation→region hierarchy, whose analytics have
  * exact relational mirrors.
  */
object GraphQueries {

  private def natRegEdges(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir, "nation")
    n.select(col("n_nationkey").cast("long").as("src"),
      (col("n_regionkey") + 1000).cast("long").as("dst"))
  }

  private def custNatEdges(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(
      (col("c_custkey") + 10000).cast("long").as("src"),
      col("c_nationkey").cast("long").as("dst"))

  private def supNatEdges(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "supplier").select(
      (col("s_suppkey") + 100000).cast("long").as("src"),
      col("s_nationkey").cast("long").as("dst"))

  // distinct (part, supplier) trade edges — the lineitem-derived graph
  // shared (r18) by g_kcore / g_hits / g_label_prop: the 600k-row scan
  // + distinct (→ ~|partsupp| edges) previously re-ran per gate per
  // rep; one checkpointed view per (session, dataset), released at the
  // g-family boundary (Bench.familyViews). The operators' own
  // distinct() over the already-distinct 80k-row view is a cheap
  // no-op-shaped exchange, so their generic contract is untouched.
  private def partSuppEdges(s: SparkSession, dir: String): DataFrame =
    graft.core.DfCache.df(s, dir, "g_edges_partsupp", persist = false) {
      Tables(s, dir, "lineitem").select(
        (col("l_partkey") + 1000000).cast("long").as("src"),
        (col("l_suppkey") + 100000).cast("long").as("dst"))
        .distinct().localCheckpoint()
    }

  val all: Seq[Q] = Seq(

    Q("g_components", (s, dir) =>
      GraphOps.connectedComponents(s, natRegEdges(s, dir)),
      Some("""
      WITH comp AS (SELECT n_regionkey, min(n_nationkey) AS c FROM nation GROUP BY 1)
      SELECT n_nationkey::BIGINT AS id, c::BIGINT AS component
      FROM nation JOIN comp USING (n_regionkey)
      UNION ALL
      SELECT (1000+r_regionkey)::BIGINT, c::BIGINT
      FROM region JOIN comp ON comp.n_regionkey=r_regionkey""")),

    Q("g_pagerank", (s, dir) =>
      GraphOps.pageRank(s,
        custNatEdges(s, dir).unionByName(natRegEdges(s, dir)), iters = 10),
      // GraphX staticPageRank semantics (verified empirically): classic
      // unnormalized iteration rank = 0.15 + 0.85·Σ(in/outdeg), then a
      // final normalization to make ranks sum to the vertex count. The
      // graph is a depth-2 DAG (cust → nation → region), so 10
      // iterations are fully converged and the closed form below is
      // exact up to float associativity (both sides round to 6).
      Some("""
      WITH nat AS (
        SELECT n_nationkey, n_regionkey,
               0.15 + 0.85*0.15*(SELECT count(*) FROM customer WHERE c_nationkey=n_nationkey) AS raw
        FROM nation),
      reg AS (
        SELECT r_regionkey,
               0.15 + 0.85*(SELECT sum(raw) FROM nat WHERE n_regionkey=r_regionkey) AS raw
        FROM region),
      allv AS (
        SELECT (10000+c_custkey)::BIGINT AS id, 0.15::DOUBLE AS raw FROM customer
        UNION ALL SELECT n_nationkey::BIGINT, raw FROM nat
        UNION ALL SELECT (1000+r_regionkey)::BIGINT, raw FROM reg)
      SELECT id, CAST(round(raw * (SELECT count(*) FROM allv) / (SELECT sum(raw) FROM allv) * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0 AS rank
      FROM allv""")),

    // personalized PageRank: restart mass on the BUILDING-segment
    // customers; on the depth-2 DAG (cust → nation → region) the
    // unnormalized contract has an exact closed form (cust = 0.15,
    // nation = 0.85·0.15·#seed-custs, region = 0.85·Σ nations), which
    // 10 iterations fully converge to; zero-rank vertices are dropped
    Q("g_ppr", (s, dir) => {
      val edges = custNatEdges(s, dir).unionByName(natRegEdges(s, dir))
      val seeds = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select((col("c_custkey") + 10000).cast("long").as("id"))
      GraphOps.personalizedPageRank(s, edges, seeds, iters = 10)
    },
      Some("""
      WITH seedc AS (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment='BUILDING'),
      nat AS (
        SELECT n_nationkey, n_regionkey,
               0.85*0.15*(SELECT count(*) FROM seedc WHERE c_nationkey=n_nationkey) AS raw
        FROM nation),
      reg AS (
        SELECT r_regionkey,
               0.85*(SELECT sum(raw) FROM nat WHERE n_regionkey=r_regionkey) AS raw
        FROM region),
      allv AS (
        SELECT (10000+c_custkey)::BIGINT AS id, 0.15::DOUBLE AS raw FROM seedc
        UNION ALL SELECT n_nationkey::BIGINT, raw FROM nat WHERE raw > 0
        UNION ALL SELECT (1000+r_regionkey)::BIGINT, raw FROM reg WHERE raw > 0)
      SELECT id, CAST(round(raw * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0 AS rank FROM allv""")),

    // harmonic centrality from the region landmarks (r13): each
    // region's component is its star of nations (d=1) and their
    // customers/suppliers (d=2), so the closed form is
    // n_nat·1000000 + (n_cust+n_supp)·500000 micro-units — integer
    // division keeps the quotients engine-exact (FLOAT_AUDIT rule)
    Q("g_harmonic_seeds", (s, dir) => {
      val edges = custNatEdges(s, dir)
        .unionByName(natRegEdges(s, dir))
        .unionByName(supNatEdges(s, dir))
      val seeds = Tables(s, dir, "region")
        .select((col("r_regionkey") + 1000).cast("long").as("id"))
      GraphOps.harmonicFromSeeds(s, edges, seeds)
    },
      Some("""
      SELECT (1000+r_regionkey)::BIGINT AS seed,
             (n_nat * 1000000 + (n_cust + n_supp) * 500000)::BIGINT AS h_micro,
             (n_nat + n_cust + n_supp)::BIGINT AS n_reached
      FROM (SELECT r_regionkey,
              (SELECT count(*) FROM nation
               WHERE n_regionkey = r_regionkey) AS n_nat,
              (SELECT count(*) FROM customer JOIN nation
                 ON c_nationkey = n_nationkey
               WHERE n_regionkey = r_regionkey) AS n_cust,
              (SELECT count(*) FROM supplier JOIN nation
                 ON s_nationkey = n_nationkey
               WHERE n_regionkey = r_regionkey) AS n_supp
            FROM region)""")),

    // closeness centrality from the region landmarks (r14): same
    // star components as g_harmonic_seeds — nations at d=1, their
    // customers/suppliers at d=2 — so sum_dist = n_nat + 2(n_cust +
    // n_supp) and closeness_micro = 1000000·n_reached div sum_dist
    // (integer division, engine-exact)
    Q("g_closeness_seeds", (s, dir) => {
      val edges = custNatEdges(s, dir)
        .unionByName(natRegEdges(s, dir))
        .unionByName(supNatEdges(s, dir))
      val seeds = Tables(s, dir, "region")
        .select((col("r_regionkey") + 1000).cast("long").as("id"))
      GraphOps.closenessFromSeeds(s, edges, seeds)
    },
      Some("""
      SELECT (1000+r_regionkey)::BIGINT AS seed,
             (n_nat + 2*(n_cust + n_supp))::BIGINT AS sum_dist,
             (n_nat + n_cust + n_supp)::BIGINT AS n_reached,
             ((1000000 * (n_nat + n_cust + n_supp))
                // (n_nat + 2*(n_cust + n_supp)))::BIGINT AS closeness_micro
      FROM (SELECT r_regionkey,
              (SELECT count(*) FROM nation
               WHERE n_regionkey = r_regionkey) AS n_nat,
              (SELECT count(*) FROM customer JOIN nation
                 ON c_nationkey = n_nationkey
               WHERE n_regionkey = r_regionkey) AS n_cust,
              (SELECT count(*) FROM supplier JOIN nation
                 ON s_nationkey = n_nationkey
               WHERE n_regionkey = r_regionkey) AS n_supp
            FROM region)""")),

    // seeded Brandes betweenness, truncated at depth 2 (r15): every
    // third customer gains a TWIN-nation edge ((c_nationkey+1) mod
    // 25), so σ(c) = 2 whenever both its nations share a region and
    // the backward pass exercises real integer divisions (1e6 div
    // σ). Closed form: nation n's dependency = Σ over adjacent
    // customers 1e6 div σ_c(region(n)) + 1e6·(suppliers in n); the
    // customers/suppliers are depth-2 leaves (δ = 0) and deeper
    // levels are truncated by contract
    Q("g_betweenness_seeds", (s, dir) => {
      val twin = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 3 === 0)
        .select((col("c_custkey") + 10000).cast("long").as("src"),
          ((col("c_nationkey") + 1) % 25).cast("long").as("dst"))
      val edges = custNatEdges(s, dir).unionByName(twin)
        .unionByName(natRegEdges(s, dir)).unionByName(supNatEdges(s, dir))
      val seeds = Tables(s, dir, "region")
        .select((col("r_regionkey") + 1000).cast("long").as("id"))
      GraphOps.betweennessFromSeeds(s, edges, seeds, maxDepth = 2)
    },
      Some("""
      WITH ce AS (
        SELECT c_custkey AS ck, c_nationkey AS nk FROM customer
        UNION ALL
        SELECT c_custkey, (c_nationkey + 1) % 25 FROM customer
        WHERE c_custkey % 3 = 0),
      cn AS MATERIALIZED (
        SELECT ce.ck, ce.nk, n.n_regionkey AS rk
        FROM ce JOIN nation n ON n.n_nationkey = ce.nk),
      sig AS MATERIALIZED (
        SELECT ck, rk, count(*)::BIGINT AS sigma FROM cn GROUP BY 1, 2),
      custc AS (
        SELECT cn.nk AS id, sum(1000000 // s.sigma)::BIGINT AS bc
        FROM cn JOIN sig s ON s.ck = cn.ck AND s.rk = cn.rk
        GROUP BY 1),
      supc AS (
        SELECT s_nationkey AS id, count(*)::BIGINT * 1000000 AS bc
        FROM supplier GROUP BY 1)
      SELECT id::BIGINT AS id, sum(bc)::BIGINT AS bc_micro
      FROM (SELECT * FROM custc UNION ALL SELECT * FROM supc)
      GROUP BY 1 HAVING sum(bc) > 0""")),

    // diameter lower bound via the classic double sweep (r14): BFS
    // from the min-id vertex, re-BFS from the min-id farthest vertex
    // — the oracle replays BOTH sweeps as unrolled level-by-level
    // BFS CTEs (4 levels: the cust/supp–nation–region hierarchy has
    // diameter ≤ 4), every level AS MATERIALIZED per the k-core
    // lesson
    Q("g_diameter_sweep", (s, dir) => {
      val edges = custNatEdges(s, dir)
        .unionByName(natRegEdges(s, dir))
        .unionByName(supNatEdges(s, dir))
      GraphOps.diameterSweep(s, edges)
    },
      Some("""
      WITH e AS MATERIALIZED (
        SELECT (10000+c_custkey)::BIGINT AS s, c_nationkey::BIGINT AS d
        FROM customer
        UNION ALL
        SELECT n_nationkey::BIGINT, (1000+n_regionkey)::BIGINT FROM nation
        UNION ALL
        SELECT (100000+s_suppkey)::BIGINT, s_nationkey::BIGINT FROM supplier),
      und AS MATERIALIZED (SELECT s, d FROM e UNION SELECT d, s FROM e),
      s1 AS MATERIALIZED (SELECT min(s) AS id FROM und),
      a0 AS MATERIALIZED (SELECT id FROM s1),
      a1 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN a0 ON und.s = a0.id
        WHERE d NOT IN (SELECT id FROM a0)),
      a2 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN a1 ON und.s = a1.id
        WHERE d NOT IN (SELECT id FROM a0) AND d NOT IN (SELECT id FROM a1)),
      a3 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN a2 ON und.s = a2.id
        WHERE d NOT IN (SELECT id FROM a0) AND d NOT IN (SELECT id FROM a1)
          AND d NOT IN (SELECT id FROM a2)),
      a4 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN a3 ON und.s = a3.id
        WHERE d NOT IN (SELECT id FROM a0) AND d NOT IN (SELECT id FROM a1)
          AND d NOT IN (SELECT id FROM a2) AND d NOT IN (SELECT id FROM a3)),
      da AS MATERIALIZED (
        SELECT id, 0::BIGINT AS dist FROM a0
        UNION ALL SELECT id, 1 FROM a1
        UNION ALL SELECT id, 2 FROM a2
        UNION ALL SELECT id, 3 FROM a3
        UNION ALL SELECT id, 4 FROM a4),
      e1 AS MATERIALIZED (SELECT max(dist) AS m FROM da),
      s2 AS MATERIALIZED (
        SELECT min(id) AS id FROM da WHERE dist = (SELECT m FROM e1)),
      b0 AS MATERIALIZED (SELECT id FROM s2),
      b1 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN b0 ON und.s = b0.id
        WHERE d NOT IN (SELECT id FROM b0)),
      b2 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN b1 ON und.s = b1.id
        WHERE d NOT IN (SELECT id FROM b0) AND d NOT IN (SELECT id FROM b1)),
      b3 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN b2 ON und.s = b2.id
        WHERE d NOT IN (SELECT id FROM b0) AND d NOT IN (SELECT id FROM b1)
          AND d NOT IN (SELECT id FROM b2)),
      b4 AS MATERIALIZED (SELECT DISTINCT d AS id FROM und JOIN b3 ON und.s = b3.id
        WHERE d NOT IN (SELECT id FROM b0) AND d NOT IN (SELECT id FROM b1)
          AND d NOT IN (SELECT id FROM b2) AND d NOT IN (SELECT id FROM b3)),
      db AS MATERIALIZED (
        SELECT id, 0::BIGINT AS dist FROM b0
        UNION ALL SELECT id, 1 FROM b1
        UNION ALL SELECT id, 2 FROM b2
        UNION ALL SELECT id, 3 FROM b3
        UNION ALL SELECT id, 4 FROM b4)
      SELECT (SELECT id FROM s1) AS seed1, (SELECT m FROM e1) AS ecc1,
             (SELECT id FROM s2) AS seed2,
             (SELECT max(dist) FROM db) AS ecc2,
             (SELECT count(*) FROM db)::BIGINT AS n_reached""")),

    Q("g_shortest_hops", (s, dir) => {
      val edges = custNatEdges(s, dir)
        .unionByName(natRegEdges(s, dir))
        .unionByName(supNatEdges(s, dir))
      val sources = Tables(s, dir, "region").filter(col("r_name") === "AFRICA")
        .select((col("r_regionkey") + 1000).cast("long").as("id"))
      GraphOps.shortestHops(s, edges, sources)
    },
      Some("""
      WITH afr AS (SELECT r_regionkey FROM region WHERE r_name='AFRICA')
      SELECT (1000+r_regionkey)::BIGINT AS id, 0::BIGINT AS dist FROM afr
      UNION ALL
      SELECT n_nationkey::BIGINT, 1::BIGINT FROM nation
      WHERE n_regionkey IN (SELECT r_regionkey FROM afr)
      UNION ALL
      SELECT (10000+c_custkey)::BIGINT, 2::BIGINT FROM customer
      JOIN nation ON c_nationkey=n_nationkey
      WHERE n_regionkey IN (SELECT r_regionkey FROM afr)
      UNION ALL
      SELECT (100000+s_suppkey)::BIGINT, 2::BIGINT FROM supplier
      JOIN nation ON s_nationkey=n_nationkey
      WHERE n_regionkey IN (SELECT r_regionkey FROM afr)""")),

    // bounded-round WEIGHTED shortest paths (r17): Bellman-Ford from
    // the smallest AFRICA nation over the same-region nation clique
    // (key-derived symmetric integer weights — multi-hop clique detours
    // genuinely undercut direct edges) + customer pendants. Four
    // relaxation rounds are the CONTRACT; the oracle unrolls the same
    // four min-plus rounds as materialized CTEs
    Q("g_weighted_paths", (s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      val cliq = n1.join(n2, col("rk") === col("rk2") && col("k1") < col("k2"))
        .select(col("k1").cast("long").as("src"),
          col("k2").cast("long").as("dst"),
          ((col("k1") * 31 + col("k2") * 17) % 20 + 1).cast("long").as("w"))
      val pend = Tables(s, dir, "customer").select(
        (col("c_custkey") + 10000).cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"),
        (col("c_custkey") % 13 + 1).cast("long").as("w"))
      val seeds = Tables(s, dir, "nation")
        .join(Tables(s, dir, "region").filter(col("r_name") === "AFRICA"),
          col("n_regionkey") === col("r_regionkey"))
        .agg(min(col("n_nationkey")).cast("long").as("id"))
      GraphOps.weightedPathsFromSeeds(s, cliq.unionByName(pend), seeds,
        rounds = 4)
    },
      Some("""
      WITH e0 AS MATERIALIZED (
        SELECT a.n_nationkey::BIGINT AS src, b.n_nationkey::BIGINT AS dst,
               ((a.n_nationkey*31 + b.n_nationkey*17) % 20 + 1)::BIGINT AS w
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        UNION ALL
        SELECT (10000+c_custkey)::BIGINT, c_nationkey::BIGINT,
               (c_custkey % 13 + 1)::BIGINT
        FROM customer),
      e AS MATERIALIZED (
        SELECT src, dst, w FROM e0 UNION SELECT dst, src, w FROM e0),
      d0 AS MATERIALIZED (
        SELECT min(n_nationkey)::BIGINT AS id, 0::BIGINT AS dist FROM nation
        WHERE n_regionkey IN
          (SELECT r_regionkey FROM region WHERE r_name='AFRICA')),
      d1 AS MATERIALIZED (SELECT id, min(dist)::BIGINT AS dist FROM (
        SELECT id, dist FROM d0 UNION ALL
        SELECT e.dst, d.dist + e.w FROM d0 d JOIN e ON d.id = e.src)
        GROUP BY 1),
      d2 AS MATERIALIZED (SELECT id, min(dist)::BIGINT AS dist FROM (
        SELECT id, dist FROM d1 UNION ALL
        SELECT e.dst, d.dist + e.w FROM d1 d JOIN e ON d.id = e.src)
        GROUP BY 1),
      d3 AS MATERIALIZED (SELECT id, min(dist)::BIGINT AS dist FROM (
        SELECT id, dist FROM d2 UNION ALL
        SELECT e.dst, d.dist + e.w FROM d2 d JOIN e ON d.id = e.src)
        GROUP BY 1),
      d4 AS MATERIALIZED (SELECT id, min(dist)::BIGINT AS dist FROM (
        SELECT id, dist FROM d3 UNION ALL
        SELECT e.dst, d.dist + e.w FROM d3 d JOIN e ON d.id = e.src)
        GROUP BY 1)
      SELECT id, dist FROM d4""")),

    // deterministic hash-seeded random walks (r17): node2vec-style
    // positive-pair sampling, 4 steps from a customer seed sample over
    // customer→nation pendants + the same-region nation clique. The
    // step-t successor is the out-neighbor minimizing polyHash(v|t|u)
    // — reproducible with no RNG state; the oracle unrolls the same
    // argmin rounds (min h, then min candidate on hash ties)
    Q("g_random_walk", (s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      val cliq = n1.join(n2, col("rk") === col("rk2") && col("k1") =!= col("k2"))
        .select(col("k1").cast("long").as("src"), col("k2").cast("long").as("dst"))
      val edges = custNatEdges(s, dir).unionByName(cliq)
      val seeds = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 10000).cast("long").as("id"))
      GraphOps.randomWalkFromSeeds(s, edges, seeds, rounds = 4)
    }, Some {
      def cand(i: Int) = s"""
      c$i AS MATERIALIZED (SELECT w.seed, e.dst AS u,
          ${Queries.duckPhFor(s"w.node::VARCHAR || '|$i|' || e.dst::VARCHAR")} AS h
        FROM w${i - 1} w JOIN e ON w.node = e.src),
      m$i AS (SELECT seed, min(h) AS mh FROM c$i GROUP BY 1),
      w$i AS MATERIALIZED (
        SELECT c.seed, min(c.u) AS node
        FROM c$i c JOIN m$i m ON c.seed = m.seed AND c.h = m.mh GROUP BY 1
        UNION ALL
        SELECT w.seed, w.node FROM w${i - 1} w
        WHERE w.seed NOT IN (SELECT seed FROM c$i))"""
      s"""
      WITH e AS MATERIALIZED (
        SELECT (10000+c_custkey)::BIGINT AS src, c_nationkey::BIGINT AS dst
        FROM customer
        UNION ALL
        SELECT a.n_nationkey::BIGINT, b.n_nationkey::BIGINT
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey),
      w0 AS MATERIALIZED (
        SELECT (10000+c_custkey)::BIGINT AS seed,
               (10000+c_custkey)::BIGINT AS node
        FROM customer WHERE c_custkey % 97 = 0),
      ${(1 to 4).map(cand).mkString(",")}
      SELECT seed, 0::BIGINT AS step, node FROM w0
      UNION ALL SELECT seed, 1::BIGINT, node FROM w1
      UNION ALL SELECT seed, 2::BIGINT, node FROM w2
      UNION ALL SELECT seed, 3::BIGINT, node FROM w3
      UNION ALL SELECT seed, 4::BIGINT, node FROM w4"""
    }),

    // WEIGHTED deterministic walks (r17): successor chosen with
    // probability ∝ edge weight via the exponential race — per
    // candidate edge the deterministic uniform u(v,t,dst) races with
    // key −ln(u)/w on the integer micro plane (the st_weighted_sample
    // key); min key wins. Oracle unrolls the same races
    Q("g_weighted_walk", (s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      val cliq = n1.join(n2, col("rk") === col("rk2") && col("k1") =!= col("k2"))
        .select(col("k1").cast("long").as("src"),
          col("k2").cast("long").as("dst"),
          ((col("k1") * 31 + col("k2") * 17) % 20 + 1).cast("long").as("w"))
      val pend = Tables(s, dir, "customer").select(
        (col("c_custkey") + 10000).cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"),
        (col("c_custkey") % 13 + 1).cast("long").as("w"))
      val seeds = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 10000).cast("long").as("id"))
      GraphOps.weightedWalkFromSeeds(s, cliq.unionByName(pend), seeds,
        rounds = 4)
    }, Some {
      def cand(i: Int) = s"""
      c$i AS MATERIALIZED (
        SELECT seed, u, CAST(round(-ln(uni) * 1000000.0 / ew) AS BIGINT) AS p
        FROM (SELECT w.seed, e.dst AS u, e.w AS ew,
                (((${Queries.duckPhFor(s"w.node::VARCHAR || '|$i|' || e.dst::VARCHAR")}
                   * 2654435761 % 1000000007) + 1000000007) % 1000000007
                 + 1)::DOUBLE / 1000000008.0 AS uni
              FROM w${i - 1} w JOIN e ON w.node = e.src)),
      m$i AS (SELECT seed, min(p) AS mp FROM c$i GROUP BY 1),
      w$i AS MATERIALIZED (
        SELECT c.seed, min(c.u) AS node
        FROM c$i c JOIN m$i m ON c.seed = m.seed AND c.p = m.mp GROUP BY 1
        UNION ALL
        SELECT w.seed, w.node FROM w${i - 1} w
        WHERE w.seed NOT IN (SELECT seed FROM c$i))"""
      s"""
      WITH e AS MATERIALIZED (
        SELECT (10000+c_custkey)::BIGINT AS src, c_nationkey::BIGINT AS dst,
               (c_custkey % 13 + 1)::BIGINT AS w
        FROM customer
        UNION ALL
        SELECT a.n_nationkey::BIGINT, b.n_nationkey::BIGINT,
               ((a.n_nationkey*31 + b.n_nationkey*17) % 20 + 1)::BIGINT
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey),
      w0 AS MATERIALIZED (
        SELECT (10000+c_custkey)::BIGINT AS seed,
               (10000+c_custkey)::BIGINT AS node
        FROM customer WHERE c_custkey % 97 = 0),
      ${(1 to 4).map(cand).mkString(",")}
      SELECT seed, 0::BIGINT AS step, node FROM w0
      UNION ALL SELECT seed, 1::BIGINT, node FROM w1
      UNION ALL SELECT seed, 2::BIGINT, node FROM w2
      UNION ALL SELECT seed, 3::BIGINT, node FROM w3
      UNION ALL SELECT seed, 4::BIGINT, node FROM w4"""
    }),

    // per-vertex triangle counts over the same-region nation graph
    // (each region's nations form a clique, so a nation in a region of
    // k nations sits in C(k-1,2) triangles — exact relational mirror)
    Q("g_triangles", (s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      val edges = n1.join(n2, col("rk") === col("rk2") && col("k1") < col("k2"))
        .select(col("k1").cast("long").as("src"), col("k2").cast("long").as("dst"))
      GraphOps.triangleCount(s, edges)
    },
      Some("""
      WITH k AS (SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1)
      SELECT n_nationkey::BIGINT AS id, ((c-1)*(c-2)//2)::BIGINT AS triangles
      FROM nation JOIN k USING (n_regionkey) WHERE c > 1""")),

    // local clustering coefficient (r16): nation cliques + customer
    // pendants give NON-degenerate coefficients (a nation in a region
    // of c nations with m customers: deg = c−1+m, T = C(c−1,2) — the
    // customer edges dilute the clique). Customers have deg 1 and are
    // excluded by the deg ≥ 2 contract on both sides
    Q("g_local_clustering", (s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      val cliq = n1.join(n2, col("rk") === col("rk2") && col("k1") < col("k2"))
        .select(col("k1").cast("long").as("src"),
          col("k2").cast("long").as("dst"))
      GraphOps.localClustering(s,
        cliq.unionByName(custNatEdges(s, dir)))
    },
      Some("""
      WITH k AS (SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1),
      cm AS (SELECT c_nationkey AS nk, count(*) AS m FROM customer GROUP BY 1),
      nat AS (
        SELECT n_nationkey::BIGINT AS id,
               (k.c - 1 + coalesce(cm.m, 0))::BIGINT AS degree,
               ((k.c-1)*(k.c-2)//2)::BIGINT AS triangles
        FROM nation JOIN k USING (n_regionkey)
        LEFT JOIN cm ON cm.nk = n_nationkey)
      SELECT id, degree, triangles,
             (2000000 * triangles) // (degree * (degree - 1)) AS lcc_micro
      FROM nat WHERE degree >= 2""")),

    // bounded k-truss peel (r16): the EDGE-level dense-subgraph
    // sibling of k-core — on nation cliques + customer pendants the
    // pendant edges (support 0) and sub-4-nation cliques peel in
    // round 1 and the full cliques stabilize at support c−2 (exact
    // closed-form oracle); the peel CASCADE is pinned by the
    // GraphOpsSpec triangle-strip fixture
    Q("g_ktruss", (s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      val cliq = n1.join(n2, col("rk") === col("rk2") && col("k1") < col("k2"))
        .select(col("k1").cast("long").as("src"),
          col("k2").cast("long").as("dst"))
      GraphOps.kTruss(s, cliq.unionByName(custNatEdges(s, dir)),
        k = 4, rounds = 2)
    },
      Some("""
      WITH kk AS (SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1)
      SELECT n1.n_nationkey::BIGINT AS src, n2.n_nationkey::BIGINT AS dst,
             (c-2)::BIGINT AS support
      FROM nation n1
      JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
                    AND n1.n_nationkey < n2.n_nationkey
      JOIN kk ON kk.n_regionkey = n1.n_regionkey
      WHERE c >= 4""")),

    // bounded k-core peel (k=3, 6 rounds) over the part–supplier
    // bipartite graph from lineitem — the dense-subgraph extraction
    // primitive. The round count is part of the contract so the oracle
    // unrolls the identical peel; the fixture converges well inside 6
    // rounds (GraphOpsSpec asserts it), so the survivors are the true
    // 3-core.
    Q("g_kcore", (s, dir) =>
      GraphOps.kCore(s, partSuppEdges(s, dir), k = 3, rounds = 6), {
      // AS MATERIALIZED: each round references the previous edge CTE
      // three times; plain CTEs inline per reference, which compounds
      // to 3^6 scans of the base table
      val rounds = (1 to 6).map { i =>
        s"""v$i AS MATERIALIZED (SELECT v FROM (
              SELECT v, count(*) AS c FROM (
                SELECT src AS v FROM e${i - 1} UNION ALL SELECT dst FROM e${i - 1}) GROUP BY 1)
              WHERE c >= 3),
            e$i AS MATERIALIZED (SELECT src, dst FROM e${i - 1}
              WHERE src IN (SELECT v FROM v$i) AND dst IN (SELECT v FROM v$i))"""
      }.mkString(",\n")
      Some(s"""
      WITH e0 AS MATERIALIZED (SELECT DISTINCT (1000000+l_partkey)::BIGINT AS src,
                    (100000+l_suppkey)::BIGINT AS dst FROM lineitem),
      $rounds
      SELECT v AS id, count(*)::BIGINT AS core_deg FROM (
        SELECT src AS v FROM e6 UNION ALL SELECT dst FROM e6) GROUP BY 1""")
    }),

    // HITS hubs/authorities, integer-exact bounded rounds (no float
    // normalization → no reduction-order sensitivity; ranking is
    // normalization-invariant)
    Q("g_hits", (s, dir) =>
      GraphOps.hits(s, partSuppEdges(s, dir), rounds = 2), {
      val rounds = (1 to 2).map { i =>
        s"""a$i AS MATERIALIZED (SELECT v, max(auth)::BIGINT AS auth FROM (
              SELECT e.dst AS v, sum(h.hub)::BIGINT AS auth
              FROM e JOIN h${i - 1} h ON h.v = e.src GROUP BY e.dst
              UNION ALL SELECT v, 0::BIGINT FROM verts) GROUP BY v),
            h$i AS MATERIALIZED (SELECT v, max(hub)::BIGINT AS hub FROM (
              SELECT e.src AS v, sum(a.auth)::BIGINT AS hub
              FROM e JOIN a$i a ON a.v = e.dst GROUP BY e.src
              UNION ALL SELECT v, 0::BIGINT FROM verts) GROUP BY v)"""
      }.mkString(",\n")
      Some(s"""
      WITH e AS MATERIALIZED (SELECT DISTINCT (1000000+l_partkey)::BIGINT AS src,
                    (100000+l_suppkey)::BIGINT AS dst FROM lineitem),
      verts AS MATERIALIZED (SELECT DISTINCT v FROM (
        SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
      h0 AS MATERIALIZED (SELECT v, 1::BIGINT AS hub FROM verts),
      $rounds
      SELECT h2.v AS id, h2.hub, a2.auth FROM h2 JOIN a2 ON a2.v = h2.v""")
    }),

    // deterministic synchronous label propagation over the
    // part–supplier bipartite graph: 3 bounded rounds, most-frequent
    // neighbor label, ties to the smallest — the run-order-free LPA
    // variant that IS checkable cross-engine (async LPA is not)
    Q("g_label_prop", (s, dir) =>
      GraphOps.labelPropagation(s, partSuppEdges(s, dir), rounds = 3), {
      val rounds = (1 to 3).map { i =>
        s"""l$i AS MATERIALIZED (SELECT v, lbl FROM (
              SELECT u.src AS v, l.lbl AS lbl, count(*) AS c,
                     row_number() OVER (PARTITION BY u.src
                       ORDER BY count(*) DESC, l.lbl ASC) AS rn
              FROM und u JOIN l${i - 1} l ON l.v = u.dst
              GROUP BY u.src, l.lbl) WHERE rn = 1)"""
      }.mkString(",\n")
      Some(s"""
      WITH e0 AS MATERIALIZED (SELECT DISTINCT (1000000+l_partkey)::BIGINT AS src,
                    (100000+l_suppkey)::BIGINT AS dst FROM lineitem),
      und AS MATERIALIZED (SELECT src, dst FROM e0
                           UNION ALL SELECT dst, src FROM e0),
      l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lbl FROM und),
      $rounds
      SELECT v AS id, lbl AS label FROM l3""")
    }),

    // partition modularity (r14): how REGION-ASSORTATIVE is the
    // combined hierarchy + trade graph — Newman-Girvan per-community
    // contributions (GraphOps.modularityByCommunity) for the GIVEN
    // region partition, over the cust/supp->nation->region edges plus
    // the cross-cutting (customer, supplier) trade pairs from
    // orders x lineitem. Hierarchy edges are always intra; trade
    // edges split by whether the pair shares a region - a non-vacuous
    // mix the closed-form oracle states exactly. q_micro uses the
    // two-step integer division (no 1e6*d^2 overflow at any scale)
    Q("g_modularity", (s, dir) => {
      val hier = custNatEdges(s, dir)
        .unionByName(natRegEdges(s, dir))
        .unionByName(supNatEdges(s, dir))
      val trade = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") + 10000).cast("long").as("src"),
          (col("l_suppkey") + 100000).cast("long").as("dst"))
      val edges = hier.unionByName(trade)
      val nat = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("__nk"),
          (col("n_regionkey") + 1000).cast("long").as("__reg"))
      val labels = Tables(s, dir, "customer")
        .join(nat, col("c_nationkey") === col("__nk"))
        .select((col("c_custkey") + 10000).cast("long").as("id"),
          col("__reg").as("label"))
        .unionByName(Tables(s, dir, "supplier")
          .join(nat, col("s_nationkey") === col("__nk"))
          .select((col("s_suppkey") + 100000).cast("long").as("id"),
            col("__reg").as("label")))
        .unionByName(nat.select(col("__nk").cast("long").as("id"),
          col("__reg").as("label")))
        .unionByName(Tables(s, dir, "region")
          .select((col("r_regionkey") + 1000).cast("long").as("id"),
            (col("r_regionkey") + 1000).cast("long").as("label")))
      GraphOps.modularityByCommunity(s, edges, labels)
    }, Some("""
      WITH e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        SELECT (10000+c_custkey)::BIGINT AS src, c_nationkey::BIGINT AS dst
        FROM customer
        UNION ALL
        SELECT n_nationkey::BIGINT, (1000+n_regionkey)::BIGINT FROM nation
        UNION ALL
        SELECT (100000+s_suppkey)::BIGINT, s_nationkey::BIGINT FROM supplier
        UNION ALL
        SELECT DISTINCT (10000+o_custkey)::BIGINT, (100000+l_suppkey)::BIGINT
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)),
      lab AS MATERIALIZED (
        SELECT (10000+c_custkey)::BIGINT AS id,
               (1000+n_regionkey)::BIGINT AS label
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        UNION ALL
        SELECT (100000+s_suppkey)::BIGINT, (1000+n_regionkey)::BIGINT
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        UNION ALL
        SELECT n_nationkey::BIGINT, (1000+n_regionkey)::BIGINT FROM nation
        UNION ALL
        SELECT (1000+r_regionkey)::BIGINT, (1000+r_regionkey)::BIGINT
        FROM region),
      mm AS MATERIALIZED (SELECT count(*)::BIGINT AS m FROM e0),
      intra AS MATERIALIZED (
        SELECT ls.label AS label, count(*)::BIGINT AS intra_edges
        FROM e0 JOIN lab ls ON ls.id = e0.src
                JOIN lab ld ON ld.id = e0.dst
        WHERE ls.label = ld.label GROUP BY 1),
      deg AS MATERIALIZED (
        SELECT id, count(*)::BIGINT AS d
        FROM (SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)
        GROUP BY 1),
      comm AS MATERIALIZED (
        SELECT label, sum(d)::BIGINT AS degree_sum,
               count(*)::BIGINT AS n_nodes
        FROM deg JOIN lab USING (id) GROUP BY 1)
      SELECT c.label, c.n_nodes,
             coalesce(i.intra_edges, 0)::BIGINT AS intra_edges,
             c.degree_sum,
             ((1000000 * coalesce(i.intra_edges, 0)) // (SELECT m FROM mm)
              - (((1000000 * c.degree_sum) // (2*(SELECT m FROM mm)))
                 * ((1000000 * c.degree_sum) // (2*(SELECT m FROM mm))))
                // 1000000)::BIGINT AS q_micro
      FROM comm c LEFT JOIN intra i USING (label)""")),

    // Adamic–Adar link prediction over the part–supplier bipartite
    // graph (first 300 parts): integer micro-nat common-neighbor
    // weights; the hub cap (deg <= 64) is part of the operator
    // contract and the oracle states the same capped score
    Q("g_adamic_adar", (s, dir) => {
      val edges = Tables(s, dir, "lineitem")
        .filter(col("l_partkey") <= 300)
        .select(col("l_partkey").cast("long").as("left"),
          col("l_suppkey").cast("long").as("right"))
      GraphOps.adamicAdar(edges, maxDeg = 64)
    }, Some("""
      WITH e AS (SELECT DISTINCT l_partkey::BIGINT AS l, l_suppkey::BIGINT AS r
                 FROM lineitem WHERE l_partkey <= 300),
      deg AS (SELECT r, count(*)::BIGINT AS deg FROM e GROUP BY 1
              HAVING count(*) BETWEEN 2 AND 64),
      w AS (SELECT r, CAST(round(1e6 / ln(deg)) AS BIGINT) AS w_micro
            FROM deg),
      ew AS (SELECT e.l, e.r, w.w_micro FROM e JOIN w USING (r))
      SELECT a.l AS a, b.l AS b, count(*)::BIGINT AS n_common,
             sum(a.w_micro)::BIGINT AS aa_micro
      FROM ew a JOIN ew b ON a.r = b.r AND a.l < b.l
      GROUP BY 1, 2""")),

    // neighbor-set Jaccard link prediction: the set-overlap sibling
    // of Adamic-Adar (same wedge join + hub cap on the shared side;
    // union sizes from the true left degrees)
    Q("g_neighbor_jaccard", (s, dir) => {
      // cap 256 (vs adamic-adar's 64): at sf0.001 the 10 suppliers
      // each serve ~80 of the <= 300 parts, so a 64-cap leaves zero
      // wedges to check; 256 keeps the hub contract AND tiny-SF rows
      val edges = Tables(s, dir, "lineitem")
        .filter(col("l_partkey") <= 300)
        .select(col("l_partkey").cast("long").as("left"),
          col("l_suppkey").cast("long").as("right"))
      GraphOps.neighborJaccard(edges, maxDeg = 256)
    }, Some("""
      WITH e AS (SELECT DISTINCT l_partkey::BIGINT AS l, l_suppkey::BIGINT AS r
                 FROM lineitem WHERE l_partkey <= 300),
      rdeg AS (SELECT r FROM e GROUP BY 1
               HAVING count(*) BETWEEN 2 AND 256),
      ldeg AS (SELECT l, count(*)::BIGINT AS ldeg FROM e GROUP BY 1),
      ew AS (SELECT e.l, e.r FROM e JOIN rdeg USING (r)),
      common AS (
        SELECT a.l AS a, b.l AS b, count(*)::BIGINT AS n_common
        FROM ew a JOIN ew b ON a.r = b.r AND a.l < b.l
        GROUP BY 1, 2)
      SELECT c.a, c.b, c.n_common, da.ldeg AS da, db.ldeg AS db,
             CAST(round(c.n_common::DOUBLE * 1000000.0
                        / (da.ldeg + db.ldeg - c.n_common)) AS BIGINT)::DOUBLE / 1000000.0 AS jaccard
      FROM common c JOIN ldeg da ON da.l = c.a
                    JOIN ldeg db ON db.l = c.b""")),

    // log2-bucketed undirected degree distribution — the scale-free-
    // graph diagnostic every crawl/link analysis starts with. One
    // combinable degree count + a map-only comparison-ladder bucket
    // (float log2 misbuckets exact powers of two) + one combinable
    // count onto ≤ 22 buckets
    Q("g_degree_hist", (s, dir) => {
      val edges = custNatEdges(s, dir)
        .unionByName(natRegEdges(s, dir))
        .unionByName(supNatEdges(s, dir))
      val deg = edges.select(col("src").as("v"))
        .unionByName(edges.select(col("dst").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      deg.groupBy(graft.ext.Sketches.floorLog2(col("deg")).cast("int")
          .as("bucket"))
        .agg(count(lit(1)).as("n_vertices"), sum("deg").as("sum_deg"))
    }, Some(s"""
      WITH e AS (
        SELECT (10000+c_custkey)::BIGINT AS src, c_nationkey::BIGINT AS dst
        FROM customer
        UNION ALL
        SELECT n_nationkey::BIGINT, (1000+n_regionkey)::BIGINT FROM nation
        UNION ALL
        SELECT (100000+s_suppkey)::BIGINT, s_nationkey::BIGINT FROM supplier),
      deg AS (
        SELECT v, count(*)::BIGINT AS deg FROM (
          SELECT src AS v FROM e UNION ALL SELECT dst FROM e) GROUP BY 1)
      SELECT (${graft.ext.Sketches.floorLog2Sql("deg")})::INT AS bucket,
             count(*)::BIGINT AS n_vertices, sum(deg)::BIGINT AS sum_deg
      FROM deg GROUP BY 1"""))
  )
}

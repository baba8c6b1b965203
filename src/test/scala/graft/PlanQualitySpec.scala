package graft

/** Plan-shape contracts for the headline queries — the properties that
  * decide whether a plan survives a 100× scale-up, asserted so a
  * refactor cannot silently regress them:
  *
  *  - star joins broadcast their dimension sides (no sort-merge
  *    shuffle of the fact table against a tiny dim, no cartesian);
  *  - filters and projections reach the parquet scan (PushedFilters /
  *    pruned ReadSchema), so the fact scan reads the columns the
  *    query needs and nothing else;
  *  - aggregations are partial (map-side combine) before the shuffle;
  *  - the hot path stays inside whole-stage codegen.
  */
class PlanQualitySpec extends GraftSuite {

  /** Final executed plan: collect() first so AQE finalizes and the
    * string carries codegen span markers. Gates that SEAL their result
    * with a terminal localCheckpoint return a bare `Scan ExistingRDD`
    * plan — for those, [[graft.ext.SealCapture]] records the pre-seal
    * finalized plan at [[graft.ext.Ranks.seal]] time (r19, fixing the
    * r18 vacuous-assert breakage); the contracts assert on the
    * concatenation, so sealed shapes stay pinned.
    */
  private def plan(name: String): String = {
    graft.ext.SealCapture.enable()
    graft.ext.SealCapture.clear()
    try {
      val df = Queries.queries(name)(spark, sf)
      df.collect()
      (graft.ext.SealCapture.plans() :+
        df.queryExecution.executedPlan.toString()).mkString("\n")
    } finally {
      graft.ext.SealCapture.disable()
      graft.ext.SealCapture.clear()
    }
  }

  test("q5 star join: dims broadcast, no cartesian, pushed fact filter") {
    val p = plan("q5_multiway_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected >=3 broadcast joins (customer/nation/region dims):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
    // shuffles (hash-partitioning exchanges, not broadcasts) should be
    // at most the fact-side equi-join + the final groupBy — a dim
    // reaching a shuffle means a broadcast was lost
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"unexpected shuffle count (dims no longer broadcast?):\n$p")
  }

  test("q1 agg: shipdate filter pushed to parquet, partial aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters") &&
      p.replaceAll("(?s).*PushedFilters", "").takeWhile(_ != ']')
        .contains("l_shipdate"),
      s"l_shipdate not pushed to the scan:\n$p")
    // partial + final HashAggregate pair = map-side combine before the
    // exchange; a single aggregate would shuffle raw rows
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation:\n$p")
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    // in the final-plan string form
    assert(p.contains("WholeStageCodegen") ||
      """\*\(\d+\) HashAggregate""".r.findFirstIn(p).isDefined,
      s"hot path not codegen'd:\n$p")
  }

  test("q1 agg: scan reads only the columns the query needs") {
    val p = plan("q1_agg")
    val readSchema = p.replaceAll("(?s).*ReadSchema: ", "").takeWhile(_ != '>')
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"),
      s"needed columns missing from scan:\n$readSchema")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"column pruning lost — scan reads unused columns:\n$readSchema")
  }

  test("semi/anti joins stay semi/anti at the physical level") {
    val semi = plan("q_semi_join")
    assert(semi.contains("LeftSemi"), s"semi join lowered to something else:\n$semi")
    val anti = plan("q_anti_join")
    assert(anti.contains("LeftAnti"), s"anti join lowered to something else:\n$anti")
  }

  test("brute-force top-k: one corpus scan, no shuffle join") {
    val p = plan("s_bruteforce_topk")
    assert(!p.contains("SortMergeJoin"),
      s"query set must broadcast against the corpus scan, not shuffle:\n$p")
  }

  test("w_sessionize: rollup is the only shuffle after the boundary-merge") {
    // with AQE the plan string appends the pre-AQE "Initial Plan" —
    // count exchanges only in the final section or every one doubles.
    // The sid-assignment passes read the checkpointed range layout
    // (their exchange happened in an earlier job); the visible plan
    // should be exactly: map-only sid pass → partial agg → ONE
    // (user_id, sid) hash exchange → final agg
    val p = plan("w_sessionize").split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"sessionization re-shuffles beyond the session rollup:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("partial_count"),
      s"session rollup lost map-side combine:\n$p")
  }

  test("d_semdedup / s_kmeans_assign: cluster assignment is map-side") {
    // centroids ship as literals inside the plan: assignment must not
    // introduce a join against a centroid table
    val pk = plan("s_kmeans_assign")
    assert(!pk.contains("CartesianProduct") && !pk.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment joined instead of inlined:\n$pk")
    val pd = plan("d_semdedup")
    assert(!pd.contains("CartesianProduct"),
      s"semdedup pair join lost its cluster key:\n$pd")
  }

  test("sketches and two-stage retrieval keep their scale shapes") {
    // Bloom probe: the (<= m row) bit set broadcasts against the
    // probe-side scan — never a shuffle join
    val pb = plan("d_bloom_membership")
    assert(pb.contains("BroadcastHashJoin"),
      s"bloom bit set does not broadcast:\n$pb")
    // Count-Min estimate: the (<= d*w cell) sketch broadcasts; the
    // build is a combinable aggregate (partial before the exchange)
    val pc = plan("t_cms_heavy")
    assert(pc.contains("BroadcastHashJoin"),
      s"count-min sketch does not broadcast:\n$pc")
    assert(pc.contains("partial_count"),
      s"sketch build lost map-side combine:\n$pc")
    // int8 coarse + rescore: probes broadcast against one corpus scan,
    // never a shuffle join of the corpus
    val pi = plan("s_int8_rescore")
    assert(!pi.contains("SortMergeJoin"),
      s"int8 probe side must broadcast, not shuffle:\n$pi")
    // RRF: the fusion join runs on two truncated lists — anything but
    // a cartesian is fine; pin the absence
    val pr = plan("s_rrf_hybrid")
    assert(!pr.contains("CartesianProduct"), s"cartesian in RRF fuse:\n$pr")
  }

  test("batch-4 ops keep their scale shapes") {
    // sparse cosine: query postings + query norms BROADCAST onto the
    // term-partitioned corpus postings; never a cartesian
    val ps = plan("t_sparse_cosine")
    assert("BroadcastHashJoin".r.findAllIn(ps).size >= 2,
      s"query postings/norms must broadcast:\n$ps")
    assert(!ps.contains("CartesianProduct"), s"cartesian in sparse cosine:\n$ps")
    // per-query top-k guard: the rank must run with a PARTIAL
    // WindowGroupLimit below the exchange, so a stopword-heavy query
    // whose candidate set spans the corpus ships at most k rows per
    // map partition instead of funneling everything through the one
    // rank task that holds its query_id
    assert(ps.contains("WindowGroupLimit") && ps.contains("Partial"),
      s"sparse-cosine rank lacks the partial per-query top-k guard:\n$ps")
    // margin mining: probes broadcast (nested-loop against the corpus
    // scan is the hardNegatives shape) — the corpus never shuffles
    // into a sort-merge join
    val pm = plan("s_margin_mining")
    assert(!pm.contains("SortMergeJoin"),
      s"margin probes must broadcast, not shuffle:\n$pm")
    // rolling HLL: the daily register build combines map-side (partial
    // max before the exchange); the day-existence check broadcasts
    val ph = plan("w_rolling_hll")
    assert(ph.contains("partial_max"),
      s"daily register build lost map-side combine:\n$ph")
    // interval overlap: binning makes the overlap predicate an EQUI
    // join — a cartesian here is the O(n^2) failure the op exists to
    // avoid
    val pi = plan("w_interval_overlap")
    assert(!pi.contains("CartesianProduct") &&
      !pi.contains("BroadcastNestedLoopJoin"),
      s"interval overlap fell back to a non-equi join:\n$pi")
    // degree histogram: both counts combine map-side
    val pd = plan("g_degree_hist")
    assert(pd.contains("partial_count"),
      s"degree count lost map-side combine:\n$pd")
  }

  test("t_entropy: per-term fixed-point work is partial-aggregated") {
    val p = plan("t_entropy")
    // (doc_id, tok) count and the final per-doc sum both combine
    // map-side before their exchanges
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggregate pairs:\n$p")
  }

  test("encoded BGP: shuffle exchanges carry long ids, not term structs") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    // pin every join to a real shuffle (no AQE re-plan, no broadcast)
    // so the exchange payloads are observable
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        """SELECT ?c ?nname ?rname WHERE {
           ?c :nation ?n . ?n :name ?nname . ?n :region ?r . ?r :name ?rname }""",
        encoded = Some(enc))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      assert(shuffles.nonEmpty, "expected shuffle joins with broadcast disabled")
      // intra-BGP joins shuffle ONLY longs; the decode edge may shuffle
      // the dictionary's (id, term) — never a multi-struct solution row
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"a shuffle carries a struct-typed solution row: $out")
      }
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only shuffle found — BGP joins not running over the " +
          s"encoded table: $shuffles")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("GROUP BY over a BGP aggregates on ids, decode after the agg") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT ?t (COUNT(?x) AS ?n) WHERE { ?x a ?t } GROUP BY ?t",
        encoded = Some(enc))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      // the pre-aggregate exchange (group key + partial count) must be
      // all-long: the term structs appear only after the aggregate, on
      // the handful of group rows the dictionary join decodes
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-plane aggregate exchange found: $shuffles")
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"a shuffle carries struct-typed solution rows: $out")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("value aggregates push down: keys shuffle as ids, one decoded arg") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT ?n (SUM(?b) AS ?s) WHERE { ?c :nation ?n . ?c :acctbal ?b } " +
          "GROUP BY ?n",
        encoded = Some(enc))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      // the BGP join and the pre-aggregate exchange both carry the
      // group key as an 8-byte id; only SUM's argument is a decoded
      // term struct (the single dictionary join before the aggregate)
      assert(shuffles.exists(_.contains(LongType)),
        s"no id-typed exchange found: $shuffles")
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"an exchange carries more than the aggregate argument: $out")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("expression-arg aggregates: keys shuffle as ids") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT ?n (SUM(?b * 2) AS ?s) WHERE { ?c :nation ?n . " +
          "?c :acctbal ?b } GROUP BY ?n",
        encoded = Some(enc))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      // SUM's argument is an expression over ?b — only ?b decodes; the
      // BGP join and the group key stay 8-byte ids
      assert(shuffles.exists(_.contains(LongType)),
        s"no id-typed exchange found: $shuffles")
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"an exchange carries more than the aggregate argument: $out")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("expression GROUP BY keys: exchange partitions on an 8-byte hash") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT ?l (COUNT(?c) AS ?n) WHERE { ?c :mktsegment ?m } " +
          "GROUP BY (STRLEN(?m) AS ?l)",
        encoded = Some(enc))
      df.collect()
      // the aggregate's exchange must partition on the computed key's
      // LONG hash (+ null flag), never on the computed term struct;
      // the struct appears only as min()'s combinable decode buffer
      val aggShuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.outputPartitioning
      }.collect { case h: HashPartitioning => h.expressions.map(_.dataType) }
      assert(aggShuffles.nonEmpty, "no hash exchange in the plan")
      aggShuffles.foreach { keyTypes =>
        assert(!keyTypes.exists(_.isInstanceOf[StructType]),
          s"exchange partitions on a term struct key: $keyTypes")
        assert(keyTypes.exists(_ == LongType),
          s"exchange key is not the 8-byte hash: $keyTypes")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("UNION with branch-partial vars dedups on nullable ids") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      // ?r is bound only in the right branch — before the r8 nullable
      // widening this whole shape fell back to the struct plane and
      // shipped term structs through the distinct exchange
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT DISTINCT ?name ?r WHERE { { ?n a :Nation . ?n :name ?name } " +
          "UNION { ?r a :Region . ?r :name ?name } }",
        encoded = Some(enc))
      df.collect()
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      assert(shuffles.nonEmpty, "no exchange found")
      // the DISTINCT itself must exchange pure ids (nullable ?r rides
      // as a null long); the decode dictionary's own join side
      // legitimately carries (id, term) — allow that single struct
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only distinct exchange — union fell back to structs: $shuffles")
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"an exchange carries more than the dictionary term: $out")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("OPTIONAL over UNION joins on nullable ids: exchanges carry longs") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      // the OPTIONAL right side is a UNION with branch-partial vars:
      // before the r9 nullable-id join this whole shape fell back to
      // the struct plane and shipped term structs through the outer
      // join's exchanges; now the join var exchanges as a long id and
      // partial vars ride as null longs
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT * WHERE { ?s :acctbal ?b . " +
          "OPTIONAL { { ?s :name ?nm } UNION { ?s :nation ?n } } }",
        encoded = Some(enc))
      df.collect()
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      assert(shuffles.nonEmpty, "no exchange found")
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only exchange — OPTIONAL-over-UNION fell back to " +
          s"structs: $shuffles")
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"an exchange carries more than the dictionary term: $out")
      }
      // the inner-join variant of the same shape (UNION leaf inside a
      // Join tree) must also stay on ids
      val dfJ = graft.sparql.Sparql.query(spark, q,
        "SELECT * WHERE { ?s :acctbal ?b . " +
          "{ ?s a :Customer . ?s :name ?nm } UNION { ?s :nation ?n } }",
        encoded = Some(enc))
      dfJ.collect()
      val shufflesJ = dfJ.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      assert(shufflesJ.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only exchange — UNION-in-join fell back to structs: $shufflesJ")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("all-nullable id join partitions: the bound slice hash-joins") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      // ?n — the ONLY shared var of the id join — is unbound on the
      // first UNION branch, so the §18.3 condition is purely
      // disjunctive (isNull OR equal): a single join can only plan a
      // nested loop over the FULL inputs. The partitioned rewrite must
      // hash-join (SortMergeJoin here — broadcast disabled) the
      // bound⋈bound slice and confine the nested loop to the
      // null slice, whose fan-out §18.3 requires.
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT * WHERE { { ?s a :Customer } UNION { ?s :nation ?n } . " +
          "?n :name ?nn }",
        encoded = Some(enc))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"),
        s"bound partition of the all-nullable id join does not hash/" +
          s"merge-join — whole join fell back to a nested loop:\n$p")
      // the left-OUTER analogue (OPTIONAL whose left is union-partial
      // on the only shared var): the left side partitions on the var,
      // the bound slice must merge-join
      val dfO = graft.sparql.Sparql.query(spark, q,
        "SELECT * WHERE { { ?s a :Customer } UNION { ?s :nation ?n } . " +
          "OPTIONAL { ?n :name ?nn } }",
        encoded = Some(enc))
      dfO.collect()
      val pO = dfO.queryExecution.executedPlan.toString
      assert(pO.contains("SortMergeJoin"),
        s"bound partition of the all-nullable id LEFT join does not " +
          s"merge-join:\n$pO")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("OPTIONAL joins ids: left-outer exchanges carry longs") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT ?s ?nm WHERE { ?s a :Supplier . OPTIONAL { ?s :nation ?n . ?n :name ?nm } }",
        encoded = Some(enc))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      // the left-outer probe sides must exchange longs; structs appear
      // only at the dictionary decode edge
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only exchange under OPTIONAL: $shuffles")
      shuffles.foreach { out =>
        assert(out.count(_.isInstanceOf[StructType]) <= 1,
          s"a shuffle carries struct-typed solution rows: $out")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("FILTER/BIND expressions: join keys stay long, one decoded arg") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{LongType, StructType}
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      for (text <- Seq(
        // value FILTER: the BGP join on ?c must exchange longs; only
        // ?b's decode dictionary join carries a term struct
        "SELECT ?c ?n WHERE { ?c :nation ?n . ?c :acctbal ?b . FILTER(?b > 1000) }",
        // BIND: same contract — expression arg decodes, keys stay ids
        "SELECT ?c ?n ?dbl WHERE { ?c :nation ?n . ?c :acctbal ?b . " +
          "BIND(?b * 2 AS ?dbl) }",
        // MID-GROUP BIND: hoistExtends must lift it above the join so
        // the tree still runs on ids
        "SELECT ?c ?n ?dbl WHERE { ?c :acctbal ?b . " +
          "BIND(?b * 2 AS ?dbl) . ?c :nation ?n }")) {
        val df = graft.sparql.Sparql.query(spark, q, text, encoded = Some(enc))
        val shuffles = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
        }
        assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
          s"no id-only exchange — expression shape fell to the struct " +
            s"plane: $shuffles\n$text")
        shuffles.foreach { out =>
          assert(out.count(_.isInstanceOf[StructType]) <= 1,
            s"an exchange carries more than the decoded expression arg: " +
              s"$out\n$text")
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("closure path: pair relation is built in id space") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.LongType
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val df = graft.sparql.Sparql.query(spark, q,
        "SELECT ?a ?b WHERE { ?a (:nation/:region)+ ?b }", encoded = Some(enc))
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
      }
      // the PSeq edge join inside the closure must shuffle longs only —
      // term structs entering here would multiply by fixpoint rounds
      assert(shuffles.exists(out => out.nonEmpty && out.forall(_ == LongType)),
        s"no id-only shuffle — closure edges not id-space: $shuffles")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("d_span_dup: gram hashes, never text, in every exchange") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.StringType
    // AQE wraps finalized stages (exchanges invisible to plan.collect);
    // the static plan shows the exchange structure being asserted
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.queries("d_span_dup")(spark, sf)
      df.collect()
      // nothing that crosses executors may carry raw text — check BOTH
      // exchange kinds (shuffle and broadcast)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: Exchange => e.child.output.map(_.dataType)
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { out =>
        assert(!out.exists(_ == StringType),
          s"an exchange carries a string column (raw text leaked): $out")
      }
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct"), s"cartesian in span-dup plan:\n$p")
      // document frequency must be a map-side-combinable count + join
      // back — a Window over gram would land a hot gram's whole
      // posting list on one task
      assert(!p.contains("Window"),
        s"span-dup still counts doc-freq with a per-gram window:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("per-source curation ops: no whole-source window sort") {
    // qualityPercentile and tokenBudget must run as range-partitioned
    // distributed prefix passes — a Window.partitionBy(source) sorts a
    // whole mega-source (tens of TB at corpus scale) on ONE task; only
    // sourceCap may keep its window (row_number <= cap triggers the
    // partial WindowGroupLimit below the exchange)
    for (name <- Seq("t_quality_percentile", "t_token_budget")) {
      val p = plan(name)
      assert(!p.contains("Window"),
        s"$name still sorts a whole source on one task:\n$p")
      // the map-only offset pass reads the checkpointed range layout
      // at the RDD level (mapPartitionsWithIndex for stage-stable
      // partition ids) — its plan is an object scan serialized back,
      // not a sort
      assert(p.contains("SerializeFromObject") && p.contains("Scan[obj"),
        s"$name is not the two-pass distributed prefix shape:\n$p")
    }
  }

  test("per-user event ops: no whole-user window sort") {
    // sessionize and rowNumberLag must run as range-partition +
    // boundary-merge passes (ext/EventWindows.scala) — a
    // Window.partitionBy(user_id) lands a 1e8-event bot on ONE task
    for (name <- Seq("w_sessionize", "w_row_number_lag")) {
      val p = plan(name)
      // match the physical operator ("Window [" / WindowGroupLimit),
      // not bare "Window" — the MapPartitions lambda's class name
      // (EventWindows) would false-positive
      assert(!p.contains("Window [") && !p.contains("WindowGroupLimit"),
        s"$name still sorts a whole user on one task:\n$p")
      // boundary-merge passes now run at the RDD level
      // (mapPartitionsWithIndex for stage-stable partition ids) —
      // the plan is an object scan serialized back, not a sort
      assert(p.contains("SerializeFromObject") && p.contains("Scan[obj"),
        s"$name is not the boundary-merge shape:\n$p")
    }
  }

  test("w_zscore_outliers: per-user stats broadcast back onto events") {
    val p = plan("w_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"stats side not broadcast (events would shuffle twice):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"user stats not partial-aggregated:\n$p")
  }

  test("global-rank gates: no single-partition Window anywhere") {
    // w_rfm (three unpartitioned ntile(4)s), q_cume_dist (3-value
    // partition key), q_skyline_2d (unpartitioned prefix-min) were the
    // r11 scale-audit demotions: correct answers through ONE window
    // task. All three now run the Ranks boundary-merge passes — their
    // executed plans must carry NO physical Window operator at all
    // (match "Window [" / WindowGroupLimit, not bare "Window": a
    // lambda class name could false-positive)
    for (name <- Seq("w_rfm", "q_cume_dist", "q_skyline_2d")) {
      val p = plan(name)
      assert(!p.contains("Window [") && !p.contains("WindowGroupLimit"),
        s"$name still funnels a global sort through one window task:\n$p")
      // Row-based createDataFrame plans read "Scan ExistingRDD";
      // typed-Dataset passes read SerializeFromObject + Scan[obj —
      // either proves the rank ran at the RDD level, not a Window
      assert(p.contains("Scan ExistingRDD") ||
        (p.contains("SerializeFromObject") && p.contains("Scan[obj")),
        s"$name is not the boundary-merge distributed-rank shape:\n$p")
    }
  }

  test("correlated union EXISTS: one tagged probe, no nested-loop joins") {
    // the r13 branch-discriminator hoist: EXISTS over an 8-branch
    // correlated UNION must compile to a SINGLE semi join against one
    // branch-tagged probe — per-branch distribution ran 8 probe
    // pipelines, and the flag path's null-tolerant compat dropped to
    // BroadcastNestedLoopJoin per flag (the two shapes this pin
    // forbids regressing into)
    val p = plan("r_exists_union_wide")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"union EXISTS fell off the equi-join plane:\n$p")
    // AQE prints final + initial plans — count the FINAL section only
    val finalP = p.split("== Initial Plan ==").head
    val semis = "LeftSemi".r.findAllIn(finalP).size
    assert(semis == 1,
      s"expected exactly ONE semi join (the tagged probe), found $semis:\n$finalP")
  }

  test("correlated EXISTS decorrelates on the id plane (r14)") {
    // the r13 verdict's top item: the correlated-EXISTS family must
    // join on 8-byte term ids with no probe-side dictionary decode —
    // pinned via the corrIdExistsJoins telemetry counter (the path
    // could otherwise silently fall back to the struct plane) and via
    // shuffle payloads: no exchange may carry more than the one
    // decode-edge struct
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StructType
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.rdf.TpchRdf.graphDf(spark, sf)
      val enc = graft.core.EncodedQuads(
        graft.core.TermDictionary.encode(q), graft.core.TermDictionary.build(q))
      val Sp = graft.sparql.Sparql
      val queries = Seq(
        // plain decorrelated shape (outer-read condition)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS { ?c :nation ?n . FILTER(?bal >= 7500) } }""",
        // hoisted-BIND shape (condition reads the hoisted bind var)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS { ?c :nation ?n .
               BIND(?bal * 2 AS ?x) FILTER(?x >= 15000) } }""",
        // wide correlated UNION (>3 branches → the discriminator
        // hoist, ONE tagged probe with literal const columns)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS {
               { ?c :mktsegment "BUILDING" . FILTER(?bal > 1000) }
               UNION { ?c :mktsegment "AUTOMOBILE" . FILTER(?bal > 2000) }
               UNION { ?c :nation ?n . FILTER(?bal > 9000) }
               UNION { ?c a :Customer . FILTER(?bal < 0) } } }""",
        // per-key MINUS (correlation under negation — the key-frame
        // machinery, here the id twin)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS { ?c :nation ?n
               MINUS { ?c :nation ?n . FILTER(?bal >= 7500) } } }""",
        // per-key visible OPTIONAL (BOUND reads the optional side)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS { ?c :nation ?n .
               OPTIONAL { ?n :name ?nm . FILTER(?bal >= 7500) }
               FILTER(BOUND(?nm)) } }""",
        // per-key aggregation (grouping on ids, HAVING decoded on the
        // grouped frame)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS { { SELECT ?c (COUNT(?o) AS ?n) WHERE {
                 ?o :custkey ?c . FILTER(?bal >= 7500) }
               GROUP BY ?c HAVING(?n >= 3) } } }""",
        // empty-group HAVING (implicit group, §18.5.1 empty multiset)
        """SELECT ?c ?bal WHERE { ?c :acctbal ?bal .
             FILTER EXISTS { { SELECT (COUNT(?o) AS ?n) WHERE {
                 ?o :custkey ?c . FILTER(?bal >= 7500) }
               HAVING(?n = 0) } } }""")
      for (text <- queries) {
        val before = Sp.corrIdExistsJoins.get()
        val df = Sp.query(spark, q, text, encoded = Some(enc))
        assert(Sp.corrIdExistsJoins.get() == before + 1,
          s"id-plane correlated EXISTS did not fire for:\n$text")
        df.collect()
        val shuffles = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.child.output.map(_.dataType)
        }
        shuffles.foreach { out =>
          assert(out.count(_.isInstanceOf[StructType]) <= 1,
            s"a shuffle carries struct-typed solution rows: $out")
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("bucketed tables co-locate the join: zero exchange, shuffle-join parity") {
    // SURVEY §2's partitioning toolkit, pinned: writing both join
    // sides bucketed by the key lets the join read pre-shuffled data
    // — NO Exchange in the executed plan even with broadcast disabled.
    // The repeated-join lever for a 100 TB fact table: pay the
    // shuffle once at write time, never per query.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val o = graft.core.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.core.Tables(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val bc2 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe2 = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps stages in adaptive nodes the ShuffleExchangeExec
    // collect below would not traverse — pin the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$dir/b_orders").saveAsTable("b_orders")
      c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$dir/b_cust").saveAsTable("b_cust")
      val j = spark.table("b_orders")
        .join(spark.table("b_cust"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      j.collect()
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles:\n${j.queryExecution.executedPlan}")
      // parity with the plain (shuffled) join on the source frames
      val want = o.join(c, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val got = j.collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got.nonEmpty && got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc2)
      spark.conf.set("spark.sql.adaptive.enabled", aqe2)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(dir.toFile)
    }
  }
  test("equi-depth write: one exchange, balanced buckets, pruned read-back") {
    // r17: the sketch's equal-population boundaries feeding a bucketed
    // write — the skew-immune range layout (a raw value-range
    // partitionBy puts a hot range in one directory). Pins: the write
    // frame pays exactly ONE exchange (the repartition onto buckets),
    // the buckets land balanced, and a per-bucket read-back prunes to
    // one partition directory.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.{col, expr}
    val dir = java.nio.file.Files.createTempDirectory("graft_eqd").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = graft.core.Tables(spark, sf, "lineitem")
      val bucketed = graft.ext.Sketches.equiDepthWrite(li,
        expr("l_orderkey * 8 + l_linenumber"),
        expr("CAST(round(l_extendedprice * 100) AS LONG)"),
        s"$dir/out", buckets = 8)
      val shuffles = bucketed.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.length == 1,
        s"equi-depth write must pay exactly one exchange:\n" +
          bucketed.queryExecution.executedPlan)
      // equal-population: max bucket ≤ 2× min bucket on real data
      val counts = spark.read.parquet(s"$dir/out")
        .groupBy("bucket").count().collect().map(_.getLong(1))
      assert(counts.length == 8, s"expected 8 buckets, got ${counts.length}")
      assert(counts.max <= 2 * counts.min,
        s"buckets unbalanced: ${counts.toSeq.sorted}")
      // read-back with a bucket predicate prunes to ONE directory
      val one = spark.read.parquet(s"$dir/out").filter(col("bucket") === 3)
      one.collect()
      val scanStr = one.queryExecution.executedPlan.toString()
      assert(scanStr.contains("PartitionFilters") &&
        scanStr.contains("bucket"),
        s"bucket read-back is not partition-pruned:\n$scanStr")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("r15 pipeline operators: map-only passes + one bounded-key exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.{col, expr}
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.count()
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }.size
    }
    val li = graft.core.Tables(spark, sf, "lineitem")
    // equi-depth bucketing: the register collect happens driver-side
    // (TakeOrdered jobs); the BUCKETING pass itself is one map-side
    // fold + ONE exchange onto <= buckets keys
    val eq = graft.ext.Sketches.equiDepthHistogram(li,
      expr("l_orderkey * 8 + l_linenumber"),
      expr("CAST(round(l_extendedprice * 100) AS LONG)"))
    assert(shuffles(eq) <= 1, "equi-depth bucketing must be one exchange")
    // BPE encode: merge ranks inlined as literals -> one map-only
    // replace chain + ONE exchange for the per-doc combinable counts
    val docs = graft.core.Tables(spark, sf, "documents")
    val merges = graft.ext.TextAnalysis.bpeMergeSeq(docs, rounds = 2)
    val enc = graft.ext.TextAnalysis.bpeEncodeCounts(docs, merges.map(_._1))
    assert(shuffles(enc) <= 1, "BPE encode must be map-only + one exchange")
    // sketch registers: a pure map-side FILTER - zero exchanges
    val regs = graft.ext.Sketches.sketchRegisters(
      li.select(expr("CAST(l_orderkey * 8 + l_linenumber AS STRING)").as("k"),
        expr("CAST(round(l_extendedprice * 100) AS LONG)").as("v")),
      col("k"), col("v"), 4)
    assert(shuffles(regs) == 0, "sketch registers must be a map-only filter")
  }
}

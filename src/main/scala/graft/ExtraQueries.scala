package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Dedup, Multimodal}
import Queries.Q

/** Relational long-tail + multimodal registry entries: grouping
  * analytics (ROLLUP/CUBE/PIVOT), as-of and band joins, exact
  * percentiles, deterministic hash sampling, explode/token
  * aggregation, scalar subqueries, date/string function bundles, and
  * the multimodal decode/resize/frame pipeline over binary columns.
  */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val relationalExtra: Seq[Q] = Seq(

    Q("q_rollup", (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty")),
      Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    Q("q_cube", (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n")),
      Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    Q("q_pivot", (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1))),
      Some("""
      SELECT o_orderstatus,
             sum(CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS "1-URGENT",
             sum(CASE WHEN o_orderpriority='2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS "2-HIGH",
             sum(CASE WHEN o_orderpriority='3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT AS "3-MEDIUM",
             sum(CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN 1 ELSE 0 END)::BIGINT AS "4-NOT SPECIFIED",
             sum(CASE WHEN o_orderpriority='5-LOW' THEN 1 ELSE 0 END)::BIGINT AS "5-LOW"
      FROM orders GROUP BY o_orderstatus""")),

    Q("q_asof_join", (s, dir) => {
      // as-of: latest event of the matching user at/before the order
      // date. Composed from existing ops (SURVEY §2.B custom-operator
      // preference (a)): equi-join on the key → keep only ts ≤ t →
      // max-by over the window. The shuffle key is the user, so this
      // scales like any keyed join; a sort-merge interval variant is
      // the optimization path, not a semantic change.
      val o = t(s, dir, "orders").filter(col("o_custkey") < 150)
      val e = t(s, dir, "events")
        .select(col("user_id"), col("ts_ns"), col("value"))
      val joined = o.join(e,
        col("o_custkey") === col("user_id") &&
          col("ts_ns") <= unix_micros(col("o_orderdate").cast("timestamp")) * 1000,
        "left")
      joined.groupBy(col("o_orderkey"))
        .agg(max_by(struct(col("ts_ns"), col("value")), col("ts_ns")).as("last"))
        .select(col("o_orderkey"), col("last")("ts_ns").as("event_ts_ns"),
          col("last")("value").as("event_value"))
    }, Some("""
      SELECT o_orderkey,
             epoch_ns(e.ts)::BIGINT AS event_ts_ns,
             e.value AS event_value
      FROM (SELECT * FROM orders WHERE o_custkey < 150) o
      ASOF LEFT JOIN events e
        ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate""")),

    // nearest-event as-of (both directions): the closest event in
    // absolute time per order, tie to the earlier event — the sensor/
    // feature-alignment variant of the backward as-of. Same keyed-join
    // shape (shuffle key = user); the argmin is ONE min(struct) with a
    // lexicographic (|dt|, ts) key, combinable map-side.
    Q("q_asof_nearest", (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_custkey") < 150)
      val e = t(s, dir, "events")
        .select(col("user_id"), col("ts_ns"), col("value"))
      val odNs = unix_micros(col("o_orderdate").cast("timestamp")) * 1000
      o.join(e, col("o_custkey") === col("user_id"), "left")
        .groupBy(col("o_orderkey"))
        .agg(min(struct(abs(col("ts_ns") - odNs).as("adt"),
          col("ts_ns").as("ts_ns"), col("value").as("value"))).as("best"))
        .select(col("o_orderkey"),
          col("best")("ts_ns").as("event_ts_ns"),
          col("best")("value").as("event_value"))
    }, Some("""
      SELECT o_orderkey, event_ts_ns, event_value FROM (
        SELECT o.o_orderkey, epoch_ns(e.ts)::BIGINT AS event_ts_ns,
               e.value AS event_value,
               row_number() OVER (PARTITION BY o.o_orderkey
                 ORDER BY abs(epoch_ns(e.ts) - epoch_ns(o.o_orderdate::TIMESTAMP)),
                          epoch_ns(e.ts), e.value) AS rn
        FROM (SELECT * FROM orders WHERE o_custkey < 150) o
        LEFT JOIN events e ON o.o_custkey = e.user_id)
      WHERE rn = 1""")),

    // 2-D skyline (Pareto frontier minimizing price and size): the
    // scalable one-sort realization — combinable per-price min(size),
    // a DISTRIBUTED exclusive prefix-min over the distinct-price
    // frame (Ranks.prefixMinLong: the distinct-price cardinality
    // grows with the part table, so an unpartitioned window would be
    // one task at 100×; the boundary merge carries ONE long per
    // partition), then a broadcast-back filter; the oracle states the
    // quadratic NOT-EXISTS domination definition directly.
    // Integer-cent prices.
    Q("q_skyline_2d", (s, dir) => {
      val parts = t(s, dir, "part").select(col("p_partkey"),
        round(col("p_retailprice") * lit(100.0), 0).cast("long")
          .as("price_cents"),
        col("p_size").cast("long").as("p_size"))
      val perPrice = parts.groupBy("price_cents")
        .agg(min("p_size").as("msize"))
      val frontier = graft.ext.Ranks
        .prefixMinLong(perPrice, Seq(col("price_cents").asc),
          "msize", "prev_min")
        .where(col("prev_min").isNull || col("msize") < col("prev_min"))
        .select(col("price_cents"), col("msize"))
      parts.join(broadcast(frontier), Seq("price_cents"))
        .where(col("p_size") === col("msize"))
        .select("p_partkey", "price_cents", "p_size")
    }, Some("""
      WITH p AS (SELECT p_partkey,
                   CAST(round(p_retailprice*100.0) AS BIGINT) AS price_cents,
                   p_size::BIGINT AS p_size
                 FROM part)
      SELECT p_partkey, price_cents, p_size FROM p a
      WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
          AND (b.price_cents < a.price_cents OR b.p_size < a.p_size))""")),

    Q("q_band_join", (s, dir) => {
      // band (range) join: tiny bounds table broadcast → nested-loop
      // range probe, no shuffle of the big side
      val bands = (s.createDataFrame(Seq(
        ("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1.0e9)))
        .toDF("band", "lo", "hi"))
      t(s, dir, "part").join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          (round(avg("p_size") * lit(1e4), 0)
            .cast("long").cast("double") / lit(1e4)).as("avg_size"))
    }, Some("""
      WITH bands(band, lo, hi) AS (VALUES
        ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0), ('premium', 1200.0, 1.0e9))
      SELECT band, count(*) AS n,
             CAST(round(avg(p_size) * 10000.0) AS BIGINT)::DOUBLE / 10000.0 AS avg_size
      FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band""")),

    Q("q_percentiles", (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          (round(expr("percentile(l_quantity, 0.5)") * lit(1e6), 0)
            .cast("long").cast("double") / lit(1e6)).as("p50"),
          (round(expr("percentile(l_quantity, 0.9)") * lit(1e6), 0)
            .cast("long").cast("double") / lit(1e6)).as("p90"),
          (round(expr("percentile(l_extendedprice, 0.25)") * lit(1e6), 0)
            .cast("long").cast("double") / lit(1e6)).as("price_p25")),
      Some("""
      SELECT l_returnflag,
             CAST(round(quantile_cont(l_quantity, 0.5) * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0 AS p50,
             CAST(round(quantile_cont(l_quantity, 0.9) * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0 AS p90,
             CAST(round(quantile_cont(l_extendedprice, 0.25) * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0 AS price_p25
      FROM lineitem GROUP BY l_returnflag""")),

    Q("q_sample_hash", (s, dir) =>
      // deterministic ~10% sample: first hex byte of md5(key) < 0x1a —
      // reproducible across engines and runs, unlike rand()-based
      // sampling (engine-independent hashing rule as in Dedup)
      t(s, dir, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "1a")
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'""")),

    Q("q_explode_tokens", (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 200)
        .orderBy(col("n").desc, col("token").asc),
      Some("""
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token HAVING count(*) >= 200
      ORDER BY n DESC, token ASC""")),

    Q("q_scalar_subquery", (s, dir) => {
      val o = t(s, dir, "orders")
      val avgPrice = o.agg(avg("o_totalprice")).head.getDouble(0)
      o.filter(col("o_totalprice") > avgPrice)
        .select(col("o_orderkey"), col("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""")),

    // correlated scalar subquery (orders above their own customer's
    // average): realized as the decorrelated groupBy + join-back every
    // engine plans for this shape. The per-customer average divides an
    // exact integer-cent sum, so the strict > never sits on a
    // float-summation-order knife edge cross-engine
    Q("q_correlated_scalar", (s, dir) => {
      val o = t(s, dir, "orders")
      val ap = o.groupBy(col("o_custkey").as("k"))
        .agg((sum(round(col("o_totalprice") * 100, 0).cast("long")) / 100.0 /
          count(lit(1))).as("ap"))
      o.join(ap, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > col("ap"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > (
        SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT)) / 100.0
               / count(*)
        FROM orders i WHERE i.o_custkey = o.o_custkey)""")),

    Q("q_date_funcs", (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("due_date"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_eoy")),
      Some("""
      SELECT o_orderkey,
             year(o_orderdate)::BIGINT AS yr, month(o_orderdate)::BIGINT AS mo,
             day(o_orderdate)::BIGINT AS dom,
             CAST((CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)::DATE AS VARCHAR) AS due_date,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')::BIGINT AS days_to_eoy
      FROM orders""")),

    Q("q_string_funcs", (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("u"),
        substring(col("c_name"), 1, 8).as("prefix"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(col("c_name")).cast("long").as("len")),
      Some("""
      SELECT c_custkey, upper(c_name) AS u, substring(c_name, 1, 8) AS prefix,
             regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
             lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
             concat_ws('|', c_mktsegment, c_name) AS joined,
             length(c_name)::BIGINT AS len
      FROM customer"""))
  )

  /** Shared DuckDB CTE block computing [[Multimodal.pHash]]'s 64-point
    * Walsh-Hadamard hash bit for bit: decode payload bytes from
    * hex(encode(text)), 64 floor-grid window sums, coefficient ci =
    * sum over cj of +/-ws[cj] by popcount(ci&cj) parity, sign bits
    * OR'd into a signed 64-bit value (bit 63 via the Long.MinValue
    * literal -- DuckDB's `1::BIGINT << 63` overflows). With
    * `variants`, mirrors [[Multimodal.withNearDupVariants]]'s
    * same-length xor-7-every-4th-byte copies of every tenth doc.
    */
  private def phashOracleCtes(variants: Boolean): String = {
    val v =
      if (variants) """v AS (SELECT doc_id, bs0 AS bs FROM b
        UNION ALL
        SELECT doc_id + 1000000,
               list_transform(bs0, (x, i) ->
                 CASE WHEN (i-1) % 4 = 0 THEN xor(x, 7::BIGINT) ELSE x END)
        FROM b WHERE doc_id % 10 = 0)"""
      else "v AS (SELECT doc_id, bs0 AS bs FROM b)"
    s"""b AS MATERIALIZED (SELECT doc_id,
             list_transform(range(1, octet_length(encode(text))+1),
               i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT) AS bs0
           FROM documents),
      $v,
      w AS (SELECT doc_id, len(bs) AS n,
              list_reduce(list_prepend(0::BIGINT, bs), (a,x)->a+x) AS total,
              list_transform(range(0,64), wi ->
                list_reduce(list_prepend(0::BIGINT,
                  bs[((wi*len(bs))//64)+1:((wi+1)*len(bs))//64]), (a,x)->a+x)) AS ws
            FROM v),
      p AS MATERIALIZED (SELECT doc_id,
             ((CASE WHEN ws[1]*n > total*(n//64) THEN 1::BIGINT ELSE 0::BIGINT END)
              + list_reduce(list_prepend(0::BIGINT, list_transform(range(1,64), ci ->
                  CASE WHEN list_reduce(list_prepend(0::BIGINT,
                         list_transform(range(0,64), cj ->
                           CASE WHEN bit_count(ci::BIGINT & cj::BIGINT) % 2 = 0
                                THEN ws[cj+1] ELSE -ws[cj+1] END)), (a,x)->a+x) > 0
                       THEN CASE WHEN ci = 63 THEN (-9223372036854775808)::BIGINT
                                 ELSE (1::BIGINT << ci) END
                       ELSE 0::BIGINT END)), (a,x)->a+x))::BIGINT AS phash
           FROM w)"""
  }

  private val multimodal: Seq[Q] = Seq(

    Q("m_decode_meta", (s, dir) => {
      import s.implicits._
      Multimodal.decodeMeta(
        Multimodal.withBinary(t(s, dir, "documents")).as[Multimodal.Media]).toDF()
    }, Some("""
      SELECT doc_id,
             CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             octet_length(encode(text))::BIGINT AS byte_len,
             (64 + (octet_length(encode(text))*7 + doc_id) % 1217)::BIGINT AS width,
             (64 + (octet_length(encode(text))*13) % 689)::BIGINT AS height,
             (1 + doc_id % 3)::BIGINT AS channels
      FROM documents""")),

    // media fingerprint dedup: full 64-bit Walsh-Hadamard pHash over
    // the payload bytes (64 floor-grid window sums -> WHT sign bits;
    // bit 0 = window-0-vs-mean since the DC sign is constant) -- pure
    // +/-1 integer weights keep the hash bit-identical across engines.
    // The oracle decodes PAYLOAD BYTES from hex(encode(text)) --
    // byte-accurate like the sibling octet_length oracles, no ASCII
    // assumption -- and mirrors the transform with nested list
    // lambdas (validated against the Scala hash on both fixtures).
    Q("m_phash_dedup", (s, dir) => {
      import s.implicits._
      Multimodal.pHash(
        Multimodal.withBinary(t(s, dir, "documents")).as[Multimodal.Media]).toDF()
    }, Some(s"""
      WITH ${phashOracleCtes(variants = false)}
      SELECT doc_id, phash FROM p""")),

    // banded-Hamming media near-dup: pigeonhole-exact candidate pairs
    // over the 64-bit pHash (4 SIXTEEN-bit bands cover hamming <= 3),
    // verified by popcount of the xor -- the media twin of MinHash
    // banding: the join ships 8-byte hashes, never payloads. The
    // input is the co-designed union of documents with
    // substitution-class variants (withNearDupVariants): true pairs
    // exist at hamming 0-3 AND some variants land above the cutoff,
    // so the gate certifies a non-empty result and a working
    // threshold (the closest pair of distinct ORIGINALS is at
    // hamming 14 on both fixtures -- no accidental crosses).
    Q("m_phash_neardup", (s, dir) => {
      import s.implicits._
      Multimodal.phashNearDupPairs(
        Multimodal.pHash(
          Multimodal.withNearDupVariants(
            Multimodal.withBinary(t(s, dir, "documents"))
              .as[Multimodal.Media])).toDF())
    }, Some(s"""
      WITH ${phashOracleCtes(variants = true)},
      bnd AS (SELECT doc_id, phash, band_id,
                     (phash >> (16*band_id)::INT) & 65535 AS band_val
              FROM p, (SELECT unnest(range(0,4)) AS band_id)),
      okb AS (SELECT band_id, band_val FROM bnd
              GROUP BY 1, 2 HAVING count(*) <= 10000),
      capped AS MATERIALIZED (SELECT bnd.*
                              FROM bnd JOIN okb USING (band_id, band_val))
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             bit_count(xor(a.phash, b2.phash))::BIGINT AS hamming
      FROM capped a JOIN capped b2
        ON a.band_id = b2.band_id AND a.band_val = b2.band_val
           AND a.doc_id < b2.doc_id
      WHERE bit_count(xor(a.phash, b2.phash)) <= 3""")),

    // REAL codec path (r13, promoted from the stub slot): wavify
    // wraps payload bytes as canonical RIFF/PCM WAV and decodeWav
    // PARSES the stream by the format spec (magics, little-endian
    // header fields at their offsets, one-pass 16-bit PCM stats).
    // The oracle CONSTRUCTS the same byte stream in SQL and parses
    // it back from list positions — both sides do byte-level work.
    Q("m_wav_decode", (s, dir) => {
      import s.implicits._
      Multimodal.decodeWav(
        Multimodal.wavify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media])).toDF()
    }, Some("""
      WITH b AS MATERIALIZED (SELECT doc_id,
           list_transform(range(1, octet_length(encode(text))+1),
             i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT) AS tb
         FROM documents),
      wav AS MATERIALIZED (SELECT doc_id,
          [82::BIGINT,73,70,70]
          || [ (36 + 2*len(tb)) % 256, ((36 + 2*len(tb)) // 256) % 256,
               ((36 + 2*len(tb)) // 65536) % 256, ((36 + 2*len(tb)) // 16777216) % 256 ]
          || [87::BIGINT,65,86,69, 102,109,116,32, 16,0,0,0, 1,0, 1,0]
          || [ sr % 256, (sr // 256) % 256, (sr // 65536) % 256, 0 ]
          || [ (sr*2) % 256, ((sr*2) // 256) % 256, ((sr*2) // 65536) % 256, 0 ]
          || [2::BIGINT,0, 16,0, 100,97,116,97]
          || [ (2*len(tb)) % 256, ((2*len(tb)) // 256) % 256,
               ((2*len(tb)) // 65536) % 256, ((2*len(tb)) // 16777216) % 256 ]
          || flatten(list_transform(tb, x -> [ 0::BIGINT, (((x-128)*256) & 65535) // 256 ]))
          AS bs
        FROM (SELECT doc_id, tb, (8000 + (doc_id % 3) * 4000)::BIGINT AS sr FROM b)),
      parsed AS (SELECT doc_id,
          (bs[1]=82 AND bs[2]=73 AND bs[3]=70 AND bs[4]=70
           AND bs[9]=87 AND bs[10]=65 AND bs[11]=86 AND bs[12]=69
           AND bs[13]=102 AND bs[14]=109 AND bs[15]=116 AND bs[16]=32
           AND bs[37]=100 AND bs[38]=97 AND bs[39]=116 AND bs[40]=97
           AND bs[17] + 256*bs[18] + 65536*bs[19] + 16777216*bs[20] = 16
           AND bs[33] + 256*bs[34] > 0) AS valid,
          bs[21] + 256*bs[22] AS fmt,
          bs[23] + 256*bs[24] AS channels,
          bs[25] + 256*bs[26] + 65536*bs[27] + 16777216*bs[28] AS sample_rate,
          bs[33] + 256*bs[34] AS block_align,
          bs[35] + 256*bs[36] AS bits,
          bs[41] + 256*bs[42] + 65536*bs[43] + 16777216*bs[44] AS data_len,
          bs
        FROM wav),
      absam AS (SELECT doc_id, valid, fmt, channels, sample_rate,
          block_align, bits, data_len,
          list_transform(range(0, data_len // 2), i ->
            CASE WHEN bs[45 + 2*i] + 256*bs[46 + 2*i] >= 32768
                 THEN 65536 - bs[45 + 2*i] - 256*bs[46 + 2*i]
                 ELSE bs[45 + 2*i] + 256*bs[46 + 2*i] END) AS absl
        FROM parsed)
      SELECT doc_id, fmt::BIGINT AS fmt, channels::BIGINT AS channels,
        sample_rate::BIGINT AS sample_rate, bits::BIGINT AS bits,
        (data_len // block_align)::BIGINT AS n_samples,
        ((data_len // block_align) * 1000 // sample_rate)::BIGINT AS dur_ms,
        list_max(list_prepend(0::BIGINT, absl))::BIGINT AS peak,
        list_reduce(list_prepend(0::BIGINT, absl), (a,x)->a+x)::BIGINT AS sum_abs,
        valid
      FROM absam""")),

    // media dup CLUSTERS (r13): the banded pHash pairs connected into
    // components (driver union-find ↔ GraphX CC past 1M pairs — the
    // same policy switch as d_dup_clusters), over the co-designed
    // variant fixture — the terminal grouping step of a media dedup
    Q("m_phash_clusters", (s, dir) => {
      import s.implicits._
      Dedup.dupClusters(s,
        Multimodal.phashNearDupPairs(
          Multimodal.pHash(
            Multimodal.withNearDupVariants(
              Multimodal.withBinary(t(s, dir, "documents"))
                .as[Multimodal.Media])).toDF())
          .select("doc_a", "doc_b"))
    }, Some(s"""
      WITH RECURSIVE ${phashOracleCtes(variants = true)},
      bnd AS (SELECT doc_id, phash, band_id,
                     (phash >> (16*band_id)::INT) & 65535 AS band_val
              FROM p, (SELECT unnest(range(0,4)) AS band_id)),
      okb AS (SELECT band_id, band_val FROM bnd
              GROUP BY 1, 2 HAVING count(*) <= 10000),
      capped AS MATERIALIZED (SELECT bnd.*
                              FROM bnd JOIN okb USING (band_id, band_val)),
      ph AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
             FROM capped a JOIN capped b2
               ON a.band_id = b2.band_id AND a.band_val = b2.band_val
                  AND a.doc_id < b2.doc_id
             WHERE bit_count(xor(a.phash, b2.phash)) <= 3),
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM ph
        UNION ALL SELECT doc_b, doc_a FROM ph
        UNION ALL SELECT doc_a, doc_a FROM ph
        UNION ALL SELECT doc_b, doc_b FROM ph),
      reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT reach.a, e.b FROM reach JOIN edges e ON e.a = reach.b)
      SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a""")),

    // ViT patch-grid plan: ceil-division tiling + padding + token
    // count — integer metadata math, payload pruned at the scan
    Q("m_patch_grid", (s, dir) => {
      import s.implicits._
      Multimodal.patchGrid(
        Multimodal.decodeMeta(
          Multimodal.withBinary(t(s, dir, "documents")).as[Multimodal.Media]), 16)
    }, Some("""
      WITH meta AS (
        SELECT doc_id,
               (64 + (octet_length(encode(text))*7 + doc_id) % 1217)::BIGINT AS width,
               (64 + (octet_length(encode(text))*13) % 689)::BIGINT AS height
        FROM documents)
      SELECT doc_id, width, height,
             (width + 15) // 16 AS grid_x,
             (height + 15) // 16 AS grid_y,
             ((width + 15) // 16) * ((height + 15) // 16) AS n_patches,
             ((width + 15) // 16) * 16 - width AS pad_x,
             ((height + 15) // 16) * 16 - height AS pad_y,
             ((width + 15) // 16) * ((height + 15) // 16) + 1 AS n_tokens
      FROM meta""")),

    Q("m_resize_plan", (s, dir) => {
      import s.implicits._
      Multimodal.resizePlan(
        Multimodal.decodeMeta(
          Multimodal.withBinary(t(s, dir, "documents")).as[Multimodal.Media]), 256)
    }, Some("""
      WITH meta AS (
        SELECT doc_id,
               (64 + (octet_length(encode(text))*7 + doc_id) % 1217) AS w,
               (64 + (octet_length(encode(text))*13) % 689) AS h
        FROM documents)
      SELECT doc_id,
             floor(w * least(256.0/w, 256.0/h, 1.0))::BIGINT AS out_width,
             floor(h * least(256.0/w, 256.0/h, 1.0))::BIGINT AS out_height
      FROM meta""")),

    Q("m_frame_sample", (s, dir) => {
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.withBinary(t(s, dir, "documents")).as[Multimodal.Media]).toDF()
    }, Some("""
      WITH f AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               unnest(range(0, 1 + octet_length(encode(text)) % 7)) AS frame_idx
        FROM documents)
      SELECT doc_id, frame_idx::BIGINT AS frame_idx,
             md5(substring(text, ((frame_idx*17) % greatest(n-32, 1))::BIGINT + 1, 32)) AS frame_md5
      FROM f""")),

    // audio segmentation plan: Whisper-style 30s windows / 5s overlap
    // over a stub 16kHz-mono duration (real decode fills this slot);
    // the ceil-division window schedule of t_chunk_windows applied to
    // time — map-only; only the payload byte length is consumed
    // segment schedule over the PARSED WAV duration (r13): the same
    // ceil-division windows as m_audio_segments, but dur_ms comes
    // from decodeWav's real header parse (n_samples/sample_rate per
    // the RIFF fields) — 20/15 ms windows sized to the fixture's
    // parsed durations so docs genuinely split into multiple segments
    Q("m_wav_segments", (s, dir) => {
      import s.implicits._
      Multimodal.wavSegments(
        Multimodal.wavify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media]), segMs = 20, strideMs = 15)
    }, Some("""
      WITH a AS (
        SELECT doc_id,
               (octet_length(encode(text)) * 1000)
                 // (8000 + (doc_id % 3) * 4000) AS dur_ms
        FROM documents),
      k AS (SELECT doc_id, dur_ms,
                   greatest(0, (dur_ms - 20 + 14) // 15) AS k
            FROM a),
      st AS (SELECT doc_id, dur_ms,
                    unnest(generate_series(0, k * 15, 15)) AS start_ms
             FROM k)
      SELECT doc_id, CAST(start_ms / 15 AS BIGINT) AS seg_idx,
             start_ms::BIGINT AS start_ms,
             least(20, dur_ms - start_ms)::BIGINT AS seg_ms
      FROM st""")),

    // REAL image codec (r14 — the BMP sibling of m_wav_decode,
    // closing the image half of the stub slot): bmpify wraps payload
    // bytes as a canonical 24-bit gray BMP (bottom-up rows, 4-byte
    // stride padding, every header field at its spec offset; docs
    // with doc_id % 97 == 0 get a corrupted magic) and decodeBmp
    // PARSES the stream by the spec into integer luminance stats.
    // The oracle CONSTRUCTS the same byte stream in SQL and parses
    // it back from list positions — corrupt rows fail its own
    // validity checks and emit the zeroed rejection row, exactly as
    // the Scala parser does.
    Q("m_bmp_decode", (s, dir) => {
      import s.implicits._
      Multimodal.decodeBmp(
        Multimodal.bmpify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media])).toDF()
    }, Some("""
      WITH b AS MATERIALIZED (SELECT doc_id,
           list_transform(range(1, octet_length(encode(text))+1),
             i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT) AS tb
         FROM documents),
      dims AS (SELECT doc_id, tb, len(tb) AS n,
          (8 + doc_id % 25)::BIGINT AS w,
          greatest(1, (len(tb) + (8 + doc_id % 25) - 1)
                       // (8 + doc_id % 25))::BIGINT AS h,
          ((3*(8 + doc_id % 25) + 3) // 4 * 4)::BIGINT AS stride
        FROM b),
      bmp AS MATERIALIZED (SELECT doc_id,
          [ CASE WHEN doc_id % 97 = 0 THEN 88::BIGINT ELSE 66::BIGINT END, 77 ]
          || [ (54 + stride*h) % 256, ((54 + stride*h) // 256) % 256,
               ((54 + stride*h) // 65536) % 256,
               ((54 + stride*h) // 16777216) % 256 ]
          || [0::BIGINT,0,0,0, 54,0,0,0, 40,0,0,0]
          || [ w % 256, (w // 256) % 256, 0::BIGINT, 0 ]
          || [ h % 256, (h // 256) % 256, 0::BIGINT, 0 ]
          || [1::BIGINT,0, 24,0, 0,0,0,0]
          || [ (stride*h) % 256, ((stride*h) // 256) % 256,
               ((stride*h) // 65536) % 256, 0::BIGINT ]
          || [19::BIGINT,11,0,0, 19,11,0,0, 0,0,0,0, 0,0,0,0]
          || flatten(list_transform(range(0, h), yy ->
               flatten(list_transform(range(0, w), x ->
                 CASE WHEN (h-1-yy)*w + x < n
                      THEN [ tb[((h-1-yy)*w + x + 1)::INT],
                             tb[((h-1-yy)*w + x + 1)::INT],
                             tb[((h-1-yy)*w + x + 1)::INT] ]
                      ELSE [0::BIGINT,0,0] END))
               || list_transform(range(0, stride - 3*w), z -> 0::BIGINT)))
          AS bs
        FROM dims),
      parsed AS (SELECT doc_id, bs,
          bs[19] + 256*bs[20] + 65536*bs[21] + 16777216*bs[22] AS pw,
          bs[23] + 256*bs[24] + 65536*bs[25] + 16777216*bs[26] AS ph
        FROM bmp),
      checked AS (SELECT doc_id, bs, pw, ph,
          ((3*pw + 3) // 4 * 4) AS pstride,
          (bs[1]=66 AND bs[2]=77
           AND bs[3] + 256*bs[4] + 65536*bs[5] + 16777216*bs[6] = len(bs)
           AND bs[11] + 256*bs[12] + 65536*bs[13] + 16777216*bs[14] = 54
           AND bs[15] + 256*bs[16] + 65536*bs[17] + 16777216*bs[18] = 40
           AND bs[27] + 256*bs[28] = 1
           AND bs[29] + 256*bs[30] = 24
           AND bs[31] + 256*bs[32] + 65536*bs[33] + 16777216*bs[34] = 0
           AND pw > 0 AND ph > 0 AND pw <= 1000000 AND ph <= 1000000
           AND len(bs) >= 54 + ((3*pw + 3) // 4 * 4) * ph) AS ok
        FROM parsed),
      stats AS (SELECT doc_id, pw, ph, pstride, ok,
          list_transform(range(0, CASE WHEN ok THEN pw*ph ELSE 0 END), i ->
            bs[(55 + (i // pw)*pstride + 3*(i % pw))::INT]
            + bs[(56 + (i // pw)*pstride + 3*(i % pw))::INT]
            + bs[(57 + (i // pw)*pstride + 3*(i % pw))::INT]) AS px
        FROM checked)
      SELECT doc_id,
        CASE WHEN ok THEN pw ELSE 0 END::BIGINT AS width,
        CASE WHEN ok THEN ph ELSE 0 END::BIGINT AS height,
        CASE WHEN ok THEN 24 ELSE 0 END::BIGINT AS bpp,
        CASE WHEN ok THEN pstride ELSE 0 END::BIGINT AS stride,
        CASE WHEN ok THEN pstride*ph ELSE 0 END::BIGINT AS img_size,
        CASE WHEN ok THEN pw*ph ELSE 0 END::BIGINT AS n_px,
        list_reduce(list_prepend(0::BIGINT, px), (a,x) -> a+x)::BIGINT AS lum3_sum,
        list_max(list_prepend(0::BIGINT, px))::BIGINT AS peak3,
        ok AS valid
      FROM stats""")),

    // ViT patch grid over the PARSED BMP dimensions (r14): the same
    // ceil-division tiling as m_patch_grid, but width/height come
    // from decodeBmp's real header parse instead of the stub rates —
    // the honest end of the image decode → schedule pipeline.
    // Invalid (corrupt-magic) payloads drop, as in wavSegments.
    Q("m_bmp_patch_grid", (s, dir) => {
      import s.implicits._
      Multimodal.patchGrid(
        Multimodal.decodeBmp(
          Multimodal.bmpify(
            Multimodal.withBinary(t(s, dir, "documents"))
              .as[Multimodal.Media]))
          .filter(_.valid)
          .map(b => Multimodal.MediaMeta(b.doc_id, "image",
            b.img_size, b.width, b.height, 3L)))
    }, Some("""
      WITH dims AS (SELECT doc_id,
          (8 + doc_id % 25)::BIGINT AS w,
          greatest(1, (octet_length(encode(text)) + (8 + doc_id % 25) - 1)
                       // (8 + doc_id % 25))::BIGINT AS h
        FROM documents WHERE doc_id % 97 <> 0)
      SELECT doc_id, w AS width, h AS height,
        ((w + 15) // 16)::BIGINT AS grid_x,
        ((h + 15) // 16)::BIGINT AS grid_y,
        (((w + 15) // 16) * ((h + 15) // 16))::BIGINT AS n_patches,
        (((w + 15) // 16) * 16 - w)::BIGINT AS pad_x,
        (((h + 15) // 16) * 16 - h)::BIGINT AS pad_y,
        (((w + 15) // 16) * ((h + 15) // 16) + 1)::BIGINT AS n_tokens
      FROM dims""")),

    // luminance histogram over DECODED pixels (r14): 4 equal bins of
    // s = r+g+b, the exposure/contrast prefilter. The operator
    // parses the BMP by the spec (shared header validation with
    // decodeBmp) and walks real pixel rows; the oracle exploits the
    // encode closed form — gray pixel s = 3·byte so bin s div 192 =
    // byte div 64, plus (w·h − n) zero padding pixels in bin 0 —
    // with validity = the planted corrupt-magic rule the decode gate
    // already proved equivalent to the full header check
    Q("m_bmp_histogram", (s, dir) => {
      import s.implicits._
      Multimodal.bmpLumHistogram(
        Multimodal.bmpify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media])).toDF()
    }, Some("""
      WITH b AS MATERIALIZED (SELECT doc_id,
           list_transform(range(1, octet_length(encode(text))+1),
             i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT)
             AS tb
         FROM documents WHERE doc_id % 97 <> 0),
      dims AS (SELECT doc_id, tb, len(tb)::BIGINT AS n,
          (8 + doc_id % 25)::BIGINT AS w,
          greatest(1, (len(tb) + (8 + doc_id % 25) - 1)
                       // (8 + doc_id % 25))::BIGINT AS h
        FROM b)
      SELECT doc_id,
        (len(list_filter(tb, x -> x < 64)) + (w*h - n))::BIGINT AS b0,
        len(list_filter(tb, x -> x >= 64 AND x < 128))::BIGINT AS b1,
        len(list_filter(tb, x -> x >= 128 AND x < 192))::BIGINT AS b2,
        len(list_filter(tb, x -> x >= 192))::BIGINT AS b3
      FROM dims""")),

    // nearest-neighbor downsample over the parsed BMP pixel grid
    // (r16): out(x,y) = in(2x, 2y), dims ⌈w/2⌉×⌈h/2⌉ — the thumbnail
    // prep pass, decoding bottom-up padded rows by the spec and
    // shuffling 7 longs per image. The oracle replays the encode
    // closed form at the sampled byte offsets (padding beyond the
    // payload is zero)
    Q("m_bmp_downsample", (s, dir) => {
      import s.implicits._
      Multimodal.bmpDownsample(
        Multimodal.bmpify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media])).toDF()
    }, Some("""
      WITH b AS MATERIALIZED (SELECT doc_id,
           list_transform(range(1, octet_length(encode(text))+1),
             i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT)
             AS tb
         FROM documents WHERE doc_id % 97 <> 0),
      bdims AS MATERIALIZED (SELECT doc_id, tb, len(tb)::BIGINT AS n,
          (8 + doc_id % 25)::BIGINT AS w,
          greatest(1, (len(tb) + (8 + doc_id % 25) - 1)
                       // (8 + doc_id % 25))::BIGINT AS h
        FROM b),
      dsd AS (SELECT doc_id, tb, n, w, h,
               ((w + 1) // 2)::BIGINT AS wo, ((h + 1) // 2)::BIGINT AS ho
             FROM bdims),
      samp AS (SELECT doc_id, w, h, wo, ho, n, tb,
                      unnest(range(0, wo * ho)) AS j
               FROM dsd),
      vals AS (SELECT doc_id, w, h, wo, ho,
                 CASE WHEN ((j // wo) * 2 * w + (j % wo) * 2) < n
                      THEN tb[(((j // wo) * 2 * w + (j % wo) * 2) + 1)::INT]
                      ELSE 0 END AS v
               FROM samp)
      SELECT doc_id, w, h, wo, ho,
             sum(v)::BIGINT AS lum_ds, max(v)::BIGINT AS peak_ds
      FROM vals GROUP BY 1, 2, 3, 4, 5""")),

    // REAL video-container decode (r14): avify wraps the payload as a
    // canonical RIFF/AVI (56-byte avih MainAVIHeader, '00db' frame
    // chunks of 8x8 gray), decodeAvi re-parses it BY THE SPEC and
    // folds per-frame luminance stats. The oracle states the encode
    // closed form: frames = ceil(n/64) (min 1), µs/frame by doc_id
    // mod 3, lum = Σ payload bytes, frame peak = max 64-byte window
    // sum; validity = the planted corrupt-magic rule (doc_id % 89)
    Q("m_avi_decode", (s, dir) => {
      import s.implicits._
      Multimodal.decodeAvi(
        Multimodal.avify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media])).toDF()
    }, Some("""
      WITH b AS MATERIALIZED (SELECT doc_id,
           list_transform(range(1, octet_length(encode(text))+1),
             i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT)
             AS tb
         FROM documents),
      dims AS (SELECT doc_id, tb, len(tb)::BIGINT AS n,
          greatest(1, (len(tb) + 63) // 64)::BIGINT AS f,
          (33333 + (doc_id % 3) * 8334)::BIGINT AS upf
        FROM b),
      stats AS (SELECT doc_id, f, upf,
          list_reduce(list_prepend(0::BIGINT, tb), (a,x) -> a+x) AS lum,
          list_max(list_prepend(0::BIGINT,
            list_transform(range(0, f), k ->
              list_reduce(list_prepend(0::BIGINT,
                tb[(64*k+1)::INT : (64*k+64)::INT]), (a,x) -> a+x)))) AS peak
        FROM dims)
      SELECT doc_id,
        CASE WHEN doc_id % 89 <> 0 THEN 8 ELSE 0 END::BIGINT AS width,
        CASE WHEN doc_id % 89 <> 0 THEN 8 ELSE 0 END::BIGINT AS height,
        CASE WHEN doc_id % 89 <> 0 THEN f ELSE 0 END::BIGINT AS n_frames,
        CASE WHEN doc_id % 89 <> 0 THEN upf ELSE 0 END::BIGINT AS us_per_frame,
        CASE WHEN doc_id % 89 <> 0 THEN (f * upf) // 1000 ELSE 0 END::BIGINT AS dur_ms,
        CASE WHEN doc_id % 89 <> 0 THEN lum ELSE 0 END::BIGINT AS lum_sum,
        CASE WHEN doc_id % 89 <> 0 THEN peak ELSE 0 END::BIGINT AS frame_peak_sum,
        (doc_id % 89 <> 0) AS valid
      FROM stats""")),

    // keyframe sampling schedule over the PARSED AVI header (r14):
    // every max(1, frames div 4)-th frame with its wall-clock
    // timestamp — the frame-sample plumbing re-keyed from stub rates
    // to real container metadata, as m_bmp_patch_grid did for images.
    // Invalid (corrupt-magic) videos drop
    Q("m_avi_keyframes", (s, dir) => {
      import s.implicits._
      Multimodal.decodeAvi(
        Multimodal.avify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media]))
        .filter(_.valid)
        .toDF()
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1,
            greatest(lit(1L), expr("n_frames div 4")))).as("frame_idx"),
          col("us_per_frame"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          expr("(frame_idx * us_per_frame) div 1000").as("t_ms"))
    }, Some("""
      WITH d AS (SELECT doc_id,
          greatest(1, (octet_length(encode(text)) + 63) // 64)::BIGINT AS f,
          (33333 + (doc_id % 3) * 8334)::BIGINT AS upf
        FROM documents WHERE doc_id % 89 <> 0)
      SELECT doc_id, f AS n_frames, fi::BIGINT AS frame_idx,
             ((fi * upf) // 1000)::BIGINT AS t_ms
      FROM (SELECT doc_id, f, upf,
              unnest(generate_series(0, f - 1, greatest(1, f // 4)))
                AS fi
            FROM d)""")),

    // scene-cut detection over the PARSED AVI frames (r15): per
    // frame, |lum_k − lum_{k−1}| > 1024 — the shot-boundary
    // prefilter before keyframe sampling; the zero-padded final
    // frame makes real cuts occur. All-integer, map-only per video;
    // the oracle unnests the same 64-byte window sums the decode
    // oracle folds and lags them
    Q("m_avi_scenecuts", (s, dir) => {
      import s.implicits._
      Multimodal.aviSceneCuts(
        Multimodal.avify(
          Multimodal.withBinary(t(s, dir, "documents"))
            .as[Multimodal.Media])).toDF()
    }, Some("""
      WITH b AS MATERIALIZED (SELECT doc_id,
           list_transform(range(1, octet_length(encode(text))+1),
             i -> ('0x' || substr(hex(encode(text)), (2*i-1)::INT, 2))::BIGINT)
             AS tb
         FROM documents WHERE doc_id % 89 <> 0),
      dims AS (SELECT doc_id, tb,
          greatest(1, (len(tb) + 63) // 64)::BIGINT AS f
        FROM b),
      fr AS (SELECT doc_id, tb, unnest(range(0, f)) AS k FROM dims),
      sums AS (SELECT doc_id, k,
          list_reduce(list_prepend(0::BIGINT,
            tb[(64*k+1)::INT : (64*k+64)::INT]), (a,x) -> a+x) AS lum
        FROM fr),
      lagged AS (SELECT doc_id, k, lum,
          lag(lum) OVER (PARTITION BY doc_id ORDER BY k) AS prev
        FROM sums)
      SELECT doc_id, k::BIGINT AS frame_idx, lum::BIGINT AS lum,
             prev::BIGINT AS prev_lum, (abs(lum - prev) > 1024) AS is_cut
      FROM lagged WHERE prev IS NOT NULL""")),

    Q("m_audio_segments", (s, dir) => {
      import s.implicits._
      Multimodal.audioSegments(
        Multimodal.withBinary(t(s, dir, "documents")).as[Multimodal.Media])
    }, Some("""
      WITH a AS (
        SELECT doc_id,
               (octet_length(encode(text)) * 1000) // 32000 AS dur_ms
        FROM documents WHERE doc_id % 3 = 1),
      k AS (SELECT doc_id, dur_ms,
                   greatest(0, CAST(floor((dur_ms - 30000 + 24999) / 25000.0)
                                    AS BIGINT)) AS k
            FROM a),
      st AS (SELECT doc_id, dur_ms,
                    unnest(generate_series(0, k * 25000, 25000)) AS start_ms
             FROM k)
      SELECT doc_id, CAST(start_ms / 25000 AS BIGINT) AS seg_idx,
             start_ms::BIGINT AS start_ms,
             least(30000, dur_ms - start_ms)::BIGINT AS seg_ms
      FROM st"""))
  )

  /** DuckDB mirror of [[graft.ext.Similarity.lshBucket]] for `bits`
    * hyperplanes (identical double math; constants via Double.toString).
    */
  private def duckLshBucket(bits: Int): String = {
    def proj(p: Int) = {
      val c = java.lang.Double.toString((p + 1) * 0.61803398875)
      s"list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, range(0, len(embedding))), " +
        s"z -> z[1]::DOUBLE * (($c * z[2]) % 1.0 * 2.0 - 1.0))), (acc,v) -> acc+v)"
    }
    (0 until bits)
      .map(p => s"(CASE WHEN ${proj(p)} >= 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
  }

  private def duckCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(0.0, list_transform(list_zip($x,$y), p -> p[1]::DOUBLE * p[2]::DOUBLE)), (acc,v) -> acc+v)"
    s"round(${dot(a, b)} / sqrt(${dot(a, a)}) / sqrt(${dot(b, b)}), 6)"
  }

  private val moreRelational: Seq[Q] = Seq(

    Q("q_window_funcs", (s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        (round(percent_rank().over(w) * lit(1e6), 0)
          .cast("long").cast("double") / lit(1e6)).as("prank"),
        first_value(col("o_orderkey")).over(w).as("top_key"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER w AS quartile,
             CAST(round(percent_rank() OVER w * 1000000.0) AS BIGINT)::DOUBLE / 1000000.0 AS prank,
             first_value(o_orderkey) OVER w AS top_key
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey ASC)""")),

    // distributed SELECT-result export emitter: the codegen'd NDJSON
    // bindings line (rio/SparqlDistExport.jsonLineCol — map-only at
    // any result size) cross-checked byte-for-byte against the oracle
    // engine constructing the same W3C binding objects; exercises IRI
    // + typed-literal bindings AND unbound-var omission
    Q("q_export_bindings", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sol = li.select(
        struct(
          concat(lit("http://ex/o"), col("l_orderkey").cast("string"),
            lit("r"), col("l_linenumber").cast("string")).as("lex"),
          lit(graft.rdf.Rdf.IRI).as("kind"),
          lit("").as("dt"), lit("").as("lang")).as("s"),
        when(col("l_returnflag") =!= "N",
          struct(col("l_quantity").cast("int").cast("string").as("lex"),
            lit(graft.rdf.Rdf.LIT).as("kind"),
            lit("http://www.w3.org/2001/XMLSchema#integer").as("dt"),
            lit("").as("lang"))).as("q"))
      sol.select(col("s")("lex").as("key"),
        graft.rio.SparqlDistExport.jsonLineCol(sol).as("line"))
    }, Some("""
      SELECT 'http://ex/o' || l_orderkey || 'r' || l_linenumber AS key,
             CASE WHEN l_returnflag <> 'N' THEN
               '{"s":{"type":"uri","value":"http://ex/o' || l_orderkey
                 || 'r' || l_linenumber
                 || '"},"q":{"type":"literal","value":"'
                 || CAST(l_quantity AS INT)
                 || '","datatype":"http://www.w3.org/2001/XMLSchema#integer"}}'
             ELSE '{"s":{"type":"uri","value":"http://ex/o' || l_orderkey
                 || 'r' || l_linenumber || '"}}' END AS line
      FROM lineitem""")),

    // cumulative distribution window: cume_dist = rank-inclusive
    // fraction — the other normalized-rank function next to
    // percent_rank; r/n integer ratio, so the hash rides micro/1e6.
    // Scale shape: o_orderstatus has 3 values, so a PARTITION BY
    // window would sort n/3 rows per task; instead the per-status
    // rank and total come from the boundary-merge prefix pass
    // (Ranks.keyedRowIndex — a hot status is SPLIT across partitions
    // because the range boundaries extend into the sort key). The
    // (o_totalprice, o_orderkey) sort key is unique, so the
    // rank-inclusive peer count IS the row index + 1.
    Q("q_cume_dist", (s, dir) => {
      val ranked = graft.ext.Ranks.keyedRowIndex(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        Seq("o_orderstatus"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        "__rank", "__n")
      ranked.select(
        col("o_orderkey"), col("o_orderstatus"),
        (round((col("__rank") + 1).cast("double") / col("__n").cast("double")
          * lit(1e6), 0)
          .cast("long").cast("double") / lit(1e6)).as("cd"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(round(cume_dist() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey ASC) * 1000000.0)
               AS BIGINT)::DOUBLE / 1000000.0 AS cd
      FROM orders""")),

    // RANGE-frame window (value-based, not row-based): per customer,
    // the rolling sum of order totals within the 30 PRECEDING DAYS of
    // each order — the time-windowed aggregate the ROWS frames cannot
    // express; integer-cent sums, day-ordinal range keys
    Q("q_range_window", (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day_ord"),
        round(col("o_totalprice") * lit(100.0), 0).cast("long").as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy(col("day_ord"))
        .rangeBetween(-30, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("day_ord"),
        sum("cents").over(w).as("sum_cents_30d"))
    }, Some("""
      WITH o AS (SELECT o_orderkey, o_custkey,
                   date_diff('day', DATE '1992-01-01', o_orderdate::DATE)::BIGINT AS day_ord,
                   CAST(round(o_totalprice*100.0) AS BIGINT) AS cents
                 FROM orders)
      SELECT o_orderkey, o_custkey, day_ord,
             sum(cents) OVER (PARTITION BY o_custkey ORDER BY day_ord
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)::BIGINT
               AS sum_cents_30d
      FROM o""")),

    // explicit salted join (plans.Skew): the hot-key mitigation for
    // joins AQE cannot rewrite — results must be IDENTICAL to the
    // plain join, which is exactly what the oracle states. Orders
    // join nation through customer: n_nationkey is a 25-value key
    // over 150k orders/SF — the low-cardinality shape salting exists
    // for
    Q("q_salted_join", (s, dir) => {
      val big = t(s, dir, "orders").join(
        t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("n_nationkey")), Seq("o_custkey"))
        .select(col("n_nationkey"), col("o_totalprice"))
      val dim = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      graft.plans.Skew.saltedJoin(big, dim, "n_nationkey", nSalts = 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
    }, Some("""
      SELECT n_name, count(*)::BIGINT AS n_orders,
             round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY n_name""")),

    Q("q_intersect_except", (s, dir) => {
      // customers appearing as order-placers vs the full customer set
      val placed = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
      val all0 = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val both = all0.intersect(placed).withColumn("kind", lit("active"))
      val never = all0.except(placed).withColumn("kind", lit("inactive"))
      both.unionByName(never)
    }, Some("""
      SELECT k, 'active' AS kind FROM (
        SELECT c_custkey AS k FROM customer
        INTERSECT SELECT o_custkey FROM orders)
      UNION ALL
      SELECT k, 'inactive' FROM (
        SELECT c_custkey AS k FROM customer
        EXCEPT SELECT o_custkey FROM orders)"""))
  )

  private val moreText: Seq[Q] = Seq(

    Q("t_tfidf_top", (s, dir) => {
      // DataFrame-native TF-IDF (no hashing trick: term identity is the
      // token itself, engine-independent — SURVEY §2.D text analysis)
      val docs = t(s, dir, "documents")
      // corpus size as a broadcast 1-row aggregate INSIDE the plan —
      // an eager docs.count() here would be a second full corpus scan
      // run as a separate driver-blocking job before the query starts
      val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf_raw").desc, col("term").asc)
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf_raw", col("tf") * log(col("n_docs") / col("df")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), round(col("tfidf_raw"), 4).as("tfidf"),
          col("rank"))
    }, Some("""
      WITH tf AS (
        SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
      tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
      dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
      scored AS (
        SELECT doc_id, term,
               tf * ln((SELECT count(*) FROM documents)::DOUBLE / df) AS tfidf_raw
        FROM tfc JOIN dfc USING (term)),
      ranked AS (
        SELECT doc_id, term, tfidf_raw,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_raw DESC, term ASC) AS rank
        FROM scored)
      SELECT doc_id, term, round(tfidf_raw, 4) AS tfidf, rank::BIGINT AS rank
      FROM ranked WHERE rank <= 3""")),

    Q("s_lsh_ann", (s, dir) => {
      val e = t(s, dir, "embeddings")
      graft.ext.Similarity.lshTopK(e.filter(col("vec_id") < 5), e, 5, bits = 6)
    }, Some(s"""
      WITH b AS (SELECT vec_id, embedding, (${duckLshBucket(6)})::BIGINT AS bucket
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket
            FROM b WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, b.vec_id, ${duckCosine("q.q_emb", "b.embedding")} AS cos
        FROM b JOIN q USING (bucket) WHERE b.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, vec_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT query_id, vec_id, cos, rank::INT AS rank FROM ranked WHERE rank <= 5"""))
  )

  val all: Seq[Q] = relationalExtra ++ moreRelational ++ multimodal ++ moreText
}

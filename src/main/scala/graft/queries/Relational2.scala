package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Coverage-closing queries for the remaining SURVEY.md §2 operator rows not
  * exercised by Q01-Q15: cube grouping sets (O-A8), computed sort keys
  * (O-S2), the scalar-function surface (O-X1..X14), approximate distinct
  * (O-A9), and seeded random ordering (O-S3).
  */
object Relational2 {

  val defs: Seq[QueryDef] = Seq(

    // O-A8: CUBE over two grouping dimensions (rollup is Q11).
    QueryDef.sqlBacked(
      "q16_cube",
      """SELECT n_regionkey, n_nationkey % 5 AS nk_mod, count(*) AS n
        |FROM nation
        |GROUP BY CUBE(n_regionkey, nk_mod)
        |ORDER BY n_regionkey NULLS FIRST, nk_mod NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .cube(col("n_regionkey"), (col("n_nationkey") % 5).as("nk_mod"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_regionkey").asc_nulls_first, col("nk_mod").asc_nulls_first)
    },

    // O-S2 + O-T1: sort by computed key with deterministic tie-break + limit.
    QueryDef.sqlBacked(
      "q17_sort_computed",
      """SELECT doc_id, n_chars
        |FROM documents
        |ORDER BY n_chars % 7, n_chars DESC, doc_id
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("n_chars") % 7, col("n_chars").desc, col("doc_id"))
        .limit(100)
    },

    // O-X1/X2/X3/X4/X6/X7/X11/X14: the scalar-function surface of the
    // reference — upper (aggregates_stocks_etl.py:31), literal replace
    // (API-key redaction, reference_endpoints_etl.py:31), '--'-joined key
    // construction (aggregates_stocks_etl.py:43), timestamp formatting
    // (helper_functions.py:15-16), UTC→exchange-time conversion
    // (reference_data_etl.py:66), conditional adjusted/raw naming
    // (aggregates_stocks_etl.py:33-41).
    QueryDef.sqlBacked(
      "q18_scalar_funcs",
      """SELECT event_id,
        |  upper(event_type) AS etype_u,
        |  replace(props, 'k', 'key') AS props_renamed,
        |  concat_ws('--', event_type, CAST(user_id AS VARCHAR)) AS path_key,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y%m%d-%H%M%S') AS ts_str,
        |  CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
        |    AT TIME ZONE 'America/New_York' AS ts_eastern,
        |  CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END AS value_bucket,
        |  CAST(length(event_type) AS BIGINT) AS etype_len
        |FROM events
        |ORDER BY event_id
        |LIMIT 2000""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          upper(col("event_type")).as("etype_u"),
          regexp_replace(col("props"), "k", "key").as("props_renamed"),
          concat_ws("--", col("event_type"), col("user_id").cast("string"))
            .as("path_key"),
          date_format(col("ts"), "yyyyMMdd-HHmmss").as("ts_str"),
          from_utc_timestamp(col("ts"), "America/New_York").as("ts_eastern"),
          when(col("value") > 100, "hi").otherwise("lo").as("value_bucket"),
          length(col("event_type")).cast("long").as("etype_len"))
        .orderBy(col("event_id"))
        .limit(2000)
    },

    // O-A9: approximate distinct via a DETERMINISTIC KMV (k-minimum-values)
    // sketch over a portable multiplicative hash — the same estimator
    // family as HLL's cousin in DataSketches, chosen over
    // approx_count_distinct because its every intermediate is integer
    // arithmetic BOTH engines can replay: estimate = (k-1)·M / h_k where
    // h_k is the k-th smallest DISTINCT hash (k=256 → ~6% stderr;
    // observed ≤2.5% at every fixture SF). That upgrades this query from
    // rows-only+engine-bound to hash-exact, with the accuracy STILL
    // machine-checked in verify_meta (exact_parts rides in the same row).
    // Unlike q20's permutation, BOTH mods here are the Mersenne prime
    // M = 2^31−1: the hash DOMAIN is the estimator's resolution, and an
    // intermediate mod-1000003 would cap it at 1e6 distinct hashes —
    // biasing the estimate low by ~n/2e6, i.e. blowing the 15% bound
    // around a million distinct values. With the 2^31 domain the residual
    // collision bias is ~n/2^32 (<1% until n ≈ 4·10⁷; a wider domain
    // needs 128-bit intermediates neither engine's BIGINT `%`-chain can
    // express portably — documented cap, not an accident). Overflow-safe:
    // partkey·1009 < 2^63 for partkey ≤ 9.1e15, and (2^31)·69069 < 2^48.
    // Scale shape: one distinct shuffle on (group, hash), then the rn<=k
    // filter compiles to WindowGroupLimit (k-row heap per group, no full
    // sort; PlanSpec-locked); groups under k distinct values fall back to
    // their exact count, the standard KMV small-cardinality rule. Integer
    // division is `div`/`//` (truncating; operands non-negative, so the
    // engines agree), never a double round. h_k > 0 always: hashes are
    // DISTINCT and non-negative, so the 256th smallest is ≥ 255.
    QueryDef.sqlBacked(
      "q19_approx_distinct",
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    (l_partkey * 1009) % 2147483647 * 69069 % 2147483647 AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |  FROM h),
        |k AS (SELECT l_returnflag, max(h) AS hk, count(*) AS c
        |  FROM r WHERE rn <= 256 GROUP BY 1),
        |x AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |    count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT k.l_returnflag,
        |  CASE WHEN c < 256 THEN c
        |       ELSE (CAST(255 AS BIGINT) * 2147483647) // hk END AS approx_parts,
        |  x.exact_parts, x.n
        |FROM k JOIN x USING (l_returnflag)
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val k = 256
      val li = Tables.lineitem(s, d)
      val h = li.select(col("l_returnflag"),
          (col("l_partkey") * 1009 % 2147483647L * 69069 % 2147483647L).as("h"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag")).orderBy(col("h"))
      val kmin = h.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .groupBy(col("l_returnflag"))
        .agg(max(col("h")).as("hk"), count(lit(1)).as("c"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
             count(lit(1)).as("n"))
      kmin.withColumn("approx_parts",
          when(col("c") < k, col("c"))
            .otherwise(expr(s"${255L * 2147483647L}L div hk")))
        .select(col("l_returnflag"), col("approx_parts"))
        .join(exact, "l_returnflag")
        .orderBy(col("l_returnflag"))
    },

    // O-S3: seeded random work-order shuffle (main.py:36). The semantic the
    // reference needs is "a deterministic shuffle of work order for a fixed
    // seed" — a keyed portable hash satisfies it EXACTLY, and unlike
    // rand(seed) (engine-specific stream) both engines can recompute the
    // permutation, so this is hash-exact instead of rows-only. Same
    // multiplicative-hash family as CorpusOps.orderHash. The mod-1000003
    // reduction sits between the two multiplies, so it only bounds the
    // * 69069 step (the l_orderkey * 1009 product itself is safe: BIGINT
    // overflow would need orderkeys > ~9e15, and Spark wraps where DuckDB
    // throws — keep that in mind if the key domain ever grows). Final
    // modulus is 65521 (prime, not 2^16): with a power-of-two modulus the
    // odd multiplier would make the sort key depend only on the key's low
    // 16 bits; the prime keeps the full mixed key in play. The 1009
    // line-number mix keeps lines of one order apart in the shuffle.
    QueryDef.sqlBacked(
      "q20_random_order",
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY (l_orderkey * 1009 + l_linenumber) % 1000003 * 69069 % 65521,
        |  l_orderkey, l_linenumber
        |LIMIT 50""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(
          (col("l_orderkey") * 1009L + col("l_linenumber")) % 1000003L
            * 69069L % 65521L,
          col("l_orderkey"), col("l_linenumber"))
        .limit(50)
    },

    // Session windows (SURVEY.md §2.10 — "provided free" beyond the
    // reference's tumbling-only semantics): per-user activity sessions with
    // a 30-minute inactivity gap. Oracle: gaps-and-islands SQL — a new
    // session starts when the gap is >= the timeout (Spark merges only
    // strictly-overlapping [t, t+gap) windows), session end = last ts + gap.
    QueryDef.sqlBacked(
      "q21_session_window",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |m AS (SELECT user_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      EventOps.sessionize(Tables.events(s, d), gap = "30 minutes")
    },

    // Sliding windows (10-minute window, 5-minute slide): each event lands
    // in two overlapping buckets. Oracle: explode the two window starts per
    // event (time_bucket minus slide offsets — epoch-aligned like Spark's
    // window()).
    QueryDef.sqlBacked(
      "q22_sliding_window",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT user_id,
        |        time_bucket(INTERVAL 5 MINUTE, ts) - (o * INTERVAL 5 MINUTE)
        |          AS w_start
        |      FROM e CROSS JOIN (VALUES (0), (1)) AS t(o))
        |SELECT user_id, w_start, CAST(count(*) AS BIGINT) AS n_events
        |FROM w GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("window.start").as("w_start"), col("n_events"))
        .orderBy(col("user_id"), col("w_start"))
    },

    // Ordered conversion funnel over the event stream: first view, first
    // click strictly after it, first purchase strictly after that — the
    // time-ordered multi-stage pattern (reference's tumbling aggregation
    // generalized to ordered stages). Each stage is a partial-aggregated
    // min per user joined back on user_id: three shuffles bounded by USER
    // count, never event count — at 100 TB the event table is scanned
    // once per stage with the stage predicate pushed to the scan, and the
    // per-user firsts are thin (user_id, ts) rows.
    QueryDef.sqlBacked(
      "q23_funnel",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |a AS (SELECT user_id, min(ts) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(e.ts) AS t_click FROM e JOIN a USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > a.t_view GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM e JOIN b USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > b.t_click GROUP BY 1)
        |SELECT a.user_id, a.t_view, b.t_click, c.t_purchase
        |FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      EventOps.funnel(Tables.events(s, d),
        stages = Seq("view", "click", "purchase"))
    },

    // Cohort retention: users grouped by first-activity week, counted
    // distinct in each subsequent week offset. Activity is compacted to
    // distinct (user, week) BEFORE the cohort join — the shuffled set is
    // users × weeks, not raw events; the cohort table is (user, week) thin
    // rows. date_trunc('week') is Monday-anchored in both engines.
    QueryDef.sqlBacked(
      "q24_retention",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w0 AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |       FROM e GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM e)
        |SELECT cohort_week,
        |  CAST(date_diff('day', CAST(cohort_week AS DATE), CAST(w AS DATE)) // 7
        |       AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT act.user_id) AS BIGINT) AS users
        |FROM act JOIN w0 USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      EventOps.retention(Tables.events(s, d), period = "week")
    },

    // Event-path transition matrix (Markov edges over per-user sequences)
    // — the clickstream path-analysis op. The (ts, event_id) ordering is
    // fully deterministic on both sides; ts truncates ns→µs identically
    // (the q24 move). One user-keyed shuffle, |types|²-bounded aggregate.
    QueryDef.sqlBacked(
      "q25_event_paths",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |             event_id
        |           FROM events),
        |t AS (SELECT user_id, event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM t WHERE to_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      EventOps.transitionMatrix(Tables.events(s, d))
    },

    // Trailing-window anomaly detection: events whose integer-cents value
    // exceeds 3× the mean of the previous 20 events for the same key
    // (current row excluded from its own baseline; 10-row warmup). The
    // threshold cross-multiplies (p·n > s·3) so the whole contract is
    // BIGINT — hash-exact under any execution order. One shuffle by key,
    // one bounded-frame window pass (see EventOps.spikeDetect).
    QueryDef.sqlBacked(
      "q26_spike_detect",
      """WITH t AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS p_cents,
        |    count(*) OVER w AS trail_n,
        |    sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS trail_sum_cents
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, p_cents,
        |  CAST(trail_n AS BIGINT) AS trail_n,
        |  CAST(trail_sum_cents AS BIGINT) AS trail_sum_cents
        |FROM t
        |WHERE trail_n >= 10 AND p_cents * trail_n > trail_sum_cents * 3
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      EventOps.spikeDetect(Tables.events(s, d))
    },

    // SCD2 temporal materialization — the changelog folded into versioned
    // validity intervals (consecutive identical states collapsed,
    // valid_to = next change's valid_from, NULL while current). Both
    // engines order by (ts, event_id) — a total order — so version
    // numbers and interval bounds are deterministic and the query is
    // hash-exact. One shuffle by entity; see EventOps.scd2Intervals.
    QueryDef.sqlBacked(
      "q27_scd2",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |             event_id
        |           FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id) AS prev
        |      FROM e),
        |k AS (SELECT user_id, event_type, ts, event_id FROM c
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS valid_from,
        |        lead(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS valid_to,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS BIGINT)
        |          AS version
        |      FROM k)
        |SELECT user_id, state, valid_from, valid_to, version,
        |  valid_to IS NULL AS is_current
        |FROM v
        |ORDER BY user_id, version""".stripMargin) { (s, d) =>
      EventOps.scd2Intervals(Tables.events(s, d))
    },

    // PIVOT — long→wide reshaping: per-user event counts, one column per
    // event type. The pivot VALUES are declared explicitly (the 100 TB
    // discipline: no values-discovery pre-job scanning the corpus, and
    // the output schema is static for downstream plans). Absent cells
    // coalesce to 0 so both engines agree. One partial-aggregated
    // shuffle; width is the declared type list, never data-driven.
    QueryDef.sqlBacked(
      "q28_pivot",
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("user_id") +:
          types.map(t => coalesce(col(s"`$t`"), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    },

    // UNPIVOT — wide→long melting: lineitem's three measure columns
    // stacked into (measure, value) rows. Spark's `stack` is a Generate
    // (zero shuffle, row-local); the oracle is the equivalent UNION ALL.
    // Values are raw doubles carried with no arithmetic — bit-exact.
    QueryDef.sqlBacked(
      "q29_unpivot",
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
        |         l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
        |  FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""stack(3, 'quantity', l_quantity,
                 |         'extendedprice', l_extendedprice,
                 |         'discount', l_discount) AS (measure, value)"""
            .stripMargin))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }
  )
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.MarketOps._
import graft.operators.{Adjust, AsOf, Indicators, SimilarityOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The mkt_* declared queries (oracle-backed) over the market operators —
  * extracted verbatim from operators/MarketOps.scala purely for module
  * size; the operators stay there, this file holds only QueryDefs.
  */
object MarketQueries {

  /** Portfolio-curve oracle CTEs on top of `backtestCtes`, ending in
    * `dd(day, equity_cents, drawdown_cents)` — shared between
    * mkt_backtest_portfolio and mkt_risk_stats so the curve the risk
    * stats summarize is definitionally the curve the portfolio query
    * reports.
    */
  private lazy val portfolioCtes =
    s"""$backtestCtes,
       |d AS (SELECT e.user_id, e.rn, e.cum_pnl_cents,
       |        date_trunc('day', CAST(ev.ts AS TIMESTAMP)) AS day
       |      FROM eq e JOIN events ev USING (event_id)),
       |l AS (SELECT user_id, day, cum_pnl_cents FROM (
       |        SELECT user_id, day, cum_pnl_cents,
       |          row_number() OVER (PARTITION BY user_id, day
       |            ORDER BY rn DESC) AS rk
       |        FROM d) WHERE rk = 1),
       |grid AS (SELECT DISTINCT day FROM d),
       |u AS (SELECT DISTINCT user_id FROM d),
       |cells AS (SELECT u.user_id, g.day, l.cum_pnl_cents
       |          FROM u CROSS JOIN grid g
       |          LEFT JOIN l ON l.user_id = u.user_id AND l.day = g.day),
       |ff AS (SELECT user_id, day,
       |         coalesce(last_value(cum_pnl_cents IGNORE NULLS) OVER (
       |           PARTITION BY user_id ORDER BY day
       |           ROWS UNBOUNDED PRECEDING), 0) AS eqv
       |       FROM cells),
       |port AS (SELECT day, CAST(sum(eqv) AS BIGINT) AS equity_cents
       |         FROM ff GROUP BY 1),
       |dd AS (SELECT day, equity_cents,
       |         CAST(max(equity_cents) OVER (ORDER BY day
       |           ROWS UNBOUNDED PRECEDING) - equity_cents AS BIGINT)
       |           AS drawdown_cents
       |       FROM port)""".stripMargin

  /** Shared DuckDB CTE chain for the backtest oracles, ending in
    * `eq(event_id, user_id, rn, pos, pnl_cents, cum_pnl_cents, peak)` —
    * shared between mkt_backtest_sma and mkt_backtest_summary so the two
    * contracts cannot drift.
    */
  // lazy: referenced by the `defs` val above — declaration order must not
  // matter for object initialization
  private lazy val backtestCtes =
    """t AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(value * 100) AS BIGINT) AS p,
      |    row_number() OVER w AS rn,
      |    sum(CAST(floor(value * 100) AS BIGINT))
      |      OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sf,
      |    sum(CAST(floor(value * 100) AS BIGINT))
      |      OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ss
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      |sig AS (
      |  SELECT event_id, user_id, p, rn,
      |    coalesce(lag(CASE WHEN rn >= 20 AND sf * 20 > ss * 5
      |                      THEN 1 ELSE 0 END) OVER w2, 0) AS pos,
      |    coalesce(p - lag(p) OVER w2, 0) AS dp
      |  FROM t
      |  WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)),
      |pnl AS (
      |  SELECT event_id, user_id, rn, pos, pos * dp AS pnl_cents,
      |    sum(pos * dp) OVER (PARTITION BY user_id ORDER BY rn
      |                        ROWS UNBOUNDED PRECEDING) AS cum_pnl_cents
      |  FROM sig),
      |eq AS (
      |  SELECT event_id, user_id, rn, pos, pnl_cents, cum_pnl_cents,
      |    max(cum_pnl_cents) OVER (PARTITION BY user_id ORDER BY rn
      |                             ROWS UNBOUNDED PRECEDING) AS peak
      |  FROM pnl)""".stripMargin


  val defs: Seq[QueryDef] = Seq(

    // As-of enrichment: each purchase picks up the most recent signup value
    // at-or-before its time, per user. Oracle: DuckDB's native ASOF JOIN
    // (inclusive >=, same tie rule as our union+window implementation).
    QueryDef.sqlBacked(
      "mkt_asof_enrich",
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |     r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  value AS signup_value
        |           FROM events WHERE event_type = 'signup')
        |SELECT l.event_id, l.user_id, l.value, r.signup_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      AsOf.asofJoin(purchases, signups, keys = Seq("user_id"),
          leftTime = "ts", rightTime = "ts", rightVals = Seq("signup_value"))
        .select(col("event_id"), col("user_id"), col("value"), col("signup_value"))
        .orderBy(col("event_id"))
    },

    // EMA over a trailing 20-row window (finite-window normalized EMA, the
    // pandas ewm(adjust=True) form): weights (1-α)^j off the frame list.
    // pow() may differ by an ulp across libms → rounded to 6 dp.
    QueryDef.sqlBacked(
      "mkt_ema20",
      """WITH t AS (SELECT event_id, user_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
        |  FROM events)
        |SELECT event_id, user_id,
        |  round(list_sum(list_transform(range(0, len(arr)),
        |          i -> arr[i + 1] * pow(0.8, len(arr) - 1 - i)))
        |        / ((1 - pow(0.8, len(arr))) / 0.2), 6) AS ema20
        |FROM t
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // weights looked up from a literal power table (the interpreted
      // lambda then does one multiply per element, no pow); normalization
      // via the closed-form geometric series — both mirrored in the oracle.
      val powTable = typedlit((0 until 20).map(j => math.pow(0.8, j)))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      Tables.events(s, d)
        .withColumn("arr", collect_list(col("value")).over(w))
        .withColumn("_pw", powTable)
        .withColumn("ema20", round(
          expr("""aggregate(sequence(0, size(arr) - 1), cast(0 as double),
                 |  (a, i) -> a + element_at(arr, i + 1) * element_at(_pw, size(arr) - i))"""
            .stripMargin) /
          ((lit(1.0) - pow(lit(0.8), size(col("arr")))) / lit(0.2)), 6))
        .select(col("event_id"), col("user_id"), col("ema20"))
        .orderBy(col("event_id"))
    },

    // True sequential EMA (infinite memory) via sorted-group iteration — the
    // per-key ordered-state pattern that generalizes to any recursive
    // indicator. Oracle: DuckDB list_reduce left-folds the same recurrence
    // in the same order with the same IEEE ops (0.2*x + (1-0.2)*acc, seeded
    // by the first element) — bit-identical, no rounding needed.
    QueryDef.sqlBacked(
      "mkt_ema_exact",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |g AS (SELECT user_id,
        |    list(value ORDER BY ts, event_id) AS xs,
        |    list(event_id ORDER BY ts, event_id) AS ids
        |  FROM e GROUP BY user_id),
        |u AS (SELECT user_id, unnest(ids) AS event_id,
        |             unnest(range(1, len(ids) + 1)) AS i, xs FROM g)
        |SELECT event_id, user_id,
        |  list_reduce(xs[1:i], (acc, x) -> 0.2 * x + (1 - 0.2) * acc) AS ema
        |FROM u ORDER BY event_id""".stripMargin) { (s, d) =>
      emaExact(s, Tables.events(s, d), alpha = 0.2)
    },

    // Rolling VWAP: volume from the JSON props (k+1 to stay nonzero), price
    // from value. Exact decimal window sums on both sides.
    QueryDef.sqlBacked(
      "mkt_vwap20",
      """WITH t AS (SELECT event_id, user_id, ts, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) + 1 AS vol
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(CAST(value * vol AS DECIMAL(18,2)))
        |         OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / CAST(SUM(vol) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS vwap20
        |FROM t
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      Tables.events(s, d)
        .withColumn("vol",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k") + 1)
        .withColumn("vwap20",
          sum((col("value") * col("vol")).cast(graft.operators.MarketOps.D18)).over(w).cast(DoubleType) /
          sum(col("vol")).over(w).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("vwap20"))
        .orderBy(col("event_id"))
    },

    // RSI-14 (simple-average form, Indicators.rsi semantics): gains/losses
    // as DECIMAL window sums (the sliding-frame double summation order
    // differs between engines), final ratio in doubles, rounded.
    QueryDef.sqlBacked(
      "mkt_rsi14",
      """WITH t AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    value - lag(value) OVER (PARTITION BY user_id
        |                             ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |      AS chg
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id,
        |    CAST(SUM(CAST(CASE WHEN chg > 0 THEN chg ELSE 0 END AS DECIMAL(18,6)))
        |      OVER win AS DOUBLE) AS gain,
        |    CAST(SUM(CAST(CASE WHEN chg < 0 THEN -chg ELSE 0 END AS DECIMAL(18,6)))
        |      OVER win AS DOUBLE) AS loss
        |  FROM t
        |  WINDOW win AS (PARTITION BY user_id
        |                 ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN loss = 0 THEN 100.0
        |       ELSE round(100.0 - 100.0 / (1.0 + gain / loss), 6) END AS rsi14
        |FROM w
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w = order.rowsBetween(-13, Window.currentRow)
      Tables.events(s, d)
        .withColumn("chg", col("value") - lag(col("value"), 1).over(order))
        .withColumn("gain",
          sum(when(col("chg") > 0, col("chg")).otherwise(lit(0)).cast(DecimalType(18, 6)))
            .over(w).cast(DoubleType))
        .withColumn("loss",
          sum(when(col("chg") < 0, -col("chg")).otherwise(lit(0)).cast(DecimalType(18, 6)))
            .over(w).cast(DoubleType))
        .withColumn("rsi14",
          when(col("loss") === 0, lit(100.0))
            .otherwise(round(lit(100.0) - lit(100.0) /
              (lit(1.0) + col("gain") / col("loss")), 6)))
        .select(col("event_id"), col("user_id"), col("rsi14"))
        .orderBy(col("event_id"))
    },

    // Wilder-smoothed RSI (the classic recursive form): avg gain/loss fold
    // g_t = (g_{t-1}*(n-1) + gain_t)/n seeded by the first change, via the
    // same sorted-group iteration as emaExact. Oracle folds the identical
    // arithmetic with list_reduce over per-prefix change lists — bit-exact,
    // unrounded. First row per key has no change -> NULL.
    QueryDef.sqlBacked(
      "mkt_rsi_wilder",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |o AS (SELECT user_id,
        |        list(value ORDER BY ts, event_id) AS xs,
        |        list(event_id ORDER BY ts, event_id) AS ids
        |      FROM e GROUP BY user_id),
        |u AS (SELECT user_id, unnest(ids) AS event_id,
        |             unnest(range(1, len(ids) + 1)) AS i, xs FROM o),
        |c AS (SELECT user_id, event_id, i,
        |        list_transform(range(2, i + 1), j ->
        |          CASE WHEN xs[j] - xs[j-1] > 0 THEN xs[j] - xs[j-1] ELSE 0.0 END)
        |          AS gains,
        |        list_transform(range(2, i + 1), j ->
        |          CASE WHEN xs[j] - xs[j-1] < 0 THEN -(xs[j] - xs[j-1]) ELSE 0.0 END)
        |          AS losses
        |      FROM u)
        |SELECT event_id, user_id,
        |  CASE WHEN i < 2 THEN NULL
        |       WHEN list_reduce(losses, (acc, x) -> (acc * 13 + x) / 14) = 0 THEN 100.0
        |       ELSE 100.0 - 100.0 /
        |         (1.0 + list_reduce(gains, (acc, x) -> (acc * 13 + x) / 14)
        |              / list_reduce(losses, (acc, x) -> (acc * 13 + x) / 14))
        |  END AS rsi_wilder
        |FROM c ORDER BY event_id""".stripMargin) { (s, d) =>
      rsiWilder(s, Tables.events(s, d), n = 14)
    },

    // Stochastic %K over a 14-row window (close-based form): rolling
    // min/max are EXACT under any evaluation order (no summation), so the
    // only float work is one identically-written ratio — bit-stable, with
    // the flat-window case (max == min) pinned to 50.
    QueryDef.sqlBacked(
      "mkt_stochastic14",
      """WITH w AS (
        |  SELECT event_id, user_id, value,
        |    min(value) OVER win AS mn,
        |    max(value) OVER win AS mx
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id
        |                 ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN mx = mn THEN 50.0
        |       ELSE round(100.0 * (value - mn) / (mx - mn), 6) END AS pctk14
        |FROM w
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-13, Window.currentRow)
      Tables.events(s, d)
        .withColumn("mn", min(col("value")).over(w))
        .withColumn("mx", max(col("value")).over(w))
        .withColumn("pctk14",
          when(col("mx") === col("mn"), lit(50.0))
            .otherwise(round(lit(100.0) * (col("value") - col("mn")) /
              (col("mx") - col("mn")), 6)))
        .select(col("event_id"), col("user_id"), col("pctk14"))
        .orderBy(col("event_id"))
    },

    // On-balance volume: running sum of sign(price change) * volume. The
    // volume is integer-valued (json k + 1), so the cumulative sum is an
    // exact BIGINT — no decimal detour, no rounding; first row (no change)
    // contributes 0 through the CASE's ELSE on both engines.
    QueryDef.sqlBacked(
      "mkt_obv",
      """WITH t AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    value - lag(value) OVER (PARTITION BY user_id
        |                             ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |      AS chg,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) + 1 AS vol
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(CASE WHEN chg > 0 THEN vol
        |                WHEN chg < 0 THEN -vol
        |                ELSE 0 END)
        |       OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS obv
        |FROM t
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("vol",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k") + 1)
        .withColumn("chg", col("value") - lag(col("value"), 1).over(order))
        .withColumn("obv",
          sum(when(col("chg") > 0, col("vol"))
            .when(col("chg") < 0, -col("vol"))
            .otherwise(lit(0L))).over(cum).cast("long"))
        .select(col("event_id"), col("user_id"), col("obv"))
        .orderBy(col("event_id"))
    },

    // Wilder-smoothed ATR over close-to-close true range |chg|: the same
    // recursive fold as mkt_rsi_wilder (seeded by the first TR, then
    // (acc*(n-1) + tr)/n), bit-exact against DuckDB's list_reduce of the
    // identical arithmetic. First row per key has no change -> NULL.
    QueryDef.sqlBacked(
      "mkt_atr_wilder",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |o AS (SELECT user_id,
        |        list(value ORDER BY ts, event_id) AS xs,
        |        list(event_id ORDER BY ts, event_id) AS ids
        |      FROM e GROUP BY user_id),
        |u AS (SELECT user_id, unnest(ids) AS event_id,
        |             unnest(range(1, len(ids) + 1)) AS i, xs FROM o),
        |c AS (SELECT user_id, event_id, i,
        |        list_transform(range(2, i + 1), j -> abs(xs[j] - xs[j-1])) AS trs
        |      FROM u)
        |SELECT event_id, user_id,
        |  CASE WHEN i < 2 THEN NULL
        |       ELSE list_reduce(trs, (acc, x) -> (acc * 13 + x) / 14)
        |  END AS atr_wilder
        |FROM c ORDER BY event_id""".stripMargin) { (s, d) =>
      atrWilder(s, Tables.events(s, d), n = 14)
    },

    // Bollinger %B over a 20-row window: mean and sample stddev from exact
    // DECIMAL sums of x and x^2 (sum^2/n form) so both engines fold the
    // window identically; degenerate windows (n < 2 or zero spread) -> NULL.
    QueryDef.sqlBacked(
      "mkt_bollinger20",
      """WITH w AS (
        |  SELECT event_id, user_id, value,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value * value AS DECIMAL(28,8))) OVER win AS DOUBLE) AS sxx,
        |    CAST(COUNT(*) OVER win AS DOUBLE) AS n
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id
        |                 ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  CASE WHEN n < 2 OR sxx - sx * sx / n <= 0 THEN NULL
        |       ELSE round((value - (sx / n - 2 * sqrt((sxx - sx * sx / n) / (n - 1))))
        |                  / (4 * sqrt((sxx - sx * sx / n) / (n - 1))), 6) END AS pctb20
        |FROM w
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      Tables.events(s, d)
        .withColumn("sx", sum(col("value").cast(DecimalType(18, 6))).over(w).cast(DoubleType))
        .withColumn("sxx",
          sum((col("value") * col("value")).cast(DecimalType(28, 8))).over(w).cast(DoubleType))
        .withColumn("n", count(lit(1)).over(w).cast(DoubleType))
        .withColumn("var_num", col("sxx") - col("sx") * col("sx") / col("n"))
        .withColumn("pctb20",
          when(col("n") < 2 || col("var_num") <= 0, lit(null))
            .otherwise {
              val sd = sqrt(col("var_num") / (col("n") - 1))
              round((col("value") - (col("sx") / col("n") - lit(2) * sd)) /
                (lit(4) * sd), 6)
            })
        .select(col("event_id"), col("user_id"), col("pctb20"))
        .orderBy(col("event_id"))
    },

    // MACD line: exact recursive EMA(12) - EMA(26) via the same sorted-group
    // fold as mkt_ema_exact; the oracle folds both with list_reduce using
    // the identical alpha arithmetic (2.0/13, 2.0/27) — bit-exact.
    QueryDef.sqlBacked(
      "mkt_macd",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |g AS (SELECT user_id,
        |    list(value ORDER BY ts, event_id) AS xs,
        |    list(event_id ORDER BY ts, event_id) AS ids
        |  FROM e GROUP BY user_id),
        |u AS (SELECT user_id, unnest(ids) AS event_id,
        |             unnest(range(1, len(ids) + 1)) AS i, xs FROM g)
        |SELECT event_id, user_id,
        |  list_reduce(xs[1:i], (acc, x) -> (2.0/13) * x + (1 - 2.0/13) * acc)
        |  - list_reduce(xs[1:i], (acc, x) -> (2.0/27) * x + (1 - 2.0/27) * acc)
        |    AS macd
        |FROM u ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val fast = emaExact(s, ev, alpha = 2.0 / 13)
        .withColumnRenamed("ema", "ema_fast")
      val slow = emaExact(s, ev, alpha = 2.0 / 27)
        .select(col("event_id"), col("ema").as("ema_slow"))
      fast.join(slow, Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          (col("ema_fast") - col("ema_slow")).as("macd"))
        .orderBy(col("event_id"))
    },

    // Resample ladder: 5-minute bars re-aggregated to 1-hour bars — the
    // granularity ladder of old_source/old_source_op.py:18 (1m..24h), with
    // open/close carried by min_by/max_by on the sub-bar time.
    QueryDef.sqlBacked(
      "mkt_resample_1h",
      """WITH b5 AS (
        |  SELECT user_id,
        |    time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS b5,
        |    arg_min(value, ts) AS o, max(value) AS h, min(value) AS l,
        |    arg_max(value, ts) AS c, count(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS vol_dec
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, time_bucket(INTERVAL '1 hour', b5) AS bucket,
        |  arg_min(o, b5) AS o, max(h) AS h, min(l) AS l, arg_max(c, b5) AS c,
        |  CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(vol_dec) AS DOUBLE) AS vol
        |FROM b5
        |GROUP BY user_id, bucket
        |ORDER BY user_id, bucket""".stripMargin) { (s, d) =>
      refoldBars(bars5m(Tables.events(s, d)), "1 hour",
          keys = Seq("user_id"), timeCol = "b5", sumCols = Seq("n", "vol_dec"))
        .select(col("user_id"), col("bucket"), col("o"), col("h"), col("l"),
          col("c"), col("n"), col("vol_dec").cast(DoubleType).as("vol"))
        .orderBy(col("user_id"), col("bucket"))
    },

    // Split-adjustment cumulative factor (O-J4/O-W2): for every event, the
    // sum of log-factors of all STRICTLY LATER signups of the same user —
    // the backward-looking adjustment a native engine applies to raw bars.
    // Union + desc running window, splits excluded from their own timestamp
    // by the (_t DESC, side) sort. Rounded: ln + window-sum-order noise.
    QueryDef.sqlBacked(
      "mkt_adjust_cumfactor",
      """WITH u AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, 0 AS side,
        |         CAST(NULL AS DOUBLE) AS lf
        |  FROM events
        |  UNION ALL
        |  SELECT NULL, user_id, CAST(ts AS TIMESTAMP), 1,
        |         ln(1 + value / 1000)
        |  FROM events WHERE event_type = 'signup'),
        |c AS (
        |  SELECT event_id, user_id, side,
        |    COALESCE(SUM(lf) OVER (PARTITION BY user_id
        |      ORDER BY t DESC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_log_adj
        |  FROM u)
        |SELECT event_id, user_id, round(cum_log_adj, 6) AS cum_log_adj
        |FROM c WHERE side = 0
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val bars = ev.select(col("event_id"), col("user_id"), col("ts").as("t"),
        lit(0).as("side"), lit(null).cast("double").as("lf"))
      val splits = ev.filter(col("event_type") === "signup")
        .select(lit(null).cast("long").as("event_id"), col("user_id"),
          col("ts").as("t"), lit(1).as("side"),
          log(lit(1) + col("value") / 1000).as("lf"))
      // side ASC after t DESC: at equal timestamps the bar precedes the
      // split, so a split never adjusts its own timestamp (strict >).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t").desc, col("side").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      bars.unionByName(splits)
        .withColumn("cum_log_adj", coalesce(sum(col("lf")).over(w), lit(0.0)))
        .filter(col("side") === 0)
        .select(col("event_id"), col("user_id"),
          round(col("cum_log_adj"), 6).as("cum_log_adj"))
        .orderBy(col("event_id"))
    },

    // Cash-dividend adjustment end-to-end (Adjust.dividendFactors +
    // applyFactors): dividends = purchases with ex-date the day after,
    // cash = value/100; prev close anchored by an as-of join strictly
    // before the ex-date; bars before an ex-date compound 1 - cash/close.
    // Oracle: DuckDB ASOF JOIN + product window, same strict-later rule.
    // Rounded: product-window tie order at equal (date, side) is
    // unspecified on both engines.
    QueryDef.sqlBacked(
      "mkt_adjust_dividends",
      """WITH bars AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS dt, value
        |  FROM events),
        |divs AS (
        |  SELECT user_id,
        |         CAST(CAST(ts AS TIMESTAMP) AS DATE) + 1 AS ex_date,
        |         value / 100 AS cash
        |  FROM events WHERE event_type = 'purchase'),
        |anchored AS (
        |  SELECT d.user_id, d.ex_date, d.cash, b.value AS prev_close
        |  FROM divs d ASOF LEFT JOIN bars b
        |    ON d.user_id = b.user_id
        |   AND CAST(d.ex_date AS TIMESTAMP) - INTERVAL 1 MICROSECOND >= b.dt),
        |factors AS (
        |  SELECT user_id, ex_date,
        |    CASE WHEN prev_close IS NULL OR prev_close <= cash THEN 1.0
        |         ELSE 1.0 - cash / prev_close END AS f
        |  FROM anchored),
        |u AS (
        |  SELECT event_id, user_id, CAST(dt AS DATE) AS d, 0 AS side,
        |         CAST(NULL AS DOUBLE) AS f
        |  FROM bars
        |  UNION ALL
        |  SELECT NULL, user_id, ex_date, 1, f FROM factors),
        |c AS (
        |  SELECT event_id, user_id, side,
        |    COALESCE(product(f) OVER (PARTITION BY user_id
        |      ORDER BY d DESC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0) AS adj
        |  FROM u)
        |SELECT event_id, user_id, round(adj, 6) AS div_adj
        |FROM c WHERE side = 0
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      // user_id doubles as the ticker key; applyFactors only needs the name
      val bars = ev.select(col("user_id").as("ticker"), col("event_id"),
        col("ts").as("datetime"), col("value").as("c"))
      val divs = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("ticker"),
          date_add(to_date(col("ts")), 1).as("ex_dividend_date"),
          (col("value") / 100).as("cash_amount"))
      val factors = Adjust.dividendFactors(bars, divs)
      Adjust.applyFactors(bars, factors, "ex_date", "div_factor", "div_adj")
        .select(col("event_id"), col("ticker").as("user_id"),
          round(col("div_adj"), 6).as("div_adj"))
        .orderBy(col("event_id"))
    },

    // Incremental watermark append (O-F5/O-J2, SURVEY.md §3-E3): existing
    // sink = events before Jan 20; incoming batch overlaps one day back
    // (at-least-once refetch); visible new rows = strictly past the
    // watermark AND not already present (anti-join) — exactly-once visible.
    QueryDef.sqlBacked(
      "mkt_incremental_append",
      """WITH existing AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'),
        |incoming AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events
        |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-19 00:00:00'),
        |wm AS (SELECT max(ts) AS m FROM existing)
        |SELECT i.event_id, i.user_id, i.ts, i.value
        |FROM incoming i, wm
        |WHERE i.ts > wm.m
        |  AND i.event_id NOT IN (SELECT event_id FROM existing)
        |ORDER BY i.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val existing = ev.filter(col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("ts"))
      val incoming = ev.filter(col("ts") >= lit("2024-01-19 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val wm = existing.agg(max(col("ts")).as("m"))
      incoming.crossJoin(broadcast(wm))
        .filter(col("ts") > col("m"))
        .join(existing.select(col("event_id")), Seq("event_id"), "left_anti")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .orderBy(col("event_id"))
    },

    // Pairwise correlation of daily price CHANGES across the ticker
    // universe — the pairs-trading / risk-clustering primitive. Exactness:
    // prices integerize to cents, per-bucket changes are BIGINT
    // differences (no division anywhere), and Pearson's terms are exact
    // integer sums (n, Σx, Σy, Σx², Σy², Σxy all fit long at these
    // magnitudes) — the final correlation is one deterministic double
    // expression over identical integers in both engines. Scale shape:
    // compact to (ticker, bucket, change) first — the self-join is
    // O(k²·T) in TICKER count, so the screen runs over a WATCHLIST
    // (user_id < 150 here — a correlation screen against the full cross
    // of a large universe is a different tool: the ANN operators over
    // return vectors).
    QueryDef.sqlBacked(
      "mkt_pairwise_corr",
      """WITH b AS (
        |  SELECT user_id, b, p FROM (
        |    SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS b,
        |      CAST(floor(value * 100) AS BIGINT) AS p,
        |      row_number() OVER (
        |        PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |    FROM events WHERE user_id < 150) WHERE rk = 1),
        |r AS (SELECT user_id, b,
        |        p - lag(p) OVER (PARTITION BY user_id ORDER BY b) AS r
        |      FROM b),
        |rr AS (SELECT user_id, b, r FROM r WHERE r IS NOT NULL),
        |j AS (SELECT x.user_id AS user_a, y.user_id AS user_b,
        |             x.r AS ra, y.r AS rb
        |      FROM rr x JOIN rr y ON x.b = y.b AND x.user_id < y.user_id),
        |s AS (SELECT user_a, user_b, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
        |        CAST(sum(ra * ra) AS BIGINT) AS saa,
        |        CAST(sum(rb * rb) AS BIGINT) AS sbb,
        |        CAST(sum(ra * rb) AS BIGINT) AS sab
        |      FROM j GROUP BY 1, 2)
        |SELECT user_a, user_b, n,
        |  round(CAST(n * sab - sa * sb AS DOUBLE) /
        |        sqrt(CAST(n * saa - sa * sa AS DOUBLE)
        |             * CAST(n * sbb - sb * sb AS DOUBLE)), 6) AS corr
        |FROM s
        |WHERE n >= 20 AND n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
        |ORDER BY user_a, user_b""".stripMargin) { (s, d) =>
      pairwiseCorrelation(Tables.events(s, d).filter(col("user_id") < 150),
        minOverlap = 20)
    },

    // MARKET BETA per ticker — the single-factor exposure every risk
    // model starts from: m_day = the watchlist's summed daily change (an
    // inclusive equal-weight index — the stock is part of its own
    // market, as in any cap-weighted benchmark), beta_i = cov(r_i, m) /
    // var(m) over the ticker's change days. Same derivation head (b/r/rr
    // CTEs) and exactness contract as the correlation family: the five
    // moments are exact BIGINT sums, the combination is one
    // identical-op-order double formula rounded at the end.
    QueryDef.sqlBacked(
      "mkt_beta",
      """WITH b AS (
        |  SELECT user_id, b, p FROM (
        |    SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS b,
        |      CAST(floor(value * 100) AS BIGINT) AS p,
        |      row_number() OVER (
        |        PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |    FROM events WHERE user_id < 150) WHERE rk = 1),
        |r AS (SELECT user_id, b,
        |        p - lag(p) OVER (PARTITION BY user_id ORDER BY b) AS r
        |      FROM b),
        |rr AS (SELECT user_id, b, r FROM r WHERE r IS NOT NULL),
        |m AS (SELECT b, CAST(sum(r) AS BIGINT) AS m FROM rr GROUP BY b),
        |j AS (SELECT rr.user_id, rr.r, m.m FROM rr JOIN m USING (b)),
        |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(r) AS BIGINT) AS sr, CAST(sum(m) AS BIGINT) AS sm,
        |        CAST(sum(r * m) AS BIGINT) AS srm,
        |        CAST(sum(m * m) AS BIGINT) AS smm
        |      FROM j GROUP BY 1)
        |SELECT user_id, n,
        |  round(CAST(n * srm - sr * sm AS DOUBLE) /
        |        CAST(n * smm - sm * sm AS DOUBLE), 6) AS beta
        |FROM s
        |WHERE n >= 20 AND n * smm - sm * sm > 0
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      marketBeta(Tables.events(s, d).filter(col("user_id") < 150),
        minOverlap = 20)
    },

    // TREND — per-ticker OLS line over the daily close series (y =
    // cents, x = 1..n day rank): slope is the momentum factor, intercept
    // anchors the line. Same exactness contract as beta/corr: four
    // BIGINT moments (Σx, Σy, Σxy, Σx² — x is the dense rank so Σx, Σx²
    // are exact by construction), slope/intercept derived in one
    // identical-op-order double computation, rounded at the end.
    QueryDef.sqlBacked(
      "mkt_trend",
      """WITH b AS (
        |  SELECT user_id, b, p FROM (
        |    SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS b,
        |      CAST(floor(value * 100) AS BIGINT) AS p,
        |      row_number() OVER (
        |        PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |    FROM events WHERE user_id < 150) WHERE rk = 1),
        |x AS (SELECT user_id, p,
        |        CAST(row_number() OVER (PARTITION BY user_id ORDER BY b)
        |             AS BIGINT) AS x
        |      FROM b),
        |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(p) AS BIGINT) AS sy,
        |        CAST(sum(x * p) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx
        |      FROM x GROUP BY 1)
        |SELECT user_id, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_day,
        |  round((CAST(sy AS DOUBLE) -
        |         CAST(n * sxy - sx * sy AS DOUBLE) /
        |         CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        / CAST(n AS DOUBLE), 6) AS intercept_cents
        |FROM s
        |WHERE n >= 20
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      trendLine(Tables.events(s, d).filter(col("user_id") < 150),
        minDays = 20)
    },

    // ROLLING pairwise correlation over the watchlist — the time-varying
    // risk monitor (a pair decorrelating THIS month is the signal; the
    // static screen only says they correlate on average). Same integer
    // exactness as mkt_pairwise_corr, window-framed.
    QueryDef.sqlBacked(
      "mkt_rolling_corr",
      """WITH b AS (
        |  SELECT user_id, b, p FROM (
        |    SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS b,
        |      CAST(floor(value * 100) AS BIGINT) AS p,
        |      row_number() OVER (
        |        PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |    FROM events WHERE user_id < 150) WHERE rk = 1),
        |r AS (SELECT user_id, b,
        |        p - lag(p) OVER (PARTITION BY user_id ORDER BY b) AS r
        |      FROM b),
        |rr AS (SELECT user_id, b, r FROM r WHERE r IS NOT NULL),
        |j AS (SELECT x.user_id AS user_a, y.user_id AS user_b, x.b AS b,
        |             x.r AS ra, y.r AS rb
        |      FROM rr x JOIN rr y ON x.b = y.b AND x.user_id < y.user_id),
        |w AS (SELECT user_a, user_b, b,
        |        CAST(count(*) OVER win AS BIGINT) AS n,
        |        CAST(sum(ra) OVER win AS BIGINT) AS sa,
        |        CAST(sum(rb) OVER win AS BIGINT) AS sb,
        |        CAST(sum(ra * ra) OVER win AS BIGINT) AS saa,
        |        CAST(sum(rb * rb) OVER win AS BIGINT) AS sbb,
        |        CAST(sum(ra * rb) OVER win AS BIGINT) AS sab
        |      FROM j
        |      WINDOW win AS (PARTITION BY user_a, user_b ORDER BY b
        |                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT user_a, user_b, b AS day,
        |  round(CAST(n * sab - sa * sb AS DOUBLE) /
        |        sqrt(CAST(n * saa - sa * sa AS DOUBLE)
        |             * CAST(n * sbb - sb * sb AS DOUBLE)), 6) AS corr
        |FROM w
        |WHERE n = 10 AND n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
        |ORDER BY user_a, user_b, day""".stripMargin) { (s, d) =>
      rollingCorrelation(Tables.events(s, d).filter(col("user_id") < 150),
        window = 10)
    },

    // FULL-UNIVERSE correlation screen — the ANN escape hatch the
    // watchlist query above documents: per-ticker centered daily-change
    // vectors on the shared day grid (cosine == Pearson under full
    // coverage), bucketed by the SAME hyperplane-LSH as the embedding
    // dedup, candidates verified with the exact cosine. Oracle-exact via
    // the established plane-regeneration pattern (dedup_embedding_lsh):
    // the SQL twin rebuilds the day grid, the centered vectors, the
    // 288×dims plane matrix from the same integer formula (dims derived
    // from the data in both engines), the 48 band codes, and the exact
    // verification — end to end, no literals. Scale shape: candidate
    // generation shuffles id pairs only; the O(k²) cross of the watchlist
    // tool never appears.
    QueryDef.sqlBacked(
      "mkt_corr_screen",
      """WITH b AS (
        |  SELECT user_id, b, p FROM (
        |    SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS b,
        |      CAST(floor(value * 100) AS BIGINT) AS p,
        |      row_number() OVER (
        |        PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1),
        |r AS (SELECT user_id, b,
        |        p - lag(p) OVER (PARTITION BY user_id ORDER BY b) AS r
        |      FROM b),
        |rr AS (SELECT user_id, b, r FROM r WHERE r IS NOT NULL),
        |grid AS (SELECT b, CAST(row_number() OVER (ORDER BY b) AS INT) AS i
        |         FROM (SELECT DISTINCT b FROM rr)),
        |dims AS (SELECT count(*) AS d FROM grid),
        |mu AS (SELECT user_id, CAST(sum(r) AS DOUBLE) / count(*) AS mu
        |       FROM rr GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM rr),
        |sp AS (SELECT rr.user_id, g.i, CAST(rr.r AS DOUBLE) - m.mu AS x
        |       FROM rr JOIN grid g USING (b) JOIN mu m USING (user_id)),
        |cells AS (SELECT u.user_id, g.i, coalesce(sp.x, 0.0) AS x
        |          FROM u CROSS JOIN grid g
        |          LEFT JOIN sp ON sp.user_id = u.user_id AND sp.i = g.i),
        |vec AS (SELECT user_id, list(x ORDER BY i) AS e
        |        FROM cells GROUP BY 1 HAVING sum(x * x) > 0),
        |pl AS (SELECT p, list_transform(range(CAST(d AS INT)), dd ->
        |        (xor((p * d + dd) * 2654435761 % 4294967296,
        |             ((p * d + dd) * 2654435761 % 4294967296) // 65536)
        |         % 65536) / 65536.0 * 2 - 1) AS plane
        |      FROM (SELECT unnest(range(288)) AS p), dims),
        |codes AS (
        |  SELECT vec.user_id, p // 6 AS band,
        |    CAST(sum(CASE WHEN list_dot_product(vec.e, pl.plane) > 0
        |                  THEN 1 << CAST(p % 6 AS INT) ELSE 0 END) AS BIGINT)
        |      AS code
        |  FROM vec CROSS JOIN pl GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.user_id AS vec_a, b2.user_id AS vec_b
        |  FROM codes a JOIN codes b2
        |    ON a.band = b2.band AND a.code = b2.code AND a.user_id < b2.user_id),
        |v AS (SELECT vec_a, vec_b,
        |        round(list_cosine_similarity(ea.e, eb.e), 6) AS cos
        |      FROM cand
        |      JOIN vec ea ON vec_a = ea.user_id
        |      JOIN vec eb ON vec_b = eb.user_id)
        |SELECT vec_a, vec_b, cos FROM v WHERE cos >= 0.42
        |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
      val vecs = returnVectors(Tables.events(s, d))
      val dims = vecs.schema("embedding").metadata.getLong("graft.rv.dims").toInt
      SimilarityOps.cosinePairsLsh(vecs, threshold = 0.42, dims = dims)
    },

    // Vectorized SMA-crossover BACKTEST — the reference's raison d'être
    // (README.md:3 "algotrading env": back-data exists to trade on).
    // Long when the fast SMA exceeds the slow, position taken NEXT bar (no
    // lookahead: the signal is lagged before it earns), per-bar PnL in
    // price points, cumulative equity and peak drawdown. EVERYTHING is
    // integer-cents arithmetic: prices integerize once (floor(p·100)), the
    // SMA comparison cross-multiplies instead of dividing, and cumsum /
    // running-max of BIGINT are exact under ANY window implementation —
    // no float enters the computation, so the oracle is hash-exact and a
    // 1000-executor run bit-matches this one. One shuffle (by key), then
    // a single sorted window pass per key.
    QueryDef.sqlBacked(
      "mkt_backtest_sma",
      s"""WITH $backtestCtes
         |SELECT event_id, user_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(pnl_cents AS BIGINT) AS pnl_cents,
         |  CAST(cum_pnl_cents AS BIGINT) AS cum_pnl_cents,
         |  CAST(peak - cum_pnl_cents AS BIGINT) AS drawdown_cents
         |FROM eq
         |ORDER BY event_id""".stripMargin) { (s, d) =>
      backtestSmaCross(Tables.events(s, d), fast = 5, slow = 20)
    },

    // Per-key backtest report card: total PnL, worst drawdown, exposure,
    // win/loss bar counts, and entry count — the numbers a strategy
    // review reads first. Same integer-cents exactness as the per-bar
    // query (counts and sums of BIGINT only; hit RATE is left to the
    // consumer so no division enters the contract).
    QueryDef.sqlBacked(
      "mkt_backtest_summary",
      s"""WITH $backtestCtes,
         |fl AS (SELECT user_id, pos, pnl_cents, cum_pnl_cents, peak,
         |         coalesce(lag(pos) OVER (PARTITION BY user_id ORDER BY rn), 0)
         |           AS prev_pos
         |       FROM eq)
         |SELECT user_id,
         |  CAST(sum(pnl_cents) AS BIGINT) AS total_pnl_cents,
         |  CAST(max(peak - cum_pnl_cents) AS BIGINT) AS max_drawdown_cents,
         |  CAST(sum(pos) AS BIGINT) AS bars_long,
         |  CAST(count(*) FILTER (WHERE pos = 1 AND pnl_cents > 0) AS BIGINT)
         |    AS win_bars,
         |  CAST(count(*) FILTER (WHERE pos = 1 AND pnl_cents < 0) AS BIGINT)
         |    AS loss_bars,
         |  CAST(count(*) FILTER (WHERE pos = 1 AND prev_pos = 0) AS BIGINT)
         |    AS n_entries
         |FROM fl
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      backtestSummary(Tables.events(s, d), fast = 5, slow = 20)
    },

    // PORTFOLIO roll-up of the backtest — the book-level view a desk reads:
    // mark every key's equity to a shared day grid (last bar per key per
    // day, forward-filled over days with no bar — a key's equity persists
    // between its trades; 0 before its first bar), sum across keys, and
    // take the running-peak drawdown of the aggregate curve. Exactness:
    // everything downstream of the integer-cents backtest is BIGINT sums
    // and maxes — no float enters. Scale: the grid is calendar-bounded
    // (~2.5k days/decade, broadcast), the forward fill is one per-key
    // window over grid-sized frames, and the final drawdown window runs
    // over grid-cardinality rows — the same constant-bounded exemption as
    // the corr screen's day grid.
    QueryDef.sqlBacked(
      "mkt_backtest_portfolio",
      s"""WITH $portfolioCtes
         |SELECT day, equity_cents, drawdown_cents
         |FROM dd
         |ORDER BY day""".stripMargin) { (s, d) =>
      backtestPortfolio(Tables.events(s, d), fast = 5, slow = 20)
    },

    // RISK REPORT over the portfolio equity curve — the one-row numbers a
    // risk desk pins above the chart: peak equity, worst drawdown, days
    // underwater, and the LONGEST underwater streak (gaps-and-islands over
    // the day grid: island id = global row_number minus within-underwater
    // row_number, both deterministic on the unique day key). Shares
    // `portfolioCtes` with mkt_backtest_portfolio so the two contracts
    // cannot drift. Exactness: the curve is BIGINT cents end to end, so
    // every stat is an integer count/max — nothing to round. Scale: all
    // windows run over the calendar-bounded day grid (the portfolio
    // query's documented exemption); the final aggregates are single-pass.
    QueryDef.sqlBacked(
      "mkt_risk_stats",
      s"""WITH $portfolioCtes,
         |m AS (SELECT day, equity_cents, drawdown_cents,
         |        row_number() OVER (ORDER BY day) AS rn,
         |        CASE WHEN drawdown_cents > 0 THEN 1 ELSE 0 END AS uw
         |      FROM dd),
         |runs AS (SELECT grp, count(*) AS len FROM (
         |           SELECT rn - row_number() OVER (ORDER BY day) AS grp
         |           FROM m WHERE uw = 1) i
         |         GROUP BY grp),
         |b AS (SELECT count(*) AS n_days,
         |        arg_max(equity_cents, day) AS final_equity_cents,
         |        max(equity_cents) AS peak_equity_cents,
         |        max(drawdown_cents) AS max_drawdown_cents,
         |        sum(uw) AS n_underwater_days
         |      FROM m),
         |r AS (SELECT coalesce(max(len), 0) AS longest_underwater_days
         |      FROM runs)
         |SELECT CAST(b.n_days AS BIGINT) AS n_days,
         |  CAST(b.final_equity_cents AS BIGINT) AS final_equity_cents,
         |  CAST(b.peak_equity_cents AS BIGINT) AS peak_equity_cents,
         |  CAST(b.max_drawdown_cents AS BIGINT) AS max_drawdown_cents,
         |  CAST(b.n_underwater_days AS BIGINT) AS n_underwater_days,
         |  CAST(r.longest_underwater_days AS BIGINT) AS longest_underwater_days
         |FROM b CROSS JOIN r""".stripMargin) { (s, d) =>
      riskStats(Tables.events(s, d), fast = 5, slow = 20)
    },

    // GAP SCAN — series-completeness audit: per key, consecutive tick
    // pairs whose spacing exceeds the tolerance, reported as (gap_start,
    // gap_end, gap_seconds). The QA pass a backfill owner runs to find
    // the holes the incremental watermark protocol
    // (old_source/old_source_op.py:129-176) can NEVER see: a watermark
    // only knows the newest t, not that an exchange outage left a void
    // mid-history; this scan is how those voids become re-fetch work
    // orders. Exactness: both engines floor each timestamp to whole
    // seconds before differencing (Spark cast-to-long, DuckDB date_diff
    // 'second' — floor(b)−floor(a) on each side), and the lead window's
    // (ts, event_id) order is total. Scale: one shuffle by key, one
    // sorted window pass, codegen filter downstream — the same shape as
    // every indicator.
    QueryDef.sqlBacked(
      "mkt_gap_scan",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events),
        |d AS (SELECT user_id, ts,
        |        lead(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS nxt
        |      FROM e)
        |SELECT user_id, ts AS gap_start, nxt AS gap_end,
        |  CAST(date_diff('second', ts, nxt) AS BIGINT) AS gap_seconds
        |FROM d
        |WHERE nxt IS NOT NULL AND date_diff('second', ts, nxt) > 86400
        |ORDER BY user_id, gap_start, gap_end""".stripMargin) { (s, d) =>
      gapScan(Tables.events(s, d), maxGapSeconds = 86400L)
    },

    // PANEL BUILDER — every series aligned onto the common day grid with
    // forward-fill: the point-in-time matrix cross-sectional analysis
    // starts from (the portfolio query builds exactly this grid+ffill
    // internally; here it is the first-class product). Cells before a
    // key's first observation stay NULL — forward-fill never invents
    // history. Exactness: the daily close is the arg-max row under the
    // (ts, event_id) total order and its raw double rides through with
    // ZERO arithmetic, so both engines emit the identical parquet bits;
    // the ffill window's (user_id, day) key is unique by construction.
    // Scale: one shuffle to daily grain (row_number prunes to close),
    // the calendar-bounded grid broadcasts, one ffill window per key.
    QueryDef.sqlBacked(
      "mkt_panel_ffill",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             value
        |           FROM events),
        |d AS (SELECT user_id, date_trunc('day', ts) AS day, value,
        |        row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |                           ORDER BY ts DESC, event_id DESC) AS rk
        |      FROM e),
        |l AS (SELECT user_id, day, value FROM d WHERE rk = 1),
        |grid AS (SELECT DISTINCT day FROM l),
        |u AS (SELECT DISTINCT user_id FROM l),
        |cells AS (SELECT u.user_id, g.day, l.value,
        |            l.value IS NOT NULL AS is_observed
        |          FROM u CROSS JOIN grid g
        |          LEFT JOIN l ON l.user_id = u.user_id AND l.day = g.day)
        |SELECT user_id, day,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS close,
        |  is_observed
        |FROM cells
        |ORDER BY user_id, day""".stripMargin) { (s, d) =>
      panelFfill(Tables.events(s, d))
    },

    // TWAP — time-weighted average price, the execution-quality benchmark
    // (the time-axis twin of mkt_vwap20's volume weighting): each tick's
    // price is weighted by the WHOLE seconds it was in force (to the next
    // tick; the final tick has no holding interval and is excluded —
    // both engines drop the NULL lead). Exactness: integer-cent price ×
    // integer-second holding time accumulate as exact BIGINTs, one
    // double division at the end — identical operands, bit-equal. Scale:
    // one shuffle by key for the lead window, then a partial-aggregated
    // groupBy — the indicator shape.
    QueryDef.sqlBacked(
      "mkt_twap",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |             CAST(floor(value * 100) AS BIGINT) AS p
        |           FROM events),
        |d AS (SELECT user_id, p,
        |        date_diff('second', ts,
        |          lead(ts) OVER (PARTITION BY user_id
        |                         ORDER BY ts, event_id)) AS dt
        |      FROM e)
        |SELECT user_id,
        |  CAST(sum(p * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE) / 100
        |    AS twap,
        |  CAST(sum(dt) AS BIGINT) AS total_seconds
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      twap(Tables.events(s, d))
    },

    // CUSUM CHANGEPOINT detection — the sequential drift detector (Page
    // 1954): per key, two one-sided cumulative sums over integer-cent
    // price deltas, s⁺ = max(0, s⁺ + δ − k) and s⁻ = max(0, s⁻ − δ − k);
    // crossing h raises an alarm (1 = upward, 2 = downward) and restarts
    // both sums. Catches sustained small drifts the spike detector's
    // single-row threshold never sees. Exactness: the recursion is pure
    // BIGINT max/add; the oracle walks it with a RECURSIVE CTE stepping
    // every key's i-th tick in lockstep (depth = longest series — the
    // dedup_cluster closure device). Deliberately NOT a list_reduce
    // struct fold: DuckDB 1.0 mis-evaluates repeated conditional
    // subexpressions across struct fields in CHAINED lambda folds
    // (single-step folds verify correct, chained folds drift — found by
    // this query's own oracle failing against a Python reference), so
    // the recursion lives in plain battle-tested SQL. Scale: Spark runs
    // one shuffle by key and one sorted fold pass, state two longs (the
    // per-step CTE join is oracle-side only).
    QueryDef.sqlBacked(
      "mkt_cusum",
      """WITH RECURSIVE e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         CAST(floor(value * 100) AS BIGINT) AS p
        |  FROM events),
        |g AS (SELECT user_id,
        |    list(p ORDER BY ts, event_id) AS xs,
        |    list(event_id ORDER BY ts, event_id) AS ids
        |  FROM e GROUP BY user_id),
        |dl AS (SELECT user_id, ids,
        |    list_transform(range(2, len(xs) + 1), i -> xs[i] - xs[i-1]) AS ds
        |  FROM g),
        |u AS (SELECT user_id, unnest(ids) AS event_id,
        |             unnest(range(1, len(ids) + 1)) AS i, ds FROM dl),
        |d2 AS (SELECT user_id, i, event_id, ds[i-1] AS d FROM u),
        |rec(user_id, i, sp, sn, alarm) AS (
        |  SELECT user_id, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        |  FROM d2 WHERE i = 1
        |  UNION ALL
        |  SELECT r.user_id, r.i + 1,
        |    CASE WHEN greatest(0, r.sp + s.d - 1000) > 15000
        |           OR greatest(0, r.sn - s.d - 1000) > 15000
        |         THEN CAST(0 AS BIGINT)
        |         ELSE greatest(0, r.sp + s.d - 1000) END,
        |    CASE WHEN greatest(0, r.sp + s.d - 1000) > 15000
        |           OR greatest(0, r.sn - s.d - 1000) > 15000
        |         THEN CAST(0 AS BIGINT)
        |         ELSE greatest(0, r.sn - s.d - 1000) END,
        |    CASE WHEN greatest(0, r.sp + s.d - 1000) > 15000 THEN 1
        |         WHEN greatest(0, r.sn - s.d - 1000) > 15000 THEN 2
        |         ELSE 0 END
        |  FROM rec r JOIN d2 s ON s.user_id = r.user_id AND s.i = r.i + 1)
        |SELECT s.event_id, rec.user_id, rec.sp AS s_pos, rec.sn AS s_neg,
        |       rec.alarm
        |FROM rec JOIN d2 s ON s.user_id = rec.user_id AND s.i = rec.i
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      cusum(s, Tables.events(s, d), slackCents = 1000L,
        thresholdCents = 15000L)
    }
  )

  /** Series gap scan — see the mkt_gap_scan QueryDef. `maxGapSeconds` is
    * the spacing tolerance in WHOLE seconds (timestamps are floored to
    * seconds before differencing, matching the oracle's date_diff).
    */
}

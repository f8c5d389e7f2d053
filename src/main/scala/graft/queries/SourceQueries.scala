package graft.queries

import graft.QueryDef
import graft.sources.PolygonFixtures
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Declared queries that run THROUGH the polygon DataSourceV2 — pagination
  * with duplicate-bearing boundary overlap, multi-granularity series
  * pruning, and dimension-endpoint scans — against the deterministic page
  * tree PolygonFixtures derives from events.parquet. The DuckDB oracle
  * recomputes each answer straight from events.parquet using the same
  * mapping (see PolygonFixtures scaladoc), so a green row proves the whole
  * source path end-to-end: discover → paginate → dedup → push down → join.
  */
object SourceQueries {

  val defs: Seq[QueryDef] = Seq(

    // Flagship dim-join (O-SRC1 + O-SRC2 + O-J1/O-J3): minute bars scanned
    // from the duplicate-bearing page tree (timespan pushdown prunes the
    // hour series' partitions), tickers scanned from the dimension endpoint
    // with market='stocks' pushed into the scan (O-F3,
    // old_source/old_source_op.py:37-38), dim broadcast, per-ticker rollup.
    QueryDef.sqlBacked(
      "mkt_source_dim_join",
      """WITH b AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t,
        |         arg_min(value, event_id) AS value,
        |         arg_min(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1,
        |                 event_id) AS vol
        |  FROM events
        |  GROUP BY 1, 2)
        |SELECT printf('T%04d', user_id) AS ticker,
        |       'Name ' || printf('T%04d', user_id) AS name,
        |       CAST(count(*) AS BIGINT) AS n_bars,
        |       max(value + 1.0) AS max_h,
        |       min(value - 1.0) AS min_l,
        |       CAST(sum(vol) AS DOUBLE) AS volume
        |FROM b
        |WHERE user_id % 3 = 0
        |GROUP BY user_id
        |ORDER BY ticker""".stripMargin) { (s, d) =>
      val fix = PolygonFixtures.ensure(s, d)
      val bars = s.read.format("polygon").option("path", fix).load()
        .filter(col("timespan") === "minute" && col("multiplier") === 1 &&
          col("adjusted") === true)
      val tickers = s.read.format("polygon").option("path", fix)
        .option("endpoint", "tickers").load()
        .filter(col("market") === "stocks")
        .select(col("ticker"), col("name"))
      bars.join(broadcast(tickers), Seq("ticker"))
        .groupBy(col("ticker"), col("name"))
        .agg(count(lit(1)).as("n_bars"),
          max(col("h")).as("max_h"),
          min(col("l")).as("min_l"),
          // v is integer-valued (json k + 1): the double sum is exact in
          // any order, so no decimal detour is needed for oracle equality
          sum(col("v")).cast(DoubleType).as("volume"))
        .orderBy(col("ticker"))
    },

    // Splits endpoint scan (polygon-etl-container/src/main.py:31): per-ticker
    // split stats off the cursor-paginated dimension chain. All aggregates
    // are exact (count, string min/max, integer-valued double sum).
    QueryDef.sqlBacked(
      "mkt_source_splits",
      """SELECT ticker,
        |  CAST(count(*) AS BIGINT) AS n_splits,
        |  min(execution_date) AS first_date,
        |  max(execution_date) AS last_date,
        |  CAST(sum(split_to) AS DOUBLE) AS sum_to
        |FROM (SELECT printf('T%04d', user_id) AS ticker,
        |             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS execution_date,
        |             CAST(2 + (CAST(json_extract_string(props, '$.k') AS BIGINT) + 1) % 3
        |                  AS DOUBLE) AS split_to
        |      FROM events WHERE event_type = 'signup')
        |GROUP BY ticker
        |ORDER BY ticker""".stripMargin) { (s, d) =>
      val fix = PolygonFixtures.ensure(s, d)
      s.read.format("polygon").option("path", fix)
        .option("endpoint", "splits").load()
        .groupBy(col("ticker"))
        .agg(count(lit(1)).as("n_splits"),
          min(col("execution_date")).as("first_date"),
          max(col("execution_date")).as("last_date"),
          sum(col("split_to")).cast(DoubleType).as("sum_to"))
        .orderBy(col("ticker"))
    },

    // Latest-k-bars-per-series THROUGH the source (O-S1 + O-T1): the
    // protocol is server-ordered (sort=asc at aggregates_stocks_etl.py:49),
    // so ORDER BY t DESC LIMIT k pushes into the scan as a TAIL read —
    // each single-series branch is a fully-pushed TopN (no Sort in its
    // plan, PlanSpec-locked) whose reader fetches O(k/pageSize) tail pages
    // instead of the whole chain; on a year-deep series that is 2 fetches
    // vs ~10^5. The outer ORDER BY re-sorts only the 2k result rows for
    // deterministic output.
    QueryDef.sqlBacked(
      "mkt_source_topk",
      """WITH b AS (
        |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t,
        |         arg_min(value, event_id) AS value,
        |         arg_min(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1,
        |                 event_id) AS vol
        |  FROM events WHERE user_id IN (0, 1)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT printf('T%04d', user_id) AS ticker, t,
        |         value AS o, value + 1.0 AS h, value - 1.0 AS l, value AS c,
        |         CAST(vol AS DOUBLE) AS v,
        |         row_number() OVER (PARTITION BY user_id ORDER BY t DESC) AS rn
        |  FROM b)
        |SELECT ticker, t, o, h, l, c, v FROM r WHERE rn <= 5
        |ORDER BY ticker, t DESC""".stripMargin) { (s, d) =>
      val fix = PolygonFixtures.ensure(s, d)
      def latest(tk: String) = s.read.format("polygon").option("path", fix).load()
        .filter(col("ticker") === tk && col("timespan") === "minute" &&
          col("multiplier") === 1 && col("adjusted") === true)
        .orderBy(col("t").desc).limit(5)
        .select("ticker", "t", "o", "h", "l", "c", "v")
      latest("T0000").unionAll(latest("T0001"))
        .orderBy(col("ticker"), col("t").desc)
    },

    // Dividends endpoint scan — the third reference endpoint
    // (polygon-etl-container/src/main.py:31), aggregated with exact-only
    // functions (count, min/max on identically-derived doubles and date
    // strings; no order-dependent double sums).
    QueryDef.sqlBacked(
      "mkt_source_dividends",
      """SELECT ticker,
        |  CAST(count(*) AS BIGINT) AS n_divs,
        |  max(cash_amount) AS max_cash,
        |  min(ex_dividend_date) AS first_ex,
        |  max(pay_date) AS last_pay
        |FROM (SELECT printf('T%04d', user_id) AS ticker,
        |             value / 100.0 AS cash_amount,
        |             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS ex_dividend_date,
        |             strftime(CAST(ts AS TIMESTAMP) + INTERVAL 2 DAY, '%Y-%m-%d')
        |               AS pay_date
        |      FROM events WHERE event_type = 'purchase')
        |GROUP BY ticker
        |ORDER BY ticker""".stripMargin) { (s, d) =>
      val fix = PolygonFixtures.ensure(s, d)
      s.read.format("polygon").option("path", fix)
        .option("endpoint", "dividends").load()
        .groupBy(col("ticker"))
        .agg(count(lit(1)).as("n_divs"),
          max(col("cash_amount")).as("max_cash"),
          min(col("ex_dividend_date")).as("first_ex"),
          max(col("pay_date")).as("last_pay"))
        .orderBy(col("ticker"))
    }
  )
}

package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The declared relational query inventory (SURVEY.md §2.9, Q01–Q15), each
  * exercising one or more operator rows of SURVEY.md §2 over the driver
  * fixtures, with an exact DuckDB oracle.
  *
  * Oracle-parity rules used throughout (driver hash-compares values):
  *   - Every floating-point aggregate is computed in exact DECIMAL arithmetic
  *     and cast back to DOUBLE at the end: decimal sums are order-independent
  *     integers internally, so Spark and DuckDB produce bit-identical doubles;
  *     a raw `sum(double)` would differ in the last ulps depending on
  *     partitioning / evaluation order.
  *   - DuckDB `SUM(BIGINT)` returns HUGEINT → always CAST ... AS BIGINT.
  *   - Deterministic total ORDER BY on every query (unique key suffix), with
  *     explicit NULLS FIRST where grouping can produce nulls (Spark default
  *     is NULLS FIRST for ASC, DuckDB's is NULLS LAST).
  *   - `events.ts` is parquet timestamp[ns]: Spark truncates to micros on
  *     read, so the oracle must CAST(ts AS TIMESTAMP) (µs) before exposing it.
  */
object Relational {

  private val D18 = DecimalType(18, 2)
  private val D12 = DecimalType(12, 2)

  /** Exact double-valued sum of a 2-decimal money/quantity column. */
  private def dsum(c: Column): Column = sum(c.cast(D18)).cast(DoubleType)

  val defs: Seq[QueryDef] = Seq(

    // Q01 — O-F1/O-F2/O-P1: filter + project (reference: market='stocks' scan,
    // airflow-dags/dag_aggregates_etl.py:54, polygon-etl-container/src/main.py:34).
    QueryDef.sqlBacked(
      "q01_filter_project",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Q02 — O-A1/O-A2/O-U2: distinct (reference dedup contract,
    // polygon-etl-container/src/reference_endpoints_etl.py:56).
    QueryDef.sqlBacked(
      "q02_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Q03 — O-A3/O-A5/O-A6: scalar min/max/count (watermark discovery,
    // old_source/old_source_op.py:133).
    QueryDef.sqlBacked(
      "q03_minmax_count",
      """SELECT max(l_shipdate) AS max_ship, min(l_shipdate) AS min_ship,
        |       count(*) AS n
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .agg(max(col("l_shipdate")).as("max_ship"),
             min(col("l_shipdate")).as("min_ship"),
             count(lit(1)).as("n"))
    },

    // Q04 — O-A7 grouped multi-aggregate (TPC-H Q1 shape). Exact decimal path:
    // (12,2)*(12,2)→(25,4); ×(12,2)→(38,6) — at the precision cap in both
    // engines, no precision-loss rounding on either side.
    QueryDef.sqlBacked(
      "q04_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val price = col("l_extendedprice").cast(D12)
      val disc = (lit(1) - col("l_discount")).cast(D12)
      val tax = (lit(1) + col("l_tax")).cast(D12)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(price * disc).cast(DoubleType).as("sum_disc_price"),
          sum(price * disc * tax).cast(DoubleType).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Q05 — O-J3: enrichment equi-join + group (bars ⋈ tickers analogue).
    // customer is the small dim → broadcast (SURVEY.md §2.3 O-J1 note).
    QueryDef.sqlBacked(
      "q05_join_revenue",
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
              col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    },

    // Q06 — O-J1 semi / O-J2 anti (ticker-universe restriction; idempotent
    // append anti-join).
    QueryDef.sqlBacked(
      "q06_semi_anti",
      """SELECT 'no_orders' AS kind, count(*) AS n
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'with_orders' AS kind, count(*) AS n
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY kind""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
      val noO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
      noO.unionAll(withO).orderBy(col("kind"))
    },

    // Q07 — O-J4: non-equi range join (as-of/range join family; the
    // split-adjustment join shape, SURVEY.md §2.3). Equi key + range residual
    // keeps it a hash join, not BNLJ — scale-safe.
    QueryDef.sqlBacked(
      "q07_range_join",
      """SELECT l_orderkey, count(*) AS n_late,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS late_value
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
              col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_late"),
             dsum(col("l_extendedprice")).as("late_value"))
        .orderBy(col("l_orderkey"))
    },

    // Q08 — O-W1: latest-N-per-key via row_number (watermark discovery shape,
    // airflow-dags/dag_aggregates_etl.py:64-95).
    QueryDef.sqlBacked(
      "q08_latest_per_key",
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Q08b — O-W3: rolling window aggregate (SMA analogue over events).
    // Exact: decimal window-sum / window-count instead of avg(double).
    QueryDef.sqlBacked(
      "q08b_moving_avg",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |         OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ma7",
          sum(col("value").cast(D18)).over(w).cast(DoubleType) /
          count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("ma7"))
        .orderBy(col("event_id"))
    },

    // Q09 — O-T1/O-L1/O-S1: top-k (TakeOrderedAndProject; argmax family).
    QueryDef.sqlBacked(
      "q09_topk",
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsum(col("o_totalprice")).as("total_spent"))
        .orderBy(col("total_spent").desc, col("c_custkey"))
        .limit(10)
    },

    // Q10 — O-U1/O-U4: union-all / intersect / except over overlapping halves.
    QueryDef.sqlBacked(
      "q10_set_ops",
      """WITH a AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15),
        |     b AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10)
        |SELECT op, n_nationkey, n_name FROM (
        |  SELECT 'union_all' AS op, * FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'intersect' AS op, * FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'except' AS op, * FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |ORDER BY op, n_nationkey""".stripMargin) { (s, d) =>
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      val a = n.filter(col("n_nationkey") < 15)
      val b = n.filter(col("n_nationkey") >= 10)
      def tag(df: DataFrame, op: String): DataFrame =
        df.select(lit(op).as("op"), col("n_nationkey"), col("n_name"))
      tag(a.unionAll(b), "union_all")
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.except(b), "except"))
        .orderBy(col("op"), col("n_nationkey"))
    },

    // Q11 — O-A8: rollup grouping sets. Explicit NULLS FIRST — engine defaults
    // differ.
    QueryDef.sqlBacked(
      "q11_rollup",
      """SELECT n_regionkey, n_nationkey, count(*) AS n
        |FROM nation
        |GROUP BY ROLLUP(n_regionkey, n_nationkey)
        |ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .rollup(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_regionkey").asc_nulls_first,
                 col("n_nationkey").asc_nulls_first)
    },

    // Q12 — O-X4/O-X5/O-X6: timestamp → date bucketing, daily per-type counts.
    QueryDef.sqlBacked(
      "q12_daily_counts",
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, event_type
        |ORDER BY day, event_type""".stripMargin) { (s, d) =>
      // day emitted as TIMESTAMP, not DATE: pandas-side representations of
      // DATE differ between duckdb (datetime64) and parquet (date objects).
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    },

    // Q13 — O-X12/O-X13: JSON parse + extraction + group-by (props blobs).
    QueryDef.sqlBacked(
      "q13_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("k"))
    },

    // Q14 — O-A7: 5-minute tumbling OHLC bars over events (value as price).
    // The dataset-defining aggregate (SURVEY.md §2.4): o=first h=max l=min
    // c=last via min_by/max_by on event time. Spark `window` and DuckDB
    // `time_bucket` are both epoch-aligned for minute intervals.
    QueryDef.sqlBacked(
      "q14_ohlc_bars",
      """SELECT user_id,
        |  time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket,
        |  arg_min(value, ts) AS o, max(value) AS h, min(value) AS l,
        |  arg_max(value, ts) AS c, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vol
        |FROM events
        |GROUP BY user_id, bucket
        |ORDER BY user_id, bucket""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), window(col("ts"), "5 minutes"))
        .agg(
          min_by(col("value"), col("ts")).as("o"),
          max(col("value")).as("h"),
          min(col("value")).as("l"),
          max_by(col("value"), col("ts")).as("c"),
          count(lit(1)).as("n"),
          dsum(col("value")).as("vol"))
        .select(col("user_id"), col("window.start").as("bucket"),
                col("o"), col("h"), col("l"), col("c"), col("n"), col("vol"))
        .orderBy(col("user_id"), col("bucket"))
    },

    // Q15 — O-W2: cumulative factor per key (split-adjustment shape) as a
    // running sum of log factors. ln() may differ by an ulp between libm
    // implementations → rounded to 6 dp (noise ~1e-13 ≪ 1e-6 spacing).
    QueryDef.sqlBacked(
      "q15_cumulative_factor",
      """SELECT event_id, user_id,
        |  round(SUM(ln(1 + value / 1000))
        |    OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS cum_log_factor
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("cum_log_factor",
          round(sum(log(lit(1) + col("value") / 1000)).over(w), 6))
        .select(col("event_id"), col("user_id"), col("cum_log_factor"))
        .orderBy(col("event_id"))
    }
  )
}

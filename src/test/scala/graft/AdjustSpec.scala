package graft

import graft.operators.{Adjust, Indicators}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdjustSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)

  test("multi-split adjustment: factors compound, strictly-later rule, DST date") {
    val bars = Seq(
      // before both splits: factor (1/2)*(1/4) = 0.125
      ("AAPL", ts("2024-02-01 10:00:00"), 100.0, 101.0, 99.0, 100.0, 1000.0),
      // 2024-03-10 is a US DST-spring-forward date; bar ON the 4:1 split day
      // must NOT be adjusted by that split (strictly later), only by the
      // later 2:1 → 0.5
      ("AAPL", ts("2024-03-10 10:00:00"), 400.0, 404.0, 396.0, 400.0, 500.0),
      // after all splits: factor 1
      ("AAPL", ts("2024-06-01 10:00:00"), 50.0, 51.0, 49.0, 50.0, 2000.0),
      // other ticker, no splits: untouched
      ("MSFT", ts("2024-02-01 10:00:00"), 77.0, 78.0, 76.0, 77.0, 10.0)
    ).toDF("ticker", "datetime", "o", "h", "l", "c", "v")
    val splits = Seq(
      ("AAPL", d("2024-03-10"), 1.0, 4.0), // 4:1 on the DST boundary date
      ("AAPL", d("2024-05-01"), 1.0, 2.0)  // later 2:1
    ).toDF("ticker", "execution_date", "split_from", "split_to")

    val out = Adjust.adjustBars(bars, splits)
      .select("ticker", "datetime", "adj_factor", "adj_c", "adj_v")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val (f1, c1, v1) = out(("AAPL", "2024-02-01"))
    assert(f1 == 0.125 && c1 == 12.5 && v1 == 8000.0,
      s"pre-split bar wrong: $f1 $c1 $v1")
    val (f2, c2, _) = out(("AAPL", "2024-03-10"))
    assert(f2 == 0.5 && c2 == 200.0,
      s"same-day split must not apply (strictly later): $f2 $c2")
    val (f3, _, _) = out(("AAPL", "2024-06-01"))
    assert(f3 == 1.0)
    val (f4, _, _) = out(("MSFT", "2024-02-01"))
    assert(f4 == 1.0)
  }

  test("dividend adjustment: factor from prev close, strictly-later compounding") {
    val bars = Seq(
      ("AAPL", ts("2024-01-10 16:00:00"), 100.0), // prev close for the div
      ("AAPL", ts("2024-01-11 16:00:00"), 95.0),  // ex-date bar: NOT adjusted
      ("AAPL", ts("2024-01-12 16:00:00"), 96.0)
    ).toDF("ticker", "datetime", "c")
    val dividends = Seq(
      ("AAPL", d("2024-01-11"), 5.0, 4) // $5 on prev close 100 → factor 0.95
    ).toDF("ticker", "ex_dividend_date", "cash_amount", "frequency")

    val factors = Adjust.dividendFactors(bars, dividends)
    val f = factors.select("div_factor").as[Double].head()
    assert(f == 0.95, s"factor should be 1 - 5/100: $f")

    val adjusted = Adjust.applyFactors(bars, factors,
      "ex_date", "div_factor", "div_adj")
      .select(col("datetime"), col("div_adj"))
      .collect().map(r => r.getTimestamp(0).toString.take(10) -> r.getDouble(1))
      .toMap
    assert(adjusted("2024-01-10") == 0.95, "pre-ex-date bar must be scaled")
    assert(adjusted("2024-01-11") == 1.0, "ex-date bar itself is unadjusted")
    assert(adjusted("2024-01-12") == 1.0)
  }

  test("dividend factor degenerate cases: no prior close, dividend >= close") {
    val bars = Seq(("NEW", ts("2024-02-01 16:00:00"), 10.0))
      .toDF("ticker", "datetime", "c")
    val dividends = Seq(
      ("NEW", d("2024-01-15"), 2.0, 4),  // before any bar: no prev close
      ("NEW", d("2024-02-05"), 50.0, 4)  // absurd: cash >= close
    ).toDF("ticker", "ex_dividend_date", "cash_amount", "frequency")
    val factors = Adjust.dividendFactors(bars, dividends)
      .collect().map(r => r.getDate(1).toString -> r.getDouble(2)).toMap
    assert(factors("2024-01-15") == 1.0, "no prior close → neutral factor")
    assert(factors("2024-02-05") == 1.0, "cash >= close → neutral, not negative")
  }

  test("indicators: sma/vwap/rsi behave on a deterministic ramp") {
    val bars = (1 to 30).map(i =>
      ("T", ts(f"2024-01-01 ${9 + i / 60}%02d:${i % 60}%02d:00"), i.toDouble, 10.0))
      .toDF("ticker", "datetime", "c", "v")
    val out = Indicators.enrich(bars)
      .orderBy(col("datetime"))
      .select("c", "sma20", "vwap20", "rsi14")
      .collect()
    // 20th row (price 20): sma20 = avg(1..20) = 10.5; vwap = same (const vol)
    assert(out(19).getDouble(1) == 10.5)
    assert(out(19).getDouble(2) == 10.5)
    // monotone ramp: all gains → RSI 100 once warm
    assert(out(29).getDouble(3) == 100.0)
  }
}

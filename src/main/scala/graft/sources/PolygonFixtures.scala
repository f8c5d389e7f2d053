package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic canned page tree derived from the driver's events fixture,
  * so declared queries can exercise the full polygon source protocol
  * (pagination with duplicate-bearing boundary overlap, multi-granularity
  * series dirs, dimension endpoints) while a DuckDB oracle recomputes the
  * same answer straight from events.parquet.
  *
  * Mapping (mirrored EXACTLY by the oracle SQL in SourceQueries):
  *   ticker      = printf("T%04d", user_id)
  *   bar         = one event: t = epoch-ms(ts), o = c = vw = value,
  *                 h = value + 1.0, l = value - 1.0,
  *                 v = json k + 1 (nonzero volume), n = 1
  *   dedup       = first event per (user, t-ms) by event_id (collision-proof
  *                 at any scale factor; the driver data has none today)
  *   tickers dim = one row per user; market cycles stocks/crypto/fx on
  *                 user_id % 3 — so market='stocks' selects user_id % 3 = 0
  *   splits      = signup events;  dividends = purchase events
  *
  * The tree carries TWO granularities per ticker — minute--1--adjusted (the
  * per-event bars) and hour--1--adjusted (driver-side 1h refold) — so a
  * timespan pushdown provably prunes; the hour series content never enters
  * an oracle-checked query.
  *
  * The build is cached per scale-factor dir under java.io.tmpdir and keyed
  * by the events row count, so Verify/Bench pay it once.
  */
object PolygonFixtures {

  private final case class Ev(eventId: Long, userId: Long, t: Long,
                              value: Double, vol: Long, eventType: String)

  /** Build (or reuse) the fixture tree for sfDir; returns its path. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val events = graft.Tables.events(spark, sfDir)
    val root = Paths.get(sys.props("java.io.tmpdir"),
      "graft_polyfix_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = root.resolve("_FIXTURE_OK")
    val rows = events.count()
    val stamp = s"rows=$rows"
    if (Files.exists(marker) &&
        new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == stamp)
      return root.toString

    // single bounded driver-side materialization: this writes a fixture
    // (harness work), it is not a query plan; ~100k rows at sf0.1
    val evs = events
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t"),
        col("value"),
        (get_json_object(col("props"), "$.k").cast("long") + 1).as("vol"),
        col("event_type"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getString(5)))

    deleteRecursively(root)
    Files.createDirectories(root)

    val byUser = evs.groupBy(_.userId).toSeq.sortBy(_._1)
    byUser.foreach { case (uid, rows0) =>
      val ticker = f"T$uid%04d"
      // first-by-event_id per ms timestamp, then ascending t (sort=asc)
      val bars = rows0.groupBy(_.t).map { case (_, g) => g.minBy(_.eventId) }
        .toSeq.sortBy(_.t)
      writeBarSeries(root.resolve(ticker).resolve("minute--1--adjusted"),
        bars, pageSize = 50, overlap = true)
      writeBarSeries(root.resolve(ticker).resolve("hour--1--adjusted"),
        refoldHour(bars), pageSize = 1000, overlap = false)
    }

    writeDimPages(root.resolve("_ref/tickers"),
      byUser.map { case (uid, _) =>
        val ticker = f"T$uid%04d"
        val market = (uid % 3) match {
          case 0 => "stocks"; case 1 => "crypto"; case _ => "fx"
        }
        s"""{"ticker":"$ticker","name":"Name $ticker","market":"$market",""" +
          s""""locale":"us","primary_exchange":"X${uid % 4}","type":"CS",""" +
          s""""active":${uid % 2 == 0},"currency_name":"usd"}"""
      }, pageSize = 100)

    writeDimPages(root.resolve("_ref/splits"),
      evs.filter(_.eventType == "signup").sortBy(_.eventId).map { e =>
        s"""{"ticker":"T${"%04d".format(e.userId)}","execution_date":"${isoDate(e.t)}",""" +
          s""""split_from":1.0,"split_to":${2 + e.vol % 3}.0}"""
      }.toSeq, pageSize = 200)

    writeDimPages(root.resolve("_ref/dividends"),
      evs.filter(_.eventType == "purchase").sortBy(_.eventId).map { e =>
        s"""{"ticker":"T${"%04d".format(e.userId)}","ex_dividend_date":"${isoDate(e.t)}",""" +
          s""""pay_date":"${isoDate(e.t + 86400000L * 2)}",""" +
          s""""cash_amount":${jsonDouble(e.value / 100.0)},"frequency":4}"""
      }.toSeq, pageSize = 200)

    Files.write(marker, stamp.getBytes(StandardCharsets.UTF_8))
    root.toString
  }

  private def isoDate(tMs: Long): String =
    java.time.Instant.ofEpochMilli(tMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** Shortest round-trip double repr — what jackson/DuckDB parse back to the
    * identical IEEE value.
    */
  private def jsonDouble(d: Double): String =
    if (d == d.toLong.toDouble) s"${d.toLong}.0" else d.toString

  private def barJson(e: Ev): String =
    s"""{"t":${e.t},"o":${jsonDouble(e.value)},"h":${jsonDouble(e.value + 1.0)},""" +
      s""""l":${jsonDouble(e.value - 1.0)},"c":${jsonDouble(e.value)},""" +
      s""""v":${e.vol}.0,"vw":${jsonDouble(e.value)},"n":1}"""

  /** 1-hour refold of the per-event bars (content is never oracle-checked;
    * it exists so the tree is genuinely mixed-granularity).
    */
  private def refoldHour(bars: Seq[Ev]): Seq[Ev] =
    bars.groupBy(e => e.t - math.floorMod(e.t, 3600000L)).toSeq.sortBy(_._1)
      .map { case (bucket, g) =>
        val first = g.minBy(_.t)
        Ev(first.eventId, first.userId, bucket, first.value, g.map(_.vol).sum,
          first.eventType)
      }

  /** Write a bar series as a cursor-chained page dir; with overlap, each
    * page re-serves the previous page's last bar (the O-SRC2 duplicate-by-
    * design the reader's monotonic dedup must absorb).
    */
  private def writeBarSeries(dir: Path, bars: Seq[Ev], pageSize: Int,
                             overlap: Boolean): Unit = {
    Files.createDirectories(dir)
    val chunks = bars.grouped(pageSize).toSeq match {
      case Seq() => Seq(Seq.empty[Ev])
      case cs => cs
    }
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val withOverlap =
        if (overlap && i > 0) chunks(i - 1).last +: chunk else chunk
      val next =
        if (i < chunks.size - 1) "\"" + f"page-${i + 1}%04d.json" + "\"" else "null"
      val body = withOverlap.map(barJson).mkString("[", ",", "]")
      Files.write(dir.resolve(f"page-$i%04d.json"),
        s"""{"status":"OK","results":$body,"next_url":$next}"""
          .getBytes(StandardCharsets.UTF_8))
    }
  }

  private def writeDimPages(dir: Path, rows: Seq[String], pageSize: Int): Unit = {
    Files.createDirectories(dir)
    val chunks = rows.grouped(pageSize).toSeq match {
      case Seq() => Seq(Seq.empty[String])
      case cs => cs
    }
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val next =
        if (i < chunks.size - 1) "\"" + f"page-${i + 1}%04d.json" + "\"" else "null"
      Files.write(dir.resolve(f"page-$i%04d.json"),
        s"""{"status":"OK","results":${chunk.mkString("[", ",", "]")},"next_url":$next}"""
          .getBytes(StandardCharsets.UTF_8))
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}

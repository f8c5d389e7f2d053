package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.HashPartitioner
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
  * per-event bars) and hour--1--adjusted (1h refold) — so a timespan
  * pushdown provably prunes; the hour series content never enters an
  * oracle-checked query.
  *
  * Generation is EXECUTOR-SIDE (no driver materialization): bar series
  * write from a foreachPartition after a hash repartition on user_id (each
  * task holds only its users' events), dimension pages from a
  * zipWithIndex-paged RDD partitioned by page number — so the build scales
  * with the cluster instead of the driver's heap. The root must be a
  * filesystem every executor can reach (java.io.tmpdir in this local[32]
  * harness; a shared mount on a real cluster). Page bytes are identical to
  * the former driver-side writer, so oracle hashes are unchanged.
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

    deleteRecursively(root)
    Files.createDirectories(root)
    val rootStr = root.toString

    // one scan + JSON projection shared by the four write jobs below (bar
    // series, tickers, splits, dividends) instead of four replays
    val ev = events.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("t"), col("value"),
      (get_json_object(col("props"), "$.k").cast("long") + 1).as("vol"),
      col("event_type")).persist()
    try {

    // bar series: all of a user's events land in one task (hash repartition
    // on user_id), which writes that user's minute chain + hour refold —
    // per-user work is bounded and embarrassingly parallel across users
    ev.repartition(col("user_id")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val evs = it.map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getString(5))).toSeq
        evs.groupBy(_.userId).foreach { case (uid, rows0) =>
          val ticker = f"T$uid%04d"
          // first-by-event_id per ms timestamp, then ascending t (sort=asc)
          val bars = rows0.groupBy(_.t).map { case (_, g) => g.minBy(_.eventId) }
            .toSeq.sortBy(_.t)
          writeBarSeries(Paths.get(rootStr, ticker, "minute--1--adjusted"),
            bars, pageSize = 50, overlap = true)
          writeBarSeries(Paths.get(rootStr, ticker, "hour--1--adjusted"),
            refoldHour(bars), pageSize = 1000, overlap = false)
        }
    }

    writeDimPages(spark, root.resolve("_ref/tickers"),
      ev.select(col("user_id")).distinct().orderBy(col("user_id"))
        .rdd.map { r =>
          val uid = r.getLong(0)
          val ticker = f"T$uid%04d"
          val market = (uid % 3) match {
            case 0 => "stocks"; case 1 => "crypto"; case _ => "fx"
          }
          s"""{"ticker":"$ticker","name":"Name $ticker","market":"$market",""" +
            s""""locale":"us","primary_exchange":"X${uid % 4}","type":"CS",""" +
            s""""active":${uid % 2 == 0},"currency_name":"usd"}"""
        }, pageSize = 100)

    writeDimPages(spark, root.resolve("_ref/splits"),
      ev.filter(col("event_type") === "signup").orderBy(col("event_id"))
        .rdd.map { r =>
          val e = Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
            r.getLong(4), r.getString(5))
          s"""{"ticker":"T${"%04d".format(e.userId)}","execution_date":"${isoDate(e.t)}",""" +
            s""""split_from":1.0,"split_to":${2 + e.vol % 3}.0}"""
        }, pageSize = 200)

    writeDimPages(spark, root.resolve("_ref/dividends"),
      ev.filter(col("event_type") === "purchase").orderBy(col("event_id"))
        .rdd.map { r =>
          val e = Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
            r.getLong(4), r.getString(5))
          s"""{"ticker":"T${"%04d".format(e.userId)}","ex_dividend_date":"${isoDate(e.t)}",""" +
            s""""pay_date":"${isoDate(e.t + 86400000L * 2)}",""" +
            s""""cash_amount":${jsonDouble(e.value / 100.0)},"frequency":4}"""
        }, pageSize = 200)

    Files.write(marker, stamp.getBytes(StandardCharsets.UTF_8))
    } finally ev.unpersist()
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
    * design the reader's monotonic dedup must absorb). Runs on executors.
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

  /** Distributed dimension-page writer: global page index via zipWithIndex
    * over the already-ordered row RDD (no driver collect), pages hashed
    * across tasks, each task writing only its own page files.
    */
  private def writeDimPages(spark: SparkSession, dir: Path,
                            rows: org.apache.spark.rdd.RDD[String],
                            pageSize: Int): Unit = {
    Files.createDirectories(dir)
    val n = rows.count()
    val nPages = math.max(1, math.ceil(n / pageSize.toDouble).toInt)
    val dirStr = dir.toString
    if (n == 0) {
      Files.write(dir.resolve("page-0000.json"),
        """{"status":"OK","results":[],"next_url":null}"""
          .getBytes(StandardCharsets.UTF_8))
      return
    }
    rows.zipWithIndex()
      .map { case (json, i) => ((i / pageSize).toInt, (i, json)) }
      .partitionBy(new HashPartitioner(math.min(nPages, 32)))
      .foreachPartition { it =>
        it.toSeq.groupBy(_._1).foreach { case (page, grp) =>
          val body = grp.map(_._2).sortBy(_._1).map(_._2)
            .mkString("[", ",", "]")
          val next =
            if (page < nPages - 1) "\"" + f"page-${page + 1}%04d.json" + "\""
            else "null"
          Files.write(Paths.get(dirStr, f"page-$page%04d.json"),
            s"""{"status":"OK","results":$body,"next_url":$next}"""
              .getBytes(StandardCharsets.UTF_8))
        }
      }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}

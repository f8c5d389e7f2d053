package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 "polygon" source (SURVEY.md §2 O-SRC1/O-SRC2, §4): the
  * reference's paginated per-ticker bar scan re-expressed as a Spark source.
  *
  *   spark.read.format("polygon").option("path", dir)
  *     .option("tickers", "AAPL,MSFT").load()
  *
  * - One input partition per (ticker, adjusted) series — the reference's
  *   per-ticker ECS fan-out (airflow-dags/dag_aggregates_etl.py:225-335)
  *   becomes partition-level parallelism; at 1000 executors, 1000 series
  *   scan concurrently.
  * - Filter pushdown (SupportsPushDownFilters): ticker equality/IN prunes
  *   partitions (the API's ticker path segment); t-range bounds become the
  *   from/to of the scan (the /range/{from}/{to} URL segment,
  *   polygon-etl-container/src/aggregates_stocks_etl.py:49); adjusted
  *   equality picks the series variant. Unsupported filters stay post-scan.
  * - Limit pushdown (SupportsPushDownLimit) caps rows per series (the
  *   API's `limit=` page parameter).
  * - The reader applies the reference's in-loop watermark skip and
  *   monotonic dedup (O-F6, v2022/.../aggregates_etl.py:128-140) and a
  *   correct progress guard (the reference's is dead code — SURVEY.md §7.4).
  * - Rate limiting is a per-JVM token bucket (`rateLimitMs`) — per-JVM, not
  *   per-task, so executor-level parallelism can't hammer the upstream.
  *
  * Offline mode (the only mode in this zero-egress build): pages are canned
  * JSON files `{path}/{TICKER}/{adjusted|raw}/page-NNNN.json` with the raw
  * response shape (results array + next cursor), including the duplicate-
  * bearing overlaps the real protocol produces. A live HTTP fetcher would
  * implement the same `PageFetcher` trait.
  */
class PolygonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "polygon"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PolygonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PolygonTable(new CaseInsensitiveStringMap(properties))
}

object PolygonSource {
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("o", DoubleType), StructField("h", DoubleType),
    StructField("l", DoubleType), StructField("c", DoubleType),
    StructField("v", DoubleType), StructField("vw", DoubleType),
    StructField("n", LongType),
    StructField("adjusted", BooleanType, nullable = false)))

  /** Per-JVM token bucket: time of the earliest next allowed request. */
  private val nextAllowed = new AtomicLong(0L)

  def rateLimit(intervalMs: Long): Unit = {
    if (intervalMs <= 0) return
    while (true) {
      val now = System.currentTimeMillis()
      val prev = nextAllowed.get()
      val target = math.max(now, prev) + intervalMs
      if (nextAllowed.compareAndSet(prev, target)) {
        val wait = target - intervalMs - now
        if (wait > 0) Thread.sleep(wait)
        return
      }
    }
  }
}

/** One page of the upstream protocol. */
final case class Page(results: Array[Bar0], nextCursor: Option[String])
final case class Bar0(t: Long, o: Double, h: Double, l: Double, c: Double,
                      v: Double, vw: Double, n: Long)

/** The pagination protocol (O-SRC1 cursor form): fetch a cursor, get rows +
  * the next cursor; None terminates. Implementations must tolerate replays
  * (duplicate rows across page boundaries) — the reader dedups.
  */
trait PageFetcher extends Serializable {
  def firstCursor(ticker: String, adjusted: Boolean): Option[String]
  def fetch(cursor: String): Page
}

/** Canned-file fetcher; cursor = file path. Files sort lexicographically as
  * page order (page-0001.json …).
  */
final class FilePageFetcher(root: String) extends PageFetcher {
  @transient private lazy val mapper = new ObjectMapper()

  private def pages(ticker: String, adjusted: Boolean): Seq[String] = {
    val dir = new java.io.File(
      s"$root/$ticker/${if (adjusted) "adjusted" else "raw"}")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".json"))
      .map(_.getPath).sorted.toSeq
  }

  def pageCount(ticker: String, adjusted: Boolean): Int =
    pages(ticker, adjusted).size

  override def firstCursor(ticker: String, adjusted: Boolean): Option[String] =
    pages(ticker, adjusted).headOption

  def cursorAt(ticker: String, adjusted: Boolean, idx: Int): Option[String] =
    pages(ticker, adjusted).drop(idx).headOption

  override def fetch(cursor: String): Page = {
    val node = mapper.readTree(new java.io.File(cursor))
    // upstream error statuses abort the scan (the reference hard-exits on
    // non-200, v2022/etl-containers/reference-data/src/reference_data_etl.py:42-43);
    // "DELAYED" is a success status on deferred-data tiers
    Option(node.get("status")).filterNot(_.isNull).map(_.asText()).foreach { s =>
      if (s != "OK" && s != "DELAYED")
        throw new IllegalStateException(s"polygon page status '$s' at $cursor")
    }
    val results = Option(node.get("results")).map { arr =>
      arr.elements().asScala.map { b =>
        Bar0(b.get("t").asLong(), b.get("o").asDouble(), b.get("h").asDouble(),
          b.get("l").asDouble(), b.get("c").asDouble(), b.get("v").asDouble(),
          b.get("vw").asDouble(), b.get("n").asLong())
      }.toArray
    }.getOrElse(Array.empty[Bar0])
    val next = Option(node.get("next_url"))
      .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
      .map(n => new java.io.File(new java.io.File(cursor).getParentFile, n).getPath)
    Page(results, next)
  }

  /** All (ticker, adjusted) series present under root. */
  def discoverSeries(): Seq[(String, Boolean)] = {
    val rootDir = new java.io.File(root)
    Option(rootDir.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap { t =>
        Option(t.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
          .map(v => (t.getName, v.getName == "adjusted"))
      }.toSeq.sorted
  }
}

class PolygonTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"polygon(${options.get("path")})"
  override def schema(): StructType = PolygonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PolygonScanBuilder(options)
}

class PolygonScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {

  private var tickerFilter: Option[Set[String]] = None
  private var adjustedFilter: Option[Boolean] = None
  private var tFromExcl: Option[Long] = None // strict lower bound (watermark)
  private var tToIncl: Option[Long] = None
  private var limit: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("ticker", _: String) => true
      case In("ticker", _) => true
      case EqualTo("adjusted", _: Boolean) => true
      case GreaterThan("t", _: Long) => true
      // v - 1 folds >= / < into the exclusive/inclusive bound pair below;
      // v == Long.MinValue would underflow that decrement to Long.MaxValue
      // (turning a no-op bound into drop-everything), so leave the
      // degenerate case to Spark post-scan
      case GreaterThanOrEqual("t", v: Long) => v != Long.MinValue
      case LessThan("t", v: Long) => v != Long.MinValue
      case LessThanOrEqual("t", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("ticker", v: String) =>
        tickerFilter = Some(tickerFilter.getOrElse(Set(v)).intersect(Set(v)))
      case In("ticker", vs) =>
        val s = vs.collect { case x: String => x }.toSet
        tickerFilter = Some(tickerFilter.fold(s)(_ intersect s))
      case EqualTo("adjusted", v: Boolean) => adjustedFilter = Some(v)
      case GreaterThan("t", v: Long) =>
        tFromExcl = Some(tFromExcl.fold(v)(math.max(_, v)))
      case GreaterThanOrEqual("t", v: Long) =>
        tFromExcl = Some(tFromExcl.fold(v - 1)(math.max(_, v - 1)))
      case LessThan("t", v: Long) =>
        tToIncl = Some(tToIncl.fold(v - 1)(math.min(_, v - 1)))
      case LessThanOrEqual("t", v: Long) =>
        tToIncl = Some(tToIncl.fold(v)(math.min(_, v)))
      case _ =>
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  override def build(): Scan = new PolygonScan(
    options.get("path"),
    Option(options.get("tickers")).map(_.split(",").map(_.trim).toSet),
    tickerFilter, adjustedFilter, tFromExcl, tToIncl, limit,
    Option(options.get("rateLimitMs")).map(_.toLong).getOrElse(0L),
    pushed)
}

final case class SeriesPartition(ticker: String, adjusted: Boolean,
                                 fromPage: Int, toPage: Int) extends InputPartition

class PolygonScan(path: String, optTickers: Option[Set[String]],
                  tickerFilter: Option[Set[String]],
                  adjustedFilter: Option[Boolean],
                  tFromExcl: Option[Long], tToIncl: Option[Long],
                  limit: Option[Int], rateLimitMs: Long,
                  pushed: Array[Filter]) extends Scan {

  override def readSchema(): StructType = PolygonSource.schema

  override def description(): String =
    s"PolygonScan path=$path PushedFilters=[${pushed.mkString(", ")}] " +
      s"limit=${limit.getOrElse(-1)}"

  private[sources] def series: Seq[(String, Boolean)] = {
    val fetcher = new FilePageFetcher(path)
    val discovered = fetcher.discoverSeries()
    discovered
      .filter { case (t, _) => optTickers.forall(_.contains(t)) }
      .filter { case (t, _) => tickerFilter.forall(_.contains(t)) }
      .filter { case (_, a) => adjustedFilter.forall(_ == a) }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      series.map { case (t, a) => SeriesPartition(t, a, 0, Int.MaxValue) }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PolygonReaderFactory(path, tFromExcl, tToIncl, limit, rateLimitMs)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PolygonMicroBatchStream(path, series, tFromExcl, tToIncl, rateLimitMs)
}

class PolygonReaderFactory(path: String, tFromExcl: Option[Long],
                           tToIncl: Option[Long], limit: Option[Int],
                           rateLimitMs: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeriesPartition]
    new PolygonPartitionReader(new FilePageFetcher(path), sp,
      tFromExcl, tToIncl, limit, rateLimitMs)
  }
}

/** Drives the cursor protocol for one series: page loop with rate limiting,
  * strict-watermark skip, monotonic dedup, range stop, limit stop, and a
  * live progress guard (no-progress page streak aborts the scan instead of
  * spinning — fixing the reference's dead guard at
  * v2022/.../aggregates_etl.py:127,151-155).
  */
class PolygonPartitionReader(fetcher: FilePageFetcher, part: SeriesPartition,
                             tFromExcl: Option[Long], tToIncl: Option[Long],
                             limit: Option[Int], rateLimitMs: Long)
    extends PartitionReader[InternalRow] {

  private val tickerUtf = UTF8String.fromString(part.ticker)
  private var cursor: Option[String] =
    fetcher.cursorAt(part.ticker, part.adjusted, part.fromPage)
  private var pagesRead = 0
  private var buffer: Iterator[Bar0] = Iterator.empty
  private var lastT = Long.MinValue
  private var emitted = 0
  private var noProgressStreak = 0
  private var current: Bar0 = _

  @annotation.tailrec
  private def advance(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    if (buffer.hasNext) {
      val b = buffer.next()
      if (tToIncl.exists(b.t > _)) return false // sorted asc: past range end
      if (b.t <= lastT || tFromExcl.exists(b.t <= _)) advance() // O-F6 skips
      else { lastT = b.t; current = b; emitted += 1; true }
    } else cursor match {
      case Some(c) if pagesRead < part.toPage - part.fromPage =>
        PolygonSource.rateLimit(rateLimitMs)
        val before = lastT
        val page = fetcher.fetch(c)
        pagesRead += 1
        cursor = page.nextCursor
        buffer = page.results.iterator
        // progress guard: a page must move the watermark or end the scan
        noProgressStreak =
          if (page.results.isEmpty || page.results.last.t <= before)
            noProgressStreak + 1
          else 0
        if (noProgressStreak >= 3)
          throw new IllegalStateException(
            s"polygon scan stuck: 3 consecutive no-progress pages at $c")
        advance()
      case _ => false
    }
  }

  override def next(): Boolean = advance()

  override def get(): InternalRow = InternalRow(
    tickerUtf, current.t, current.o, current.h, current.l, current.c,
    current.v, current.vw, current.n, part.adjusted)

  override def close(): Unit = ()
}

/** Streaming form: offsets are per-series page counts — each trigger reads
  * the pages that appeared since the last checkpointed offset (the
  * daily-catch-up protocol of SURVEY.md §2.10 with engine-managed offsets
  * instead of sink-scraping).
  */
final case class PolygonOffset(pages: Map[String, Int]) extends Offset {
  override def json(): String =
    pages.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
}

class PolygonMicroBatchStream(path: String, series: Seq[(String, Boolean)],
                              tFromExcl: Option[Long], tToIncl: Option[Long],
                              rateLimitMs: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private def key(t: String, a: Boolean) = s"$t|${if (a) "adjusted" else "raw"}"
  private val fetcher = new FilePageFetcher(path)

  // Trigger.AvailableNow: pin "latest" to the offsets present when the
  // query started, so pages landing mid-run don't extend the run.
  private var availableNowCap: Option[PolygonOffset] = None

  private def currentLatest(): PolygonOffset =
    PolygonOffset(series.map { case (t, a) =>
      key(t, a) -> fetcher.pageCount(t, a)
    }.toMap)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentLatest())

  override def initialOffset(): Offset =
    PolygonOffset(series.map { case (t, a) => key(t, a) -> 0 }.toMap)

  override def latestOffset(): Offset =
    availableNowCap.getOrElse(currentLatest())

  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no
  // rate-based admission control — each trigger takes everything up to the
  // (possibly pinned) latest offset.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = {
    val m = "\"([^\"]+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
    PolygonOffset(m)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PolygonOffset].pages
    val e = end.asInstanceOf[PolygonOffset].pages
    series.flatMap { case (t, a) =>
      val from = s.getOrElse(key(t, a), 0)
      val to = e.getOrElse(key(t, a), 0)
      if (to > from) Some(SeriesPartition(t, a, from, to)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PolygonReaderFactory(path, tFromExcl, tToIncl, None, rateLimitMs)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

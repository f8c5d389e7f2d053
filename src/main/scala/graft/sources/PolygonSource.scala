package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder => V2SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 "polygon" source (SURVEY.md §2 O-SRC1/O-SRC2, §4): the
  * reference's paginated scans re-expressed as one Spark source with two
  * faces:
  *
  *   // fact scan: multi-granularity bar series
  *   spark.read.format("polygon").option("path", dir).load()
  *   // dimension scan: the v3 reference endpoints
  *   spark.read.format("polygon").option("path", dir)
  *     .option("endpoint", "tickers").load()   // | "splits" | "dividends"
  *
  * - Bars: one input partition per (ticker, timespan, multiplier, adjusted)
  *   series — the reference keys every fetch by exactly this tuple
  *   (old_source/old_source_op.py:18,59: period_list × adjusted per ticker).
  *   The per-ticker ECS fan-out (airflow-dags/dag_aggregates_etl.py:225-335)
  *   becomes partition-level parallelism; at 1000 executors, 1000 series
  *   scan concurrently.
  * - Dimensions: the same cursor protocol over tickers/splits/dividends
  *   (polygon-etl-container/src/main.py:31-33,
  *   reference_endpoints_etl.py:28-53). The cursor chain is inherently
  *   sequential (each page names the next), so a dim scan is one input
  *   partition — correct for <20 MB dims (README.md:20), which broadcast
  *   downstream anyway.
  * - Filter pushdown: ticker/timespan/multiplier/adjusted equality+IN prune
  *   bar partitions (the API's URL path segments); t-range bounds become
  *   the /range/{from}/{to} of the scan; for dims, equality/IN on any
  *   column becomes a server-side query param (the reference pushes
  *   market=stocks exactly this way, old_source/old_source_op.py:37-38).
  * - Limit pushdown caps rows per series (the API's `limit=` parameter).
  * - The reader applies the reference's in-loop watermark skip and
  *   monotonic dedup (O-F6, v2022/.../aggregates_etl.py:128-140) and a
  *   correct progress guard (the reference's is dead code — SURVEY.md §7.4).
  *   A partition resuming mid-chain (streaming) first reads the previous
  *   page's tail timestamp, so the protocol's by-design page-boundary
  *   overlap rows are not re-emitted across micro-batches.
  * - Rate limiting is a per-JVM token bucket (`rateLimitMs`) — per-JVM, not
  *   per-task, so executor-level parallelism can't hammer the upstream.
  *
  * Offline mode (the only mode in this zero-egress build): pages are canned
  * JSON files with the raw response shape (results array + next cursor),
  * including the duplicate-bearing overlaps the real protocol produces:
  *
  *   {path}/{TICKER}/{timespan}--{multiplier}--{adjusted|raw}/page-NNNN.json
  *   {path}/{TICKER}/{adjusted|raw}/page-NNNN.json      (legacy = minute--1)
  *   {path}/_ref/{endpoint}/page-NNNN.json              (dimension pages)
  *
  * A live HTTP fetcher implements the same `PageFetcher` trait.
  */
class PolygonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "polygon"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PolygonSource.schemaFor(Option(options.get("endpoint")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    Option(opts.get("endpoint")) match {
      case None | Some("bars") => new PolygonTable(opts)
      case Some(ep) => new PolygonDimTable(ep, opts)
    }
  }
}

object PolygonSource {
  /** Bar fact schema: the de-facto Polygon aggregate bar (SURVEY.md §1.3)
    * plus the full series key the storage path carries (§1.2).
    */
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("o", DoubleType), StructField("h", DoubleType),
    StructField("l", DoubleType), StructField("c", DoubleType),
    StructField("v", DoubleType), StructField("vw", DoubleType),
    StructField("n", LongType),
    StructField("adjusted", BooleanType, nullable = false),
    StructField("timespan", StringType, nullable = false),
    StructField("multiplier", IntegerType, nullable = false)))

  /** Dimension schemas: the fields the reference's code touches plus the
    * stable public v3 response fields it materializes via inference
    * (SURVEY.md §1.3; v2022/.../reference_data_etl.py:58).
    */
  val tickersSchema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("name", StringType),
    StructField("market", StringType),
    StructField("locale", StringType),
    StructField("primary_exchange", StringType),
    StructField("type", StringType),
    StructField("active", BooleanType),
    StructField("currency_name", StringType)))

  val splitsSchema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("execution_date", StringType),
    StructField("split_from", DoubleType),
    StructField("split_to", DoubleType)))

  val dividendsSchema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("ex_dividend_date", StringType),
    StructField("pay_date", StringType),
    StructField("cash_amount", DoubleType),
    StructField("frequency", LongType)))

  def schemaFor(endpoint: Option[String]): StructType = endpoint match {
    case None | Some("bars") => schema
    case Some("tickers") => tickersSchema
    case Some("splits") => splitsSchema
    case Some("dividends") => dividendsSchema
    case Some(other) =>
      throw new IllegalArgumentException(
        s"unknown polygon endpoint '$other' (expected bars|tickers|splits|dividends)")
  }

  /** Transport selection, carried to executors: a set baseUrl selects the
    * HTTP fetcher (live protocol against a real or stub server); otherwise
    * pages are canned files under `path`.
    */
  final case class FetcherConf(path: String, baseUrl: Option[String],
                               maxRetries: Int, backoffMs: Long)

  def fetcherConf(options: CaseInsensitiveStringMap): FetcherConf = FetcherConf(
    options.get("path"),
    Option(options.get("baseUrl")),
    Option(options.get("maxRetries")).map(_.toInt).getOrElse(3),
    Option(options.get("backoffMs")).map(_.toLong).getOrElse(100L))

  def fetcherFor(conf: FetcherConf): PageFetcher = conf.baseUrl match {
    case Some(url) => new HttpPageFetcher(url, conf.maxRetries, conf.backoffMs)
    case None => new FilePageFetcher(conf.path)
  }

  /** Per-JVM cache of each streaming partition's final dedup watermark,
    * keyed by (path, series, end page): when the next micro-batch resumes
    * at that page boundary, its reader seeds the monotonic dedup from here
    * instead of re-fetching the previous page just to learn one tail
    * timestamp (which would double steady-state page fetches AND burn a
    * rate-limit token). Executor-local: on a multi-executor cluster a
    * partition landing on a different JVM misses and falls back to the
    * refetch — a correctness-neutral cache.
    */
  private val boundaryCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Long]()

  def recordBoundary(path: String, series: String, endPage: Int, t: Long): Unit =
    boundaryCache.put((path, series, endPage), t)

  /** Consume-once: each recorded boundary serves exactly the one successor
    * micro-batch that resumes at that page, so a hit removes the entry —
    * bounding the map at one live entry per in-flight series instead of one
    * per (series × batch) forever (a long-running streaming executor would
    * otherwise leak without bound). A re-read after failure misses and falls
    * back to the boundary-page refetch, which is correctness-neutral.
    */
  def lookupBoundary(path: String, series: String, fromPage: Int): Option[Long] =
    Option(boundaryCache.remove((path, series, fromPage)))

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

/** Full series identity: the reference keys every bar fetch by exactly this
  * tuple (old_source/old_source_op.py:18,59 — period_list × adjusted per
  * ticker; file name {ticker}--{timespan}--{multiplier}--{adjusted}.csv at
  * :146).
  */
final case class SeriesKey(ticker: String, timespan: String,
                           multiplier: Int, adjusted: Boolean) {
  def variant: String = if (adjusted) "adjusted" else "raw"
  def dirName: String = s"$timespan--$multiplier--$variant"
  def offsetKey: String = s"$ticker|$timespan|$multiplier|$variant"
}

object SeriesKey {
  /** Parse a series directory name; legacy `adjusted|raw` = 1-minute. */
  def fromDir(ticker: String, dir: String): Option[SeriesKey] = dir match {
    case "adjusted" => Some(SeriesKey(ticker, "minute", 1, adjusted = true))
    case "raw" => Some(SeriesKey(ticker, "minute", 1, adjusted = false))
    case s => s.split("--") match {
      case Array(ts, m, v) if (v == "adjusted" || v == "raw") && m.forall(_.isDigit) =>
        Some(SeriesKey(ticker, ts, m.toInt, v == "adjusted"))
      case _ => None
    }
  }
}

/** One page of the upstream protocol. */
final case class Page(results: Array[Bar0], nextCursor: Option[String])
final case class Bar0(t: Long, o: Double, h: Double, l: Double, c: Double,
                      v: Double, vw: Double, n: Long)

/** The pagination protocol (O-SRC1 cursor form): resolve a series' page
  * chain to a starting cursor, fetch a cursor, get rows + the next cursor;
  * None terminates. Implementations must tolerate replays (duplicate rows
  * across page boundaries) — the reader dedups. Retry/backoff for transient
  * upstream failures lives INSIDE the fetcher (HttpPageFetcher), so the
  * reader's protocol loop stays transport-agnostic.
  */
trait PageFetcher extends Serializable {
  /** Cursor positioned at page `idx` of a series' chain (0 = first). */
  def cursorAt(key: SeriesKey, idx: Int): Option[String]
  def firstCursor(key: SeriesKey): Option[String] = cursorAt(key, 0)
  def fetch(cursor: String): Page
  /** Number of pages in a series' chain, when the transport can list it
    * (file layout). None for cursor-only transports (http) — a tail scan
    * (ORDER BY t DESC LIMIT k pushdown) needs this to start from the end.
    */
  def chainLength(key: SeriesKey): Option[Int] = None
  /** Whether the page at `cursor` exists RIGHT NOW — the streaming frontier
    * probe for transports with no listing (chainLength None), where absence
    * (http 404) is an answer, not an error. Only called on such transports.
    */
  def pageExists(cursor: String): Boolean =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not support frontier probing")
  /** Raw page parse (record nodes + resolved next cursor) for readers whose
    * records are not bars (dimension endpoints).
    */
  def fetchRaw(cursor: String): (Seq[JsonNode], Option[String]) =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not serve raw pages")
  /** First cursor of a dimension endpoint's page chain
    * (reference_endpoints_etl.py:28-53 walks exactly this).
    */
  def dimFirstCursor(endpoint: String): Option[String] =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not serve dimension endpoints")
}

/** Response-shape parsing shared by every transport. */
private[sources] object PageJson {
  /** Validate status, return (results nodes, raw next cursor). The
    * reference hard-exits on non-200 / error statuses
    * (v2022/etl-containers/reference-data/src/reference_data_etl.py:42-43);
    * "DELAYED" is a success status on deferred-data tiers.
    */
  def parse(node: JsonNode, where: String): (Seq[JsonNode], Option[String]) = {
    Option(node.get("status")).filterNot(_.isNull).map(_.asText()).foreach { s =>
      if (s != "OK" && s != "DELAYED")
        throw new IllegalStateException(s"polygon page status '$s' at $where")
    }
    val results = Option(node.get("results"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val next = Option(node.get("next_url"))
      .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    (results, next)
  }

  def bars(results: Seq[JsonNode]): Array[Bar0] =
    results.map { b =>
      Bar0(b.get("t").asLong(), b.get("o").asDouble(), b.get("h").asDouble(),
        b.get("l").asDouble(), b.get("c").asDouble(), b.get("v").asDouble(),
        b.get("vw").asDouble(), b.get("n").asLong())
    }.toArray
}

/** Live HTTP fetcher: the transport the reference actually uses
  * (polygon-etl-container/src/reference_endpoints_etl.py:28-53 follows
  * next_url cursors over requests.get;
  * aggregates_stocks_etl.py:55-57 aborts on non-200). Adds what the
  * reference lacks: bounded retry with exponential backoff on transient
  * failures (connection errors, 5xx) and 429 rate-limit handling honoring
  * Retry-After — per the stated <100 req/s guidance
  * (v2022/.../reference_data_etl.py:21-22).
  *
  * Cursor scheme: absolute URLs. The entry cursor for a series' chain is
  * {base}/pages/{ticker}/{seriesDir}/{idx}; subsequent cursors come from
  * each response's next_url (resolved against the current cursor).
  */
final class HttpPageFetcher(baseUrl: String, maxRetries: Int = 3,
                            backoffMs: Long = 100L) extends PageFetcher {
  @transient private lazy val mapper = new ObjectMapper()

  override def cursorAt(key: SeriesKey, idx: Int): Option[String] =
    Some(s"$baseUrl/pages/${key.ticker}/${key.dirName}/$idx")

  override def fetch(cursor: String): Page = {
    val (results, next) = fetchRaw(cursor)
    Page(PageJson.bars(results), next)
  }

  override def fetchRaw(cursor: String): (Seq[JsonNode], Option[String]) = {
    // request never returns None with notFoundOk=false (404 throws), so the
    // .get cannot fail
    val node = request(cursor, notFoundOk = false).get
    val (results, nextRaw) = PageJson.parse(node, cursor)
    (results, nextRaw.map(n => java.net.URI.create(cursor).resolve(n).toString))
  }

  /** Dimension chains live beside the bar chains under the same indexed
    * layout: {base}/pages/_ref/{endpoint}/{idx}.
    */
  override def dimFirstCursor(endpoint: String): Option[String] =
    Some(s"$baseUrl/pages/_ref/$endpoint/0")

  /** Streaming frontier probe: a 404 means "no such page yet" (false); every
    * other failure follows fetch's retry/abort discipline. The body of an
    * existing page is drained (keep-alive) and discarded — a probe's only
    * payload is existence.
    */
  override def pageExists(cursor: String): Boolean =
    request(cursor, notFoundOk = true).isDefined

  /** GET with bounded retry + backoff; None iff 404 and notFoundOk. */
  private def request(cursor: String, notFoundOk: Boolean): Option[JsonNode] = {
    var attempt = 0
    while (true) {
      var code = -1
      var retryAfter: Option[Long] = None
      var conn: java.net.HttpURLConnection = null
      try {
        conn = java.net.URI.create(cursor).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(15000)
        code = conn.getResponseCode
        if (code == 200) {
          // fully read + close the body (NOT disconnect): a drained, closed
          // stream returns the socket to the keep-alive pool for the next
          // page; leaving it open under repeated fetches exhausts sockets
          val in = conn.getInputStream
          val node = try mapper.readTree(in) finally in.close()
          conn = null // success: keep the pooled connection alive
          return Some(node)
        }
        retryAfter = Option(conn.getHeaderField("Retry-After"))
          .flatMap(_.toLongOption).map(_ * 1000L)
        // drain+close the error body so the connection can be reused by the
        // RETRY — and then don't disconnect it (the finally is for
        // connection-level failures whose socket state is unknown)
        Option(conn.getErrorStream).foreach { es =>
          try { while (es.read() != -1) () } catch { case _: java.io.IOException => }
          es.close()
        }
        conn = null
      } catch {
        case _: java.io.IOException => code = -1 // connection-level failure
      } finally {
        if (conn != null) conn.disconnect()
      }
      if (code == 404 && notFoundOk) return None
      val retryable = code == -1 || code == 429 || code >= 500
      if (!retryable)
        throw new IllegalStateException(s"polygon HTTP $code at $cursor")
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"polygon HTTP $code at $cursor after $maxRetries retries")
      // 429 honors the server's Retry-After; otherwise exponential backoff,
      // shift capped so a large maxRetries can't overflow to a negative sleep
      Thread.sleep(retryAfter.getOrElse(backoffMs << math.min(attempt - 1, 16)))
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Canned-file fetcher; cursor = file path. Files sort lexicographically as
  * page order (page-0001.json …).
  */
final class FilePageFetcher(rawRoot: String) extends PageFetcher {
  // the sink/watermark layer is Hadoop-FS-agnostic and callers naturally
  // pass the same file:-URI pagesDir here; strip the scheme instead of
  // silently finding no pages under a literal "./file:" relative path
  private val root = FilePageFetcher.localPath(rawRoot)
  @transient private lazy val mapper = new ObjectMapper()

  private def pagesIn(dir: java.io.File): Seq[String] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".json"))
      .map(_.getPath).sorted.toSeq

  private def pages(key: SeriesKey): Seq[String] = {
    val base = new java.io.File(s"$root/${key.ticker}")
    val preferred = new java.io.File(base, key.dirName)
    // legacy layout: {ticker}/{adjusted|raw} holds the 1-minute series
    val dir =
      if (preferred.isDirectory) preferred
      else if (key.timespan == "minute" && key.multiplier == 1)
        new java.io.File(base, key.variant)
      else preferred
    pagesIn(dir)
  }

  def pageCount(key: SeriesKey): Int = pages(key).size

  override def chainLength(key: SeriesKey): Option[Int] = Some(pageCount(key))

  override def pageExists(cursor: String): Boolean =
    new java.io.File(cursor).isFile

  override def cursorAt(key: SeriesKey, idx: Int): Option[String] =
    pages(key).drop(idx).headOption

  /** Raw page parse shared by the bar and dimension readers; next_url
    * resolves relative to the cursor's directory.
    */
  override def fetchRaw(cursor: String): (Seq[JsonNode], Option[String]) = {
    val (results, nextRaw) = PageJson.parse(mapper.readTree(new java.io.File(cursor)), cursor)
    (results, nextRaw.map(n =>
      new java.io.File(new java.io.File(cursor).getParentFile, n).getPath))
  }

  override def fetch(cursor: String): Page = {
    val (results, next) = fetchRaw(cursor)
    Page(PageJson.bars(results), next)
  }

  /** All bar series present under root (dirs starting with "_" are reserved:
    * _ref holds dimension pages). Distinct: a mid-migration tree holding
    * BOTH a legacy `adjusted` dir and `minute--1--adjusted` maps them to the
    * same SeriesKey — two partitions for one key would double every row.
    */
  def discoverSeries(): Seq[SeriesKey] = {
    val rootDir = new java.io.File(root)
    Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .flatMap { t =>
        Option(t.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
          .flatMap(v => SeriesKey.fromDir(t.getName, v.getName))
      }.toSeq.distinct.sortBy(_.offsetKey)
  }

  /** First cursor of a dimension endpoint's page chain. */
  override def dimFirstCursor(endpoint: String): Option[String] =
    pagesIn(new java.io.File(s"$root/_ref/$endpoint")).headOption

  /** Page count of a dimension endpoint's chain (the dim stream's offset). */
  def dimPageCount(endpoint: String): Int =
    pagesIn(new java.io.File(s"$root/_ref/$endpoint")).size

  /** Non-negative content signature of a dim chain — (name, size, mtime) of
    * every page folded — so the dim stream also notices an IN-PLACE refresh
    * that keeps the page count (a renamed ticker, a flipped active flag):
    * offset equality, not just count growth, decides whether a snapshot
    * batch fires.
    */
  def dimChainSignature(endpoint: String): Int = {
    var h = 17L
    pagesIn(new java.io.File(s"$root/_ref/$endpoint")).foreach { p =>
      val f = new java.io.File(p)
      h = h * 31 + p.hashCode
      h = h * 31 + f.length()
      h = h * 31 + f.lastModified()
    }
    (h & 0x7fffffff).toInt
  }
}

object FilePageFetcher {
  /** file:-URI → local path (file:/x, file:///x); other strings unchanged. */
  def localPath(p: String): String =
    if (p.startsWith("file:")) new java.io.File(java.net.URI.create(p)).getPath
    else p
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
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var tickerFilter: Option[Set[String]] = None
  private var timespanFilter: Option[Set[String]] = None
  private var multiplierFilter: Option[Set[Int]] = None
  private var adjustedFilter: Option[Boolean] = None
  private var tFromExcl: Option[Long] = None // strict lower bound (watermark)
  private var tToIncl: Option[Long] = None
  private var limit: Option[Int] = None
  private var topN: Option[(Boolean, Int)] = None // (descending, k)
  private var pushed: Array[Filter] = Array.empty

  private def intersect[T](cur: Option[Set[T]], vs: Set[T]): Option[Set[T]] =
    Some(cur.fold(vs)(_ intersect vs))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("ticker", _: String) => true
      case In("ticker", _) => true
      case EqualTo("timespan", _: String) => true
      case In("timespan", _) => true
      case EqualTo("multiplier", _: Int) => true
      case In("multiplier", _) => true
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
      case EqualTo("ticker", v: String) => tickerFilter = intersect(tickerFilter, Set(v))
      case In("ticker", vs) =>
        tickerFilter = intersect(tickerFilter, vs.collect { case x: String => x }.toSet)
      case EqualTo("timespan", v: String) => timespanFilter = intersect(timespanFilter, Set(v))
      case In("timespan", vs) =>
        timespanFilter = intersect(timespanFilter, vs.collect { case x: String => x }.toSet)
      case EqualTo("multiplier", v: Int) => multiplierFilter = intersect(multiplierFilter, Set(v))
      case In("multiplier", vs) =>
        multiplierFilter = intersect(multiplierFilter, vs.collect { case x: Int => x }.toSet)
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
    cachedScan = null
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean =
    { limit = Some(l); cachedScan = null; false }

  /** ORDER BY t [ASC|DESC] LIMIT k pushdown (O-S1/O-T1): the protocol is
    * server-ordered — every reference fetch carries sort=asc
    * (polygon-etl-container/src/aggregates_stocks_etl.py:49,
    * old_source/old_source_op.py:17,59) — so the scan can satisfy a
    * t-ordered top-k itself. ASC: each partition already emits ascending,
    * so the first k rows per series ARE its top-k (the existing limit stop).
    * DESC ("latest k bars"): the reader walks the page chain BACKWARD from
    * the tail, fetching O(k/pageSize) pages instead of the whole chain —
    * on a year-deep series that's the difference between 2 page fetches
    * and ~10^5. DESC needs a listable chain (file layout); the cursor-only
    * http transport keeps its Sort.
    *
    * Fully pushed (Spark drops Sort AND Limit) only when the filters pin
    * exactly ONE series: a single partition's ordered output is the global
    * answer. With several series each partition returns its own top-k and
    * Spark's TakeOrderedAndProject merges — still the 100 TB-correct shape
    * (k rows per series cross the shuffle, not the chains).
    */
  override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean = {
    if (orders.length != 1) return false
    val o = orders(0)
    val onT = o.expression() match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference =>
        n.fieldNames().length == 1 && n.fieldNames()(0).equalsIgnoreCase("t")
      case _ => false
    }
    if (!onT) return false
    val desc = o.direction() == SortDirection.DESCENDING
    if (desc && options.get("baseUrl") != null) return false // no backward walk
    topN = Some((desc, l))
    if (!desc) limit = Some(limit.fold(l)(math.min(_, l)))
    cachedScan = null
    true
  }

  override def isPartiallyPushed(): Boolean = buildScan().series.length != 1

  // one scan instance per builder state: pushdown calls (filters → topN →
  // build) all mutate before the first buildScan() consumer, and caching
  // means isPartiallyPushed's series resolution (a page-tree listing in
  // file mode) is walked once, not re-walked by build()
  private var cachedScan: PolygonScan = null

  private def buildScan(): PolygonScan = {
    if (cachedScan == null) cachedScan = new PolygonScan(
      PolygonSource.fetcherConf(options),
      Option(options.get("tickers")).map(_.split(",").map(_.trim).toSet),
      Option(options.get("series")).map(_.split(",").map(_.trim).toSeq),
      tickerFilter, timespanFilter, multiplierFilter, adjustedFilter,
      tFromExcl, tToIncl, limit, topN,
      Option(options.get("rateLimitMs")).map(_.toLong).getOrElse(0L),
      pushed,
      Option(options.get("maxPagesPerTrigger")).map(_.toInt))
    cachedScan
  }

  override def build(): Scan = buildScan()
}

final case class SeriesPartition(key: SeriesKey, fromPage: Int, toPage: Int)
    extends InputPartition

class PolygonScan(conf: PolygonSource.FetcherConf,
                  optTickers: Option[Set[String]],
                  optSeries: Option[Seq[String]],
                  tickerFilter: Option[Set[String]],
                  timespanFilter: Option[Set[String]],
                  multiplierFilter: Option[Set[Int]],
                  adjustedFilter: Option[Boolean],
                  tFromExcl: Option[Long], tToIncl: Option[Long],
                  limit: Option[Int], topN: Option[(Boolean, Int)],
                  rateLimitMs: Long,
                  pushed: Array[Filter],
                  maxPagesPerTrigger: Option[Int] = None)
    extends Scan with SupportsReportOrdering {

  override def readSchema(): StructType = PolygonSource.schema

  override def description(): String =
    s"PolygonScan path=${conf.path} PushedFilters=[${pushed.mkString(", ")}] " +
      s"limit=${limit.getOrElse(-1)}" +
      topN.fold("") { case (desc, k) =>
        s" PushedTopN=[t ${if (desc) "DESC" else "ASC"}, $k]"
      }

  private[sources] lazy val series: Seq[SeriesKey] = {
    // file mode discovers series from the page tree; http mode has no
    // listing, so the series universe is declared via options (the
    // reference does the same: its ticker universe comes from the tickers
    // dim, its granularities from config — old_source_op.py:18,215-221)
    val discovered = conf.baseUrl match {
      case None => new FilePageFetcher(conf.path).discoverSeries()
      case Some(_) =>
        val dirs = optSeries.getOrElse(Seq("minute--1--adjusted"))
        // http has no listing: the ticker universe comes from the option or,
        // when absent, from a pushed ticker equality/IN — never silently
        // empty (a filter naming exact series must fetch them, not 0 rows)
        val universe = optTickers.orElse(tickerFilter).getOrElse(
          throw new IllegalArgumentException(
            "polygon http mode needs a 'tickers' option or a pushed " +
              "ticker equality/IN filter to define the series universe"))
        for {
          t <- universe.toSeq.sorted
          d <- dirs
          k <- SeriesKey.fromDir(t, d)
        } yield k
    }
    discovered
      .filter(k => optTickers.forall(_.contains(k.ticker)))
      .filter(k => tickerFilter.forall(_.contains(k.ticker)))
      .filter(k => timespanFilter.forall(_.contains(k.timespan)))
      .filter(k => multiplierFilter.forall(_.contains(k.multiplier)))
      .filter(k => adjustedFilter.forall(_ == k.adjusted))
  }

  /** O-S1: the protocol is server-ordered (sort=asc in every reference
    * fetch URL), so each partition emits ascending t — accurate
    * per-partition metadata for the planner (a descending TopN scan inverts
    * it). Sort ELIMINATION is carried by the TopN pushdown above; this
    * report covers the remaining planner uses of per-partition order.
    */
  override def outputOrdering(): Array[V2SortOrder] = {
    val desc = topN.exists(_._1)
    Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column("t"),
      if (desc) SortDirection.DESCENDING else SortDirection.ASCENDING))
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      series.map(k => SeriesPartition(k, 0, Int.MaxValue)).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PolygonReaderFactory(conf, tFromExcl, tToIncl, limit, rateLimitMs,
        topNDesc = topN.collect { case (true, k) => k })
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PolygonMicroBatchStream(conf, series, tFromExcl, tToIncl, rateLimitMs,
      maxPagesPerTrigger)
}

class PolygonReaderFactory(conf: PolygonSource.FetcherConf,
                           tFromExcl: Option[Long],
                           tToIncl: Option[Long], limit: Option[Int],
                           rateLimitMs: Long,
                           topNDesc: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeriesPartition]
    topNDesc match {
      case Some(k) => new PolygonTailReader(PolygonSource.fetcherFor(conf), sp,
        tFromExcl, tToIncl, k, rateLimitMs)
      case None => new PolygonPartitionReader(PolygonSource.fetcherFor(conf), sp,
        tFromExcl, tToIncl, limit, rateLimitMs,
        // boundary-cache namespace: the transport's root (path may be unset
        // in http mode, baseUrl in file mode — never both)
        cachePath = conf.baseUrl.getOrElse(conf.path))
    }
  }
}

/** Drives the cursor protocol for one series: page loop with rate limiting,
  * strict-watermark skip, monotonic dedup, range stop, limit stop, and a
  * live progress guard (no-progress page streak aborts the scan instead of
  * spinning — fixing the reference's dead guard at
  * v2022/.../aggregates_etl.py:127,151-155).
  *
  * A partition resuming mid-chain (fromPage > 0, i.e. a streaming
  * micro-batch after the first) seeds the monotonic-dedup watermark from
  * the tail timestamp of the page just before its range: the protocol's
  * page-boundary overlap (O-SRC2's date-granularity restart) re-serves rows
  * the previous micro-batch already emitted, and without the seed those
  * duplicates would re-enter the stream and double-count downstream
  * aggregates that don't themselves dedup.
  */
class PolygonPartitionReader(fetcher: PageFetcher, part: SeriesPartition,
                             tFromExcl: Option[Long], tToIncl: Option[Long],
                             limit: Option[Int], rateLimitMs: Long,
                             cachePath: String = "")
    extends PartitionReader[InternalRow] {

  private val tickerUtf = UTF8String.fromString(part.key.ticker)
  private val timespanUtf = UTF8String.fromString(part.key.timespan)
  private var cursor: Option[String] =
    fetcher.cursorAt(part.key, part.fromPage)
  private var pagesRead = 0
  private var buffer: Iterator[Bar0] = Iterator.empty
  private var lastT: Long = boundarySeed()
  private var emitted = 0
  private var noProgressStreak = 0
  private var current: Bar0 = _

  /** Dedup watermark at this partition's starting boundary (see class doc):
    * the previous micro-batch's final watermark when this JVM saw it (free),
    * else the tail timestamp of the page just before fromPage (one refetch).
    */
  private def boundarySeed(): Long =
    if (part.fromPage <= 0) Long.MinValue
    else PolygonSource.lookupBoundary(cachePath, part.key.offsetKey, part.fromPage)
      .getOrElse {
        fetcher.cursorAt(part.key, part.fromPage - 1) match {
          case Some(prev) =>
            PolygonSource.rateLimit(rateLimitMs)
            val rows = fetcher.fetch(prev).results
            if (rows.isEmpty) Long.MinValue else rows.map(_.t).max
          case None => Long.MinValue
        }
      }

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
    current.v, current.vw, current.n, part.key.adjusted,
    timespanUtf, part.key.multiplier)

  override def close(): Unit =
    // bounded (streaming) partitions publish their final watermark for the
    // next micro-batch's boundarySeed; the max emitted t is always a safe
    // dedup bound for pages past this range (sorted-asc protocol)
    if (part.toPage != Int.MaxValue)
      PolygonSource.recordBoundary(cachePath, part.key.offsetKey,
        part.fromPage + pagesRead, lastT)
}

/** Tail reader for a pushed ORDER BY t DESC LIMIT k: walks the series' page
  * chain BACKWARD from the last page, collecting in-range rows until k are
  * on hand, then emits the k largest in descending t — O(k/pageSize + 1)
  * page fetches instead of the whole chain. The protocol's page-boundary
  * overlap (each page re-serves its predecessor's last bar) is absorbed by
  * the strictly-ascending-t invariant: walking backward, any row with
  * t >= the smallest t already seen is a duplicate.
  */
class PolygonTailReader(fetcher: PageFetcher, part: SeriesPartition,
                        tFromExcl: Option[Long], tToIncl: Option[Long],
                        k: Int, rateLimitMs: Long)
    extends PartitionReader[InternalRow] {

  private val tickerUtf = UTF8String.fromString(part.key.ticker)
  private val timespanUtf = UTF8String.fromString(part.key.timespan)
  private var current: Bar0 = _

  private val rows: Iterator[Bar0] = {
    val nPages = fetcher.chainLength(part.key).getOrElse(
      throw new IllegalStateException(
        "tail scan needs a listable page chain (file layout)"))
    val collected = scala.collection.mutable.ArrayBuffer.empty[Bar0]
    var seenMin = Long.MaxValue
    var page = nPages - 1
    while (page >= 0 && collected.length < k) {
      fetcher.cursorAt(part.key, page).foreach { c =>
        PolygonSource.rateLimit(rateLimitMs)
        // the duplicate threshold is the min t of LATER pages (this page's
        // own rows ascend, so testing against a running min would drop
        // everything after its first row); out-of-range rows also drop
        val threshold = seenMin
        fetcher.fetch(c).results.foreach { b =>
          if (b.t < threshold) {
            if (b.t < seenMin) seenMin = b.t
            if (tFromExcl.forall(b.t > _) && tToIncl.forall(b.t <= _))
              collected += b
          }
        }
      }
      page -= 1
    }
    collected.sortBy(-_.t).take(k).iterator
  }

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = InternalRow(
    tickerUtf, current.t, current.o, current.h, current.l, current.c,
    current.v, current.vw, current.n, part.key.adjusted,
    timespanUtf, part.key.multiplier)

  override def close(): Unit = ()
}

/** Streaming form: offsets are per-series page counts — each trigger reads
  * the pages that appeared since the last checkpointed offset (the
  * daily-catch-up protocol of SURVEY.md §2.10 with engine-managed offsets
  * instead of sink-scraping).
  *
  * Works over BOTH transports. File mode learns the frontier from the
  * layout listing; the HTTP cursor transport (no listing) discovers it by
  * PROBING page existence (gallop + binary search from the checkpointed
  * position — O(log backlog) rate-limited GETs per series per trigger, and
  * exactly one 404 when a series is idle). Offsets stay page counts rather
  * than last-emitted t: pages are the protocol's immutable replayable unit
  * (a [from, to) range re-reads identically on failure), and an accurate
  * per-series t offset would force the DRIVER to download each boundary
  * page's data at planning time every trigger. The tail timestamp that
  * cross-batch dedup needs is instead picked up executor-side
  * (PolygonPartitionReader.boundarySeed): free on a warm JVM via the
  * boundary cache, one bounded refetch otherwise — over either transport.
  */
/** Frontier discovery over an existence oracle: the exclusive end of a
  * monotone chain (page i exists ⇒ pages < i exist) searched from a known
  * position — gallop forward doubling the step, then binary-search the
  * boundary. O(log(end - from)) probes; exactly ONE probe when the chain has
  * not grown (the idle-series fast path).
  */
private[graft] object Frontier {
  def discover(from: Int, capEnd: Option[Int], existsAt: Int => Boolean): Int = {
    def exists(i: Int): Boolean = capEnd.forall(i < _) && existsAt(i)
    if (!exists(from)) from
    else {
      var known = from // invariant: page `known` exists
      var step = 1
      while (exists(known + step)) { known += step; step *= 2 }
      var lo = known // exists
      var hi = known + step // missing
      while (hi - lo > 1) {
        val mid = lo + (hi - lo) / 2
        if (exists(mid)) lo = mid else hi = mid
      }
      hi
    }
  }
}

final case class PolygonOffset(pages: Map[String, Int]) extends Offset {
  override def json(): String =
    pages.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
}

class PolygonMicroBatchStream(conf: PolygonSource.FetcherConf,
                              series: Seq[SeriesKey],
                              tFromExcl: Option[Long], tToIncl: Option[Long],
                              rateLimitMs: Long,
                              maxPagesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  require(maxPagesPerTrigger.forall(_ > 0),
    "maxPagesPerTrigger must be positive")
  private val fetcher = PolygonSource.fetcherFor(conf)

  /** Exclusive end of a series' chain as known right now, searched from
    * `from`. Listing transports answer directly; cursor-only transports
    * gallop + binary-search page existence (Frontier.discover) — each probe
    * rate-limited like a data fetch. `capEnd` bounds the search so
    * admission control never probes past what it would admit anyway.
    */
  private def frontier(k: SeriesKey, from: Int, capEnd: Option[Int]): Int =
    fetcher.chainLength(k) match {
      case Some(n) => capEnd.fold(n)(math.min(n, _))
      case None =>
        Frontier.discover(from, capEnd, i => {
          PolygonSource.rateLimit(rateLimitMs)
          fetcher.cursorAt(k, i).exists(fetcher.pageExists)
        })
    }

  // Trigger.AvailableNow: pin "latest" to the offsets present when the
  // query started, so pages landing mid-run don't extend the run.
  private var availableNowCap: Option[PolygonOffset] = None

  private def currentLatest(): PolygonOffset =
    PolygonOffset(series.map(k => k.offsetKey -> frontier(k, 0, None)).toMap)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentLatest())

  override def initialOffset(): Offset =
    PolygonOffset(series.map(k => k.offsetKey -> 0).toMap)

  override def latestOffset(): Offset =
    availableNowCap.getOrElse(currentLatest())

  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): with
  // maxPagesPerTrigger set, each trigger admits at most that many NEW pages
  // per series past the checkpointed start — a catch-up over a long-idle
  // chain (the reference's daily run after a weekend) becomes several
  // bounded micro-batches instead of one giant one, keeping per-batch
  // executor memory, shuffle size, and commit latency flat no matter how
  // far behind the checkpoint is. AvailableNow still drains to the pinned
  // cap: Spark keeps triggering until the admitted offset reaches it.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[PolygonOffset].pages
    PolygonOffset(series.map { k =>
      val from = s.getOrElse(k.offsetKey, 0)
      val capEnd = maxPagesPerTrigger.map(from + _)
      val end = availableNowCap match {
        case Some(pinned) => // AvailableNow: drain to the pinned cap only
          val p = pinned.pages.getOrElse(k.offsetKey, 0)
          capEnd.fold(p)(math.min(p, _))
        case None => frontier(k, from, capEnd) // probe FORWARD from start
      }
      k.offsetKey -> math.max(end, from)
    }.toMap)
  }

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
    series.flatMap { k =>
      val from = s.getOrElse(k.offsetKey, 0)
      val to = e.getOrElse(k.offsetKey, 0)
      if (to > from) Some(SeriesPartition(k, from, to)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PolygonReaderFactory(conf, tFromExcl, tToIncl, None, rateLimitMs)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---------------------------------------------------------------------------
// Dimension endpoints (tickers / splits / dividends)
// ---------------------------------------------------------------------------

class PolygonDimTable(endpoint: String, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val schema0 = PolygonSource.schemaFor(Some(endpoint)) // validates
  override def name(): String = s"polygon($endpoint @ ${options.get("path")})"
  override def schema(): StructType = schema0
  // dims are full-refresh snapshot tables (reference_endpoints_etl.py:57-62).
  // The micro-batch face keeps that meaning: each batch re-reads the FULL
  // chain ("what was known when", README.md:8) and fires only when the
  // chain grew — the reference's daily dim refresh beside streaming bars
  // (polygon-etl-container/src/main.py:31-33) as an AvailableNow stream.
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PolygonDimScanBuilder(endpoint, schema0, options)
}

class PolygonDimScanBuilder(endpoint: String, schema: StructType,
                            options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownLimit {

  private val fieldNames = schema.fieldNames.toSet
  private var accepted: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  // equality/IN on any endpoint column maps to an API query param (the
  // reference pushes market=stocks exactly so, old_source_op.py:37-38);
  // the reader applies them, so they are fully handled here
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rejected) = filters.partition {
      case EqualTo(a, _) => fieldNames.contains(a)
      case In(a, _) => fieldNames.contains(a)
      case _ => false
    }
    accepted = acc
    rejected
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def build(): Scan = new PolygonDimScan(
    PolygonSource.fetcherConf(options), endpoint, schema, accepted, limit,
    Option(options.get("rateLimitMs")).map(_.toLong).getOrElse(0L))
}

final case class DimPartition(endpoint: String, maxPages: Int = Int.MaxValue)
    extends InputPartition

class PolygonDimScan(conf: PolygonSource.FetcherConf, endpoint: String,
                     schema: StructType, filters: Array[Filter],
                     limit: Option[Int], rateLimitMs: Long) extends Scan {
  // either transport serves the batch scan; loud beats an NPE in the fetcher
  require(conf.path != null || conf.baseUrl.isDefined,
    s"polygon dim endpoint '$endpoint' needs a 'path' or 'baseUrl'")
  override def readSchema(): StructType = schema
  override def description(): String =
    s"PolygonDimScan endpoint=$endpoint PushedFilters=[${filters.mkString(", ")}]"
  override def toBatch: Batch = new Batch {
    // one partition: the cursor chain is sequential by construction (each
    // page names the next) and the dims are <20 MB (README.md:20)
    override def planInputPartitions(): Array[InputPartition] =
      Array(DimPartition(endpoint))
    override def createReaderFactory(): PartitionReaderFactory =
      new PolygonDimReaderFactory(conf, schema, filters, limit, rateLimitMs)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // dim STREAMING stays on the file layout: its change detection (page
    // count + content signature) needs the listing; the http cursor
    // transport has no cheap "did anything change" answer
    require(conf.baseUrl.isEmpty && conf.path != null,
      "polygon dim streaming requires the file page layout (no baseUrl)")
    new PolygonDimMicroBatchStream(conf, endpoint, schema, filters, limit,
      rateLimitMs)
  }
}

/** Snapshot-refresh stream for a dimension endpoint: the offset is the
  * chain's page count, and a micro-batch reads pages [0, end) — the WHOLE
  * known chain, not the delta — because a dim refresh replaces the current
  * view rather than appending to it (reference_endpoints_etl.py:57-62).
  * A batch therefore fires only when the chain grew; with
  * Trigger.AvailableNow and a foreachBatch snapshot sink this is the
  * reference's daily dim refresh running beside the bar stream.
  */
class PolygonDimMicroBatchStream(conf: PolygonSource.FetcherConf,
                                 endpoint: String,
                                 schema: StructType, filters: Array[Filter],
                                 limit: Option[Int], rateLimitMs: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val fetcher = new FilePageFetcher(conf.path)
  private var availableNowCap: Option[PolygonOffset] = None

  // the offset carries the page count AND a content signature: a refresh
  // that rewrites pages in place (same count, new content) changes the
  // signature, so offset inequality still fires the snapshot batch
  private def currentLatest(): PolygonOffset =
    PolygonOffset(Map(endpoint -> fetcher.dimPageCount(endpoint),
      s"$endpoint!sig" -> fetcher.dimChainSignature(endpoint)))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentLatest())

  override def initialOffset(): Offset =
    PolygonOffset(Map(endpoint -> 0, s"$endpoint!sig" -> 0))

  override def latestOffset(): Offset =
    availableNowCap.getOrElse(currentLatest())

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
    val endPages = e.getOrElse(endpoint, 0)
    // full snapshot up to the end offset's page count, whenever ANYTHING
    // about the chain changed (count or content signature)
    if (endPages > 0 && s != e)
      Array(DimPartition(endpoint, maxPages = endPages))
    else Array.empty
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PolygonDimReaderFactory(conf, schema, filters, limit, rateLimitMs)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class PolygonDimReaderFactory(conf: PolygonSource.FetcherConf,
                              schema: StructType,
                              filters: Array[Filter], limit: Option[Int],
                              rateLimitMs: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dp = p.asInstanceOf[DimPartition]
    new PolygonDimReader(PolygonSource.fetcherFor(conf), dp.endpoint, schema,
      filters, limit, rateLimitMs, dp.maxPages)
  }
}

/** Cursor-protocol reader for a dimension endpoint: walks the page chain,
  * projects each JSON record onto the declared schema, and applies the
  * pushed equality/IN filters (server-side query params upstream).
  */
class PolygonDimReader(fetcher: PageFetcher, endpoint: String,
                       schema: StructType, filters: Array[Filter],
                       limit: Option[Int], rateLimitMs: Long,
                       maxPages: Int = Int.MaxValue)
    extends PartitionReader[InternalRow] {

  private var cursor: Option[String] = fetcher.dimFirstCursor(endpoint)
  private var buffer: Iterator[JsonNode] = Iterator.empty
  private var pagesRead = 0
  private var emitted = 0
  private var current: InternalRow = _

  private def fieldValue(node: JsonNode, f: StructField): Any = {
    val v = node.get(f.name)
    if (v == null || v.isNull) null
    else f.dataType match {
      case StringType => UTF8String.fromString(v.asText())
      case DoubleType => v.asDouble()
      case LongType => v.asLong()
      case IntegerType => v.asInt()
      case BooleanType => v.asBoolean()
      case dt => throw new IllegalStateException(s"unsupported dim type $dt")
    }
  }

  private def passes(node: JsonNode): Boolean = filters.forall {
    case EqualTo(a, v) => scalar(node, a) == v
    case In(a, vs) => vs.contains(scalar(node, a))
    case _ => true
  }

  private def scalar(node: JsonNode, field: String): Any = {
    val v = node.get(field)
    if (v == null || v.isNull) null
    else schema(field).dataType match {
      case StringType => v.asText()
      case DoubleType => v.asDouble()
      case LongType => v.asLong()
      case IntegerType => v.asInt()
      case BooleanType => v.asBoolean()
      case _ => null
    }
  }

  @annotation.tailrec
  private def advance(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    if (buffer.hasNext) {
      val node = buffer.next()
      if (!passes(node)) advance()
      else {
        current = InternalRow.fromSeq(schema.fields.map(fieldValue(node, _)).toSeq)
        emitted += 1
        true
      }
    } else cursor match {
      // a streaming snapshot batch is bounded to the pages known at its
      // offset: pages appended mid-batch belong to the NEXT refresh
      case Some(c) if pagesRead < maxPages =>
        PolygonSource.rateLimit(rateLimitMs)
        val (rows, next) = fetcher.fetchRaw(c)
        pagesRead += 1
        cursor = next
        buffer = rows.iterator
        advance()
      case _ => false
    }
  }

  override def next(): Boolean = advance()
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

package graft.reddit

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a real DataSource V2 connector — the live-API slot the fixture
  * sources stand in for (extract-from-reddit.py:61-75), with the
  * reference's transport semantics (retry ×N `:35-59`, inter-call
  * throttle `:86-88`) living executor-side behind [[RedditTransport]].
  *
  * `spark.read.format("reddit").option("path", fixture).load()` plans one
  * input partition PER SUBREDDIT — the API's own parallelism unit (a
  * listing is cursor-paginated, so pages within a subreddit are
  * inherently sequential; distinct subreddits fan out across executors).
  * The emitted schema is the RAW API shape (13 fields, `created_utc` as
  * epoch seconds) — the P-chain ([[Enrich]]) derives the rest, exactly as
  * the reference does in pandas after the fetch.
  *
  * Scale/efficiency: `SupportsPushDownLimit` stops PAGE FETCHES — not
  * just row emission — once the pushed limit is reached, so
  * `.limit(100)` against a million-post subreddit costs one API page,
  * the `top(time_filter, limit)` contract's cost model (T4).
  * `SupportsPushDownFilters` accepts `created_utc` range predicates
  * (evaluated exactly in the reader, so Spark drops them post-scan);
  * with `timeordered=true` — the PRAW newest-first listing guarantee —
  * the walk also STOPS at the first post below the window start,
  * completing the `top(time_filter)` semantics end-to-end: a one-week
  * window against a years-deep subreddit costs one week of pages.
  */
object RedditApi {

  /** Raw API post shape (PRAW submission fields the reference extracts,
    * extract-from-reddit.py:63-75). `created_utc` is epoch SECONDS, as
    * the API returns it; `author` is None for deleted accounts.
    */
  final case class Post(
      id: String,
      title: Option[String],
      score: Option[Int],
      num_comments: Option[Int],
      author: Option[String],
      created_utc: Option[Double],
      url: Option[String],
      upvote_ratio: Option[Double],
      over_18: Option[Boolean],
      spoiler: Option[Boolean],
      stickied: Option[Boolean],
      selftext: Option[String],
      subreddit: Option[String])

  /** One page of a listing plus the cursor naming the NEXT page —
    * `None` means the listing is exhausted. Reddit's real listing API
    * paginates by this opaque `after` fullname (there is no page=N
    * parameter), so the cursor is the seam's pagination contract and
    * each transport defines its own cursor encoding (the HTTP transport
    * passes the server's `after` through verbatim; the JSONL fixture
    * encodes its row offset).
    */
  final case class Page(posts: Seq[Post], after: Option[String]) {
    def hasMore: Boolean = after.isDefined
  }

  /** Parse one API-shaped post object (the PRAW submission field set) —
    * shared by the JSONL fixture transport and the HTTP transport's
    * listing parser, so both seams emit identical rows for identical
    * field data.
    */
  def postFromJson(n: com.fasterxml.jackson.databind.JsonNode): Post = {
    def str(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asText)
    def i(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asInt)
    def d(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asDouble)
    def b(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asBoolean)
    Post(
      id = str("id").getOrElse(
        throw new IllegalArgumentException(s"post missing id: $n")),
      title = str("title"), score = i("score"),
      num_comments = i("num_comments"), author = str("author"),
      created_utc = d("created_utc"), url = str("url"),
      upvote_ratio = d("upvote_ratio"), over_18 = b("over_18"),
      spoiler = b("spoiler"), stickied = b("stickied"),
      selftext = str("selftext"), subreddit = str("subreddit"))
  }

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("score", IntegerType),
    StructField("num_comments", IntegerType),
    StructField("author", StringType),
    StructField("created_utc", DoubleType),
    StructField("url", StringType),
    StructField("upvote_ratio", DoubleType),
    StructField("over_18", BooleanType),
    StructField("spoiler", BooleanType),
    StructField("stickied", BooleanType),
    StructField("selftext", StringType),
    StructField("subreddit", StringType)))
}

/** The transport seam: cursor-at-a-time fetch for one subreddit —
  * `after = None` asks for the first page; each returned [[RedditApi.Page]]
  * carries the cursor for the next call. A live HTTP client, a
  * recorded-response replayer, and the JSONL fixture transport all fit
  * behind this one method; retry/backoff/throttle wrap it uniformly in
  * the partition reader. Retrying a failed fetch re-sends the SAME
  * cursor, so a mid-listing 503 never skips or duplicates a page.
  */
trait RedditTransport extends Serializable {
  def fetch(subreddit: String, after: Option[String]): RedditApi.Page
}

/** Named transport factories so `option("transport", name)` can select an
  * implementation executor-side without serializing closures. "jsonl" is
  * the built-in fixture transport; tests register fakes (flaky, counting).
  */
object RedditTransports {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String] => RedditTransport]()

  register("jsonl", opts => new JsonlTransport(
    opts.getOrElse("path",
      throw new IllegalArgumentException("reddit source: option 'path' is required")),
    opts.getOrElse("pagesize", "100").toInt))

  register("http", opts => new HttpJsonTransport(
    opts.getOrElse("baseurl",
      throw new IllegalArgumentException("reddit source: option 'baseurl' is required")),
    opts.getOrElse("pagesize", "100").toInt,
    opts.getOrElse("timeoutms", "10000").toLong))

  def register(name: String, factory: Map[String, String] => RedditTransport): Unit =
    registry.put(name, factory)

  def create(name: String, opts: Map[String, String]): RedditTransport =
    Option(registry.get(name)).getOrElse(
      throw new IllegalArgumentException(s"reddit source: unknown transport '$name'"))
      .apply(opts)
}

/** Fixture transport: a JSONL file of API-shaped posts (one JSON object
  * per line, `created_utc` epoch seconds — the format a live client's
  * response recorder would write). Reads lazily ON THE EXECUTOR, filters
  * to the requested subreddit, serves fixed-size pages.
  */
final class JsonlTransport(path: String, pageSize: Int) extends RedditTransport {
  @transient private lazy val bySubreddit: Map[String, IndexedSeq[RedditApi.Post]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      src.getLines().filter(_.trim.nonEmpty)
        .map(line => RedditApi.postFromJson(mapper.readTree(line)))
        .toIndexedSeq.groupBy(_.subreddit.getOrElse(""))
    } finally src.close()
  }

  // The fixture's cursor encodes the next row offset — opaque to the
  // reader, which just hands it back like the live API's fullname.
  def fetch(subreddit: String, after: Option[String]): RedditApi.Page = {
    val all = bySubreddit.getOrElse(subreddit, IndexedSeq.empty)
    val from = after.map(_.toInt).getOrElse(0)
    RedditApi.Page(all.slice(from, from + pageSize),
      after = if (all.length > from + pageSize) Some((from + pageSize).toString)
              else None)
  }
}

/** REAL HTTP transport — the live-API seam, JDK 11+ `java.net.http`
  * client, no extra dependency. Fetches
  * `{baseUrl}/r/{subreddit}/top.json?limit=pageSize[&after=cursor]` —
  * Reddit's actual pagination protocol: the first request sends no
  * cursor, every later request echoes the previous response's `after`
  * fullname — and parses the listing envelope `{"data": {"children":
  * [{"data": {...}}], "after": "..."|null}}` with the SAME field
  * extraction as the JSONL fixture (`RedditApi.postFromJson`); the
  * response's `after` becomes the next call's cursor (null = done).
  * Non-200 responses throw `IOException`, which is what the partition
  * reader's retry ×N / exponential-backoff wrapper catches — transport
  * errors and HTTP errors ride the same discipline
  * (extract-from-reddit.py:35-59).
  *
  * The zero-egress CI proves this seam against a loopback stub server
  * (RedditTableProviderSpec): retries, backoff floor, throttle floor and
  * limit-pushdown page accounting are asserted on counted requests;
  * pointing `baseurl` at the real host is configuration, not code.
  */
final class HttpJsonTransport(baseUrl: String, pageSize: Int,
                              timeoutMs: Long) extends RedditTransport {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  def fetch(subreddit: String, after: Option[String]): RedditApi.Page = {
    val cursorParam = after.fold("")(a =>
      "&after=" + java.net.URLEncoder.encode(a, "UTF-8"))
    val uri = java.net.URI.create(
      s"$baseUrl/r/$subreddit/top.json?limit=$pageSize$cursorParam")
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("User-Agent", "graft-reddit-source/1.0")
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $uri")
    val root = mapper.readTree(resp.body())
    val data = Option(root.get("data")).getOrElse(
      throw new IllegalArgumentException(s"listing missing data: ${resp.body().take(200)}"))
    val children = Option(data.get("children"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val posts = children.map(c => RedditApi.postFromJson(
      Option(c.get("data")).getOrElse(c)))
    val next = Option(data.get("after")).filterNot(_.isNull).map(_.asText)
    RedditApi.Page(posts, after = next)
  }
}

class RedditTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "reddit"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedditApi.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RedditTable(properties.asScala.toMap.map { case (k, v) => k.toLowerCase -> v })
}

final class RedditTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"reddit(${options.getOrElse("path", options.getOrElse("transport", "?"))})"
  override def schema(): StructType = RedditApi.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new RedditScanBuilder(options ++ caseInsensitive.asScala)
}

/** The created_utc window pushed into the source: optional lower and
  * upper bounds, each (epoch seconds, inclusive). The lower bound is
  * PRAW's `top(time_filter=...)` window start — when the transport's
  * listing is newest-first (`timeordered=true`), the page-fetch walk
  * STOPS at the first below-window post, ending the API cost exactly
  * where the reference's time filter would.
  */
final case class CreatedWindow(min: Option[(Double, Boolean)],
                               max: Option[(Double, Boolean)]) {
  def accepts(cu: Option[Double]): Boolean = cu match {
    case None => min.isEmpty && max.isEmpty // SQL: NULL fails any bound
    case Some(v) =>
      min.forall { case (b, incl) => if (incl) v >= b else v > b } &&
        max.forall { case (b, incl) => if (incl) v <= b else v < b }
  }
  /** Everything from here on is older than the window (ordered walks). */
  def belowWindow(cu: Option[Double]): Boolean = cu.exists { v =>
    min.exists { case (b, incl) => if (incl) v < b else v <= b }
  }
  def describe: String = (min.map { case (b, i) =>
    s"created_utc ${if (i) ">=" else ">"} $b" } ++
    max.map { case (b, i) => s"created_utc ${if (i) "<=" else "<"} $b" })
    .mkString(", ")
}

final class RedditScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownFilters {
  private var limit: Int = Int.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var window = CreatedWindow(None, None)
  // Spark still applies the global limit on top; the push stops each
  // partition's PAGE FETCHES at n rows — the actual API-cost win.
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  // created_utc range predicates are accepted and evaluated EXACTLY in
  // the reader (so they are consumed, not re-evaluated); everything
  // else stays with Spark.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    def tighterMin(b: Double, incl: Boolean): Unit = window.min match {
      case Some((b0, i0)) if b0 > b || (b0 == b && !i0) => ()
      case _ => window = window.copy(min = Some((b, incl)))
    }
    def tighterMax(b: Double, incl: Boolean): Unit = window.max match {
      case Some((b0, i0)) if b0 < b || (b0 == b && !i0) => ()
      case _ => window = window.copy(max = Some((b, incl)))
    }
    val (acc, rest) = filters.partition {
      case GreaterThanOrEqual("created_utc", v) => num(v).isDefined
      case GreaterThan("created_utc", v) => num(v).isDefined
      case LessThanOrEqual("created_utc", v) => num(v).isDefined
      case LessThan("created_utc", v) => num(v).isDefined
      case _ => false
    }
    acc.foreach {
      case GreaterThanOrEqual(_, v) => tighterMin(num(v).get, incl = true)
      case GreaterThan(_, v) => tighterMin(num(v).get, incl = false)
      case LessThanOrEqual(_, v) => tighterMax(num(v).get, incl = true)
      case LessThan(_, v) => tighterMax(num(v).get, incl = false)
      case _ => ()
    }
    pushed = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new RedditScan(options, limit, window)
}

final class RedditScan(options: Map[String, String], limit: Int,
                       window: CreatedWindow) extends Scan with Batch {
  override def readSchema(): StructType = RedditApi.schema
  override def toBatch: Batch = this
  override def description(): String = {
    val lim = if (limit == Int.MaxValue) "" else s", PushedLimit: $limit"
    val win = if (window.describe.isEmpty) "" else s", PushedFilters: [${window.describe}]"
    s"reddit$win$lim"
  }
  override def planInputPartitions(): Array[InputPartition] =
    options.getOrElse("subreddits", "stocks").split(",").map(_.trim)
      .filter(_.nonEmpty).map(sr => RedditInputPartition(sr): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new RedditReaderFactory(options, limit, window)
}

final case class RedditInputPartition(subreddit: String) extends InputPartition

final class RedditReaderFactory(options: Map[String, String], limit: Int,
                                window: CreatedWindow)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RedditInputPartition]
    new RedditPartitionReader(
      RedditTransports.create(options.getOrElse("transport", "jsonl"), options),
      p.subreddit,
      maxRetries = options.getOrElse("maxretries", "3").toInt,
      backoffMs = options.getOrElse("backoffms", "0").toLong,
      throttleMs = options.getOrElse("throttlems", "0").toLong,
      limit = limit,
      window = window,
      // newest-first listings (PRAW's ordering) may early-stop the page
      // walk at the window's lower edge; opt-in because an arbitrary
      // JSONL fixture carries no ordering guarantee
      timeOrdered = options.getOrElse("timeordered", "false").toBoolean)
  }
}

/** Sequential cursor walk over one subreddit's listing with the
  * reference's transport discipline: each page fetch is retried up to
  * `maxRetries` times with exponential backoff
  * (extract-from-reddit.py:35-59), consecutive fetches are separated by
  * `throttleMs` (`:86-88`), and fetching stops — pages, not just rows —
  * once a pushed-down limit is satisfied.
  */
final class RedditPartitionReader(transport: RedditTransport, subreddit: String,
                                  maxRetries: Int, backoffMs: Long,
                                  throttleMs: Long, limit: Int,
                                  window: CreatedWindow = CreatedWindow(None, None),
                                  timeOrdered: Boolean = false)
    extends PartitionReader[InternalRow] {
  private var cursor: Option[String] = None
  private var pagesFetched = 0
  private var emitted = 0
  private var buf: Iterator[RedditApi.Post] = Iterator.empty
  private var hasMore = true
  private var current: RedditApi.Post = _

  // A retry re-sends the SAME cursor — the failed request consumed
  // nothing, so the walk neither skips nor duplicates a page.
  private def fetchWithRetry(): RedditApi.Page = {
    var attempt = 0
    while (true) {
      try return transport.fetch(subreddit, cursor)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          if (backoffMs > 0) Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def next(): Boolean = {
    if (emitted >= limit) return false
    while (true) {
      while (!buf.hasNext && hasMore) {
        if (pagesFetched > 0 && throttleMs > 0) Thread.sleep(throttleMs)
        val p = fetchWithRetry()
        buf = p.posts.iterator
        cursor = p.after
        hasMore = p.hasMore
        pagesFetched += 1
      }
      if (!buf.hasNext) return false
      val cand = buf.next()
      if (timeOrdered && window.belowWindow(cand.created_utc)) {
        // newest-first walk: everything after this post is older than
        // the pushed window start — stop the PAGE FETCHES here
        buf = Iterator.empty
        hasMore = false
        return false
      }
      if (window.accepts(cand.created_utc)) {
        current = cand
        emitted += 1
        return true
      }
      // out-of-window row (above the window, or NULL created_utc
      // against a pushed bound): skip and keep walking
    }
    throw new IllegalStateException("unreachable")
  }

  override def get(): InternalRow = {
    val p = current
    def s(v: Option[String]) = v.map(UTF8String.fromString).orNull
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.id), s(p.title),
      p.score.map(Int.box).orNull, p.num_comments.map(Int.box).orNull,
      s(p.author), p.created_utc.map(Double.box).orNull, s(p.url),
      p.upvote_ratio.map(Double.box).orNull,
      p.over_18.map(Boolean.box).orNull, p.spoiler.map(Boolean.box).orNull,
      p.stickied.map(Boolean.box).orNull, s(p.selftext), s(p.subreddit)))
  }

  override def close(): Unit = ()
}

package graft.reddit

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase

/** The S1 DataSource V2 seam: `spark.read.format("reddit")` resolves the
  * connector via META-INF/services, plans one partition per subreddit,
  * honors retry ×N / throttle at the transport boundary, and stops page
  * fetches on a pushed-down limit.
  */
class RedditTableProviderSpec extends SparkTestBase {

  private def jsonl(lines: Seq[String]): String = {
    val f = Files.createTempDirectory("reddit_dsv2").resolve("posts.jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val fixture = Seq(
    """{"id":"a1","title":"Tesla ’s week","score":10,"num_comments":3,"author":"u1","created_utc":1742826791.0,"url":"http://x/1","upvote_ratio":0.9,"over_18":false,"spoiler":false,"stickied":false,"selftext":"body one","subreddit":"stocks"}""",
    """{"id":"a2","title":"two","score":20,"num_comments":0,"author":null,"created_utc":1742826792.0,"upvote_ratio":0.5,"over_18":true,"selftext":null,"subreddit":"stocks"}""",
    """{"id":"a3","title":"three","score":5,"created_utc":1742826793.0,"subreddit":"stocks"}""",
    """{"id":"b1","title":"other sub","score":7,"created_utc":1742826794.0,"subreddit":"wallstreetbets"}""")

  test("format(\"reddit\") resolves via service registration and reads the fixture, one partition per subreddit") {
    val path = jsonl(fixture)
    val df = spark.read.format("reddit")
      .option("path", path)
      .option("subreddits", "stocks,wallstreetbets")
      .load()
    assert(df.schema == RedditApi.schema)
    val rows = df.collect()
    assert(rows.length == 4)
    val a2 = rows.find(_.getString(0) == "a2").get
    assert(a2.isNullAt(a2.fieldIndex("author")), "deleted account stays null")
    assert(a2.getBoolean(a2.fieldIndex("over_18")))
    assert(a2.getDouble(a2.fieldIndex("created_utc")) == 1742826792.0)
    // partition count = subreddit count (the API's parallelism unit)
    assert(df.rdd.getNumPartitions == 2)
    // a subreddit filter composes downstream
    assert(df.filter("subreddit = 'stocks'").count() == 3)
    // epoch seconds flow into the P4 conversion unchanged
    val ts = Enrich.epochToTimestamp(df.filter("id = 'a1'")).collect().head
    assert(ts.getAs[java.sql.Timestamp]("created_utc").toInstant.getEpochSecond == 1742826791L)
  }

  test("pushed-down limit stops page fetches, not just row emission") {
    val calls = RedditTableProviderSpec.fetchCalls
    calls.set(0)
    RedditTransports.register("counting", opts => new RedditTransport {
      private val inner = new JsonlTransport(opts("path"), pageSize = 1)
      def fetch(subreddit: String, after: Option[String]): RedditApi.Page = {
        RedditTableProviderSpec.fetchCalls.incrementAndGet()
        inner.fetch(subreddit, after)
      }
    })
    val path = jsonl(fixture)
    val got = spark.read.format("reddit")
      .option("path", path).option("transport", "counting")
      .option("subreddits", "stocks")
      .load().limit(1).collect()
    assert(got.length == 1)
    // 3 stocks posts at pageSize=1: without the push this is 3 fetches
    assert(calls.get() == 1, s"expected 1 page fetch, got ${calls.get()}")
  }

  test("pushed created_utc window: visible in the plan, rows filtered exactly") {
    val path = jsonl(fixture)
    val df = spark.read.format("reddit")
      .option("path", path)
      .option("subreddits", "stocks,wallstreetbets")
      .load()
      .filter("created_utc >= 1742826792.0 AND created_utc < 1742826794.0")
    // the window is consumed by the source: the scan node advertises it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("created_utc >= 1.742826792E9"), plan)
    assert(plan.contains("created_utc < 1.742826794E9"), plan)
    val ids = df.collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("a2", "a3"))
    // a post with NULL created_utc fails a pushed bound (SQL semantics)
    val withNull = jsonl(fixture :+
      """{"id":"n1","title":"no time","subreddit":"stocks"}""")
    val got = spark.read.format("reddit")
      .option("path", withNull).option("subreddits", "stocks")
      .load().filter("created_utc >= 0.0").collect()
    assert(!got.exists(_.getString(0) == "n1"))
  }

  test("timeordered walk stops page fetches at the window's lower edge") {
    val calls = RedditTableProviderSpec.fetchCalls
    RedditTransports.register("counting2", opts => new RedditTransport {
      private val inner = new JsonlTransport(opts("path"), pageSize = 1)
      def fetch(subreddit: String, after: Option[String]): RedditApi.Page = {
        RedditTableProviderSpec.fetchCalls.incrementAndGet()
        inner.fetch(subreddit, after)
      }
    })
    // newest-first listing: 4 stocks posts descending in created_utc
    val desc = jsonl(Seq(
      """{"id":"d1","title":"t","score":1,"created_utc":400.0,"subreddit":"stocks"}""",
      """{"id":"d2","title":"t","score":1,"created_utc":300.0,"subreddit":"stocks"}""",
      """{"id":"d3","title":"t","score":1,"created_utc":200.0,"subreddit":"stocks"}""",
      """{"id":"d4","title":"t","score":1,"created_utc":100.0,"subreddit":"stocks"}"""))
    def run(ordered: Boolean): (Seq[String], Int) = {
      calls.set(0)
      val r = spark.read.format("reddit")
        .option("path", desc).option("transport", "counting2")
        .option("subreddits", "stocks").option("timeordered", ordered.toString)
        .load().filter("created_utc >= 300.0")
        .collect().map(_.getString(0)).sorted.toSeq
      (r, calls.get())
    }
    val (idsOrdered, pagesOrdered) = run(ordered = true)
    assert(idsOrdered == Seq("d1", "d2"))
    // page 3 surfaces the first below-window post and STOPS; page 4
    // (and the cursor-end probe) never happen
    assert(pagesOrdered == 3, s"expected 3 page fetches, got $pagesOrdered")
    // without the ordering guarantee: same rows, full walk
    val (idsFull, pagesFull) = run(ordered = false)
    assert(idsFull == Seq("d1", "d2"))
    assert(pagesFull == 4, s"expected 4 page fetches, got $pagesFull")
  }

  test("transport failures are retried maxRetries times, then surface") {
    RedditTransports.register("flaky", opts => new RedditTransport {
      private val inner = new JsonlTransport(opts("path"), pageSize = 100)
      def fetch(subreddit: String, after: Option[String]): RedditApi.Page = {
        if (RedditTableProviderSpec.flakyFailures.getAndDecrement() > 0)
          throw new RuntimeException("simulated 503")
        inner.fetch(subreddit, after)
      }
    })
    val path = jsonl(fixture)
    def read(maxRetries: Int) = spark.read.format("reddit")
      .option("path", path).option("transport", "flaky")
      .option("subreddits", "stocks").option("maxretries", maxRetries.toString)
      .load().count()

    RedditTableProviderSpec.flakyFailures.set(2)
    assert(read(maxRetries = 3) == 3, "two failures then success inside the x3 budget")

    RedditTableProviderSpec.flakyFailures.set(2)
    val ex = intercept[org.apache.spark.SparkException](read(maxRetries = 1))
    assert(ex.getMessage.contains("503") ||
      Option(ex.getCause).exists(_.getMessage.contains("503")))
  }

  test("HTTP transport against a loopback stub: retry x3, backoff+throttle floors, limit pushdown, exact-attempt accounting") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val page0Hits = new AtomicInteger(0)
    val page1Hits = new AtomicInteger(0)
    val failuresToServe = new AtomicInteger(2)
    def post(id: String, score: Int) =
      s"""{"data":{"id":"$id","title":"t$id","score":$score,"created_utc":1742826791.0,"subreddit":"stocks"}}"""
    server.createContext("/r/stocks/top.json", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // Real Reddit listing protocol: pagination is the `after` cursor
        // (no page parameter exists) — first request has no cursor, the
        // follow-up must echo the fullname served in the first response.
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val after = q.split("&").collectFirst {
          case p if p.startsWith("after=") => p.drop(6)
        }
        val (code, body) =
          if (after.isEmpty) {
            page0Hits.incrementAndGet()
            if (failuresToServe.getAndDecrement() > 0) (500, """{"error":500}""")
            else (200,
              s"""{"data":{"children":[${post("h1", 1)},${post("h2", 2)}],"after":"t3_h2"}}""")
          } else {
            assert(after.contains("t3_h2"), s"client sent wrong cursor: $after")
            page1Hits.incrementAndGet()
            (200, s"""{"data":{"children":[${post("h3", 3)}],"after":null}}""")
          }
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      def reader = spark.read.format("reddit")
        .option("transport", "http").option("baseurl", base)
        .option("subreddits", "stocks").option("pagesize", "2")
      val t0 = System.nanoTime()
      val rows = reader
        .option("maxretries", "3").option("backoffms", "40")
        .option("throttlems", "60")
        .load().collect()
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(rows.map(_.getString(0)).sorted.toSeq == Seq("h1", "h2", "h3"))
      assert(page0Hits.get() == 3, s"page0 hit ${page0Hits.get()} times (want 2 x 500 + 1 x 200)")
      assert(page1Hits.get() == 1)
      // Thread.sleep floors are guaranteed minimums: exponential backoff
      // 40 + 80 ms after the two 500s, plus the 60 ms inter-page throttle
      assert(elapsedMs >= 180, s"elapsed $elapsedMs ms — backoff/throttle not applied")

      // pushed-down limit stops PAGE FETCHES over HTTP too
      page0Hits.set(0); page1Hits.set(0); failuresToServe.set(0)
      val two = reader.option("maxretries", "3").load().limit(2).collect()
      assert(two.length == 2)
      assert(page1Hits.get() == 0, "limit(2) must not fetch page 1")

      // permanent 500: surfaces after EXACTLY maxretries attempts
      page0Hits.set(0); failuresToServe.set(Int.MaxValue)
      val ex = intercept[org.apache.spark.SparkException] {
        reader.option("maxretries", "3").option("backoffms", "1")
          .load().collect()
      }
      assert(page0Hits.get() == 3, s"expected exactly 3 attempts, saw ${page0Hits.get()}")
      def chain(t: Throwable): List[String] =
        if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
      assert(chain(ex).exists(_.contains("HTTP 500")), s"cause chain: ${chain(ex)}")
    } finally server.stop(0)
  }

  test("missing path fails loudly; unknown transport fails loudly") {
    intercept[Exception](
      spark.read.format("reddit").load().collect())
    intercept[Exception](
      spark.read.format("reddit").option("path", "/nope")
        .option("transport", "imaginary").load().collect())
  }
}

object RedditTableProviderSpec {
  val fetchCalls = new AtomicInteger(0)
  val flakyFailures = new AtomicInteger(0)
}

package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Paged-REST feed puller: the provider-API half of the ingest story.
  *
  * The reference workload's core loop is API → Parquet. The Spark-
  * native shape splits it in two: a SEQUENTIAL, resumable pull of the
  * provider's cursor-paged endpoint into a landing directory (this
  * object — pagination is inherently serial, so no cluster belongs
  * here), and the PARALLEL, idempotent [[Ingest.incrementalIngest]]
  * from that landing dir into the partitioned table (format = "json").
  * The landing dir is the replay buffer: a crashed pull resumes from
  * its persisted cursor, a re-run ingest is deduped by the manifest,
  * and a re-fetched page overwrites its own file byte-for-byte.
  *
  * Protocol contract (parameterized, provider-neutral): GET
  * `baseUrl[?cursorParam=c]` returns one page of records (JSONL body)
  * plus the next cursor in a response header; an absent/empty header
  * ends the feed. Rate limiting is a minimum inter-request interval;
  * 429/5xx responses back off exponentially and retry a bounded
  * number of times.
  *
  * State file (tempfile + rename, same discipline as the ingest
  * manifest): `<nextPageIndex>\n<cursor>` — advanced only AFTER the
  * page file lands, so a crash between the two re-fetches one page
  * into the same filename (idempotent), never skips one.
  */
object RestFeed {

  final case class PullResult(pagesFetched: Int, recordsLanded: Long,
                              complete: Boolean)

  private final case class Cursor(nextPage: Int, token: Option[String],
                                  done: Boolean)

  private val DoneMarker = "__DONE__"

  /** Pull up to `maxPages` pages from `baseUrl` into `landingDir` as
    * `page-NNNNNN.json` files, resuming from `statePath`.
    *
    * @param minIntervalMs floor between request starts (rate limit)
    * @param maxRetries    per-page retries on 429/5xx/connect errors
    */
  def pull(baseUrl: String, landingDir: String, statePath: String,
           cursorParam: String = "cursor",
           nextCursorHeader: String = "X-Next-Cursor",
           maxPages: Int = Int.MaxValue,
           minIntervalMs: Long = 0L,
           maxRetries: Int = 3,
           conf: Configuration = new Configuration()): PullResult = {
    val landing = new Path(landingDir)
    val fs = landing.getFileSystem(conf)
    fs.mkdirs(landing)
    var cur = readState(conf, statePath)
    if (cur.done) return PullResult(0, 0L, complete = true)

    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    var pages = 0
    var records = 0L
    var lastRequestAt = 0L
    while (pages < maxPages && !cur.done) {
      val wait = minIntervalMs - (System.currentTimeMillis() - lastRequestAt)
      if (wait > 0) Thread.sleep(wait)
      lastRequestAt = System.currentTimeMillis()
      val uri = cur.token match {
        case Some(t) => s"$baseUrl?$cursorParam=" +
          java.net.URLEncoder.encode(t, "UTF-8")
        case None => baseUrl
      }
      val resp = fetchWithRetry(client, uri, maxRetries)
      val body = resp.body()
      // land the page under its INDEX-derived name: a re-pull of the
      // same page after a crash overwrites the same file
      val pageFile = new Path(landing, f"page-${cur.nextPage}%06d.json")
      val tmp = new Path(landing, f".page-${cur.nextPage}%06d.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes(UTF_8)) finally out.close()
      if (fs.exists(pageFile) && !fs.delete(pageFile, false))
        throw new java.io.IOException(s"could not replace $pageFile")
      if (!fs.rename(tmp, pageFile))
        throw new java.io.IOException(s"rename($tmp, $pageFile) returned false")
      records += body.linesIterator.count(_.nonEmpty)
      pages += 1
      val next = resp.headers().firstValue(nextCursorHeader)
        .map[Option[String]](v => if (v.isEmpty) None else Some(v))
        .orElse(None)
      cur = Cursor(cur.nextPage + 1, next, done = next.isEmpty)
      writeState(conf, statePath, cur)
    }
    PullResult(pages, records, cur.done)
  }

  /** Non-retryable feed response (4xx other than 429): its own type,
    * NOT a message-matched IOException — connect resets commonly carry
    * a null getMessage, and retry/no-retry must never hinge on
    * exception wording.
    */
  final class FeedStatusException(val status: Int, uri: String)
      extends java.io.IOException(s"feed returned HTTP $status for $uri")

  private def fetchWithRetry(client: HttpClient, uri: String,
                             maxRetries: Int): HttpResponse[String] = {
    var attempt = 0
    while (true) {
      val outcome: Either[String, HttpResponse[String]] =
        try {
          val resp = client.send(
            HttpRequest.newBuilder(URI.create(uri)).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          val sc = resp.statusCode()
          if (sc == 200) return resp
          else if (sc == 429 || sc >= 500) Left(s"HTTP $sc")
          else throw new FeedStatusException(sc, uri)
        } catch {
          case e: FeedStatusException => throw e
          case e: java.io.IOException => Left(e.toString)
        }
      attempt += 1
      if (attempt > maxRetries)
        throw new java.io.IOException(
          s"feed pull failed after $maxRetries retries: $uri (${outcome.swap.getOrElse("")})")
      Thread.sleep(100L << (attempt - 1)) // 100/200/400ms… backoff
    }
    sys.error("unreachable")
  }

  private def readState(conf: Configuration, statePath: String): Cursor = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Cursor(0, None, done = false)
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val idx = lines.headOption.map(_.trim.toInt).getOrElse(0)
    lines.drop(1).headOption.map(_.trim) match {
      case Some(DoneMarker) => Cursor(idx, None, done = true)
      case Some(t) if t.nonEmpty => Cursor(idx, Some(t), done = false)
      case _ => Cursor(idx, None, done = false)
    }
  }

  private def writeState(conf: Configuration, statePath: String,
                         cur: Cursor): Unit = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(statePath + ".tmp")
    val payload = cur.nextPage.toString + "\n" +
      (if (cur.done) DoneMarker else cur.token.getOrElse("")) + "\n"
    val out = fs.create(tmp, true)
    try out.write(payload.getBytes(UTF_8)) finally out.close()
    if (fs.exists(p) && !fs.delete(p, false))
      throw new java.io.IOException(s"could not remove old state $statePath")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"state swap failed for $statePath")
  }
}

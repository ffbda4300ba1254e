package graft.sources

/** The reference client's full endpoint surface as ONE composed
  * facade (reference/src/spotify/spotify_client.py — the
  * `SpotifyClient` class): every call runs transport
  * ([[HttpFetch]]) inside token refresh ([[IngestClient
  * .withTokenRefresh]]: one forced refresh + replay on 401) inside
  * the retry ladder ([[IngestClient.withRetries]]: Retry-After on
  * 429, exponential backoff otherwise), with the reference's
  * per-endpoint id caps on the batch fan-outs
  * (curl_spotify_tracker.py:286,305,324; spotify_client.py:310-311).
  *
  * Responses come back VERBATIM — the collector never parses a byte
  * of JSON; callers drop the envelopes into the raw zone and
  * [[JsonSource]]'s declared-schema readers unwrap them distributed
  * (the provenance-preserving split the whole S1-S3 design rests on).
  *
  * Driver-side by design: this is the control plane (<= tens of
  * calls per run at the reference's <= 600 events/day cadence);
  * clock and sleep stay injected so specs pin the protocol without
  * wall-clock waits. [[stats]] mirrors the reference's `api_stats`
  * counter bag (spotify_client.py:70-77, :396-410): PER-ATTEMPT
  * counts, so a fetch that 429s once and then lands counts one rate
  * limit hit, one success, two requests.
  */
final class Collector(
    base: String,
    tokens: IngestClient.TokenManager,
    policy: IngestClient.RetryPolicy = IngestClient.RetryPolicy(),
    now: () => Long = () => System.nanoTime() / 1000000L,
    sleep: Long => Unit = Thread.sleep) {

  private val nRequests = new java.util.concurrent.atomic.AtomicLong
  private val nSuccess = new java.util.concurrent.atomic.AtomicLong
  private val nRateLimited = new java.util.concurrent.atomic.AtomicLong

  /** CLIENT-WIDE request pacing, like the reference's instance-level
    * `last_request_time` (spotify_client.py:63-64, :79-89): >=
    * minIntervalMs between the starts of ANY two attempts this client
    * makes — across endpoints and across fan-out calls, not just
    * within one. */
  private var lastStartMs = Long.MinValue
  private def paced[A](f: => A): A = synchronized {
    val t = now()
    if (lastStartMs != Long.MinValue && t - lastStartMs < policy.minIntervalMs)
      sleep(policy.minIntervalMs - (t - lastStartMs))
    lastStartMs = now()
    f
  }

  /** One paced, counted transport attempt (the reference increments
    * inside its attempt loop, spotify_client.py:191-236). */
  private def counted(url: String, tok: String): String = paced {
    nRequests.incrementAndGet()
    try {
      val body = HttpFetch.get(url, Map("Authorization" -> s"Bearer $tok"))
      nSuccess.incrementAndGet()
      body
    } catch {
      case e: IngestClient.RateLimited =>
        nRateLimited.incrementAndGet()
        throw e
    }
  }

  private def authed(url: String): String =
    IngestClient.withRetries(policy, sleep)(_ =>
      IngestClient.withTokenRefresh(tokens)(tok => counted(url, tok)))

  private def fanned(ids: Seq[String], cap: Int,
      url: Seq[String] => String): Seq[String] =
    // fanout's own per-call pacing is disabled: the client-wide pace
    // above already guarantees the interval, and letting both run
    // would double-sleep every chunk boundary
    IngestClient.fanout(ids, cap, policy.copy(minIntervalMs = 0L),
      now, sleep)(chunk =>
      IngestClient.withTokenRefresh(tokens)(tok => counted(url(chunk), tok)))

  /** The reference's API-usage statistics surface
    * (`get_api_stats`): attempt/success/rate-limit counts, failures
    * as the remainder (every non-success attempt — retried OR
    * fatal), token refreshes from the manager. */
  def stats: Collector.Stats = {
    val req = nRequests.get(); val ok = nSuccess.get()
    Collector.Stats(
      totalRequests = req,
      successfulRequests = ok,
      failedRequests = req - ok,
      rateLimitHits = nRateLimited.get(),
      tokenRefreshes = tokens.refreshes)
  }

  /** S1: the recently-played page (spotify_client.py:238-280), with
    * the optional after/before unix-millis cursors. */
  def recentlyPlayed(limit: Int = 50, after: Option[Long] = None,
      before: Option[Long] = None): String = {
    require(1 <= limit && limit <= 50,
      s"limit must be in [1, 50], got $limit")
    val cursors = after.map(a => s"&after=$a").getOrElse("") +
      before.map(b => s"&before=$b").getOrElse("")
    authed(s"$base/me/player/recently-played?limit=$limit$cursors")
  }

  /** S2: batch track details, <= 50 ids per call. */
  def trackDetails(ids: Seq[String]): Seq[String] =
    fanned(ids, 50, c => s"$base/tracks?ids=${c.mkString(",")}")

  /** S2: batch artist profiles, <= 50 ids per call. */
  def artistProfiles(ids: Seq[String]): Seq[String] =
    fanned(ids, 50, c => s"$base/artists?ids=${c.mkString(",")}")

  /** S2: batch album catalog, <= 20 ids per call — the distinctive
    * small cap (curl_spotify_tracker.py:324). */
  def albumCatalog(ids: Seq[String]): Seq[String] =
    fanned(ids, 20, c => s"$base/albums?ids=${c.mkString(",")}")

  /** S3: batch audio features, <= 100 ids per call. */
  def audioFeatures(ids: Seq[String]): Seq[String] =
    fanned(ids, 100, c => s"$base/audio-features?ids=${c.mkString(",")}")

  /** S3: content search (spotify_client.py:359-385). */
  def search(query: String, searchType: String = "track",
      limit: Int = 20): String =
    authed(IngestClient.searchUrl(base, query, searchType, limit))

  /** S3: the current user's profile (spotify_client.py:344-357). */
  def userProfile(): String = authed(s"$base/me")
}

object Collector {
  /** `api_stats` analog (spotify_client.py:70-77): per-attempt
    * counters plus the token-refresh count. */
  final case class Stats(
      totalRequests: Long,
      successfulRequests: Long,
      failedRequests: Long,
      rateLimitHits: Long,
      tokenRefreshes: Int) {
    def successRate: Double =
      if (totalRequests == 0) 0.0
      else successfulRequests.toDouble / totalRequests
  }
}

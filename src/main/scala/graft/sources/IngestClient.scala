package graft.sources

/** The reference collector's CLIENT-SIDE ingestion protocol (SURVEY.md
  * §2.1 S1-S3) as engine-independent pure logic. This sandbox has no
  * network, so the HTTP transport stays abstract — `fetch` is a plain
  * function — but everything the reference implements AROUND the
  * transport is real and deterministic here:
  *
  *  - >= 100 ms pacing between request starts
  *    (reference/src/spotify/spotify_client.py:63-64)
  *  - 429 rate-limit handling: sleep the server's Retry-After hint,
  *    then retry — consuming one attempt (spotify_client.py:208-215)
  *  - other retryable failures: exponential backoff 2^attempt, raise
  *    after the configured retries (spotify_client.py:216-236)
  *  - batch fan-out with a per-call id cap — 50 tracks / 50 artists /
  *    20 albums / 100 audio-features per call (spotify_client.py:310-311)
  *
  * Clock and sleep are INJECTED so specs pin the protocol without
  * wall-clock waits, and a production caller passes
  * `System.nanoTime`-based time and `Thread.sleep`.
  *
  * Scale note: this is the collector's control plane — the reference
  * ingests <= 600 events/day through it (BASELINE.md), so it runs
  * driver-side by design; volume lands in the JSON drop zone that
  * [[JsonSource]] reads distributed.
  */
object IngestClient {

  /** A 429 from the server, carrying its Retry-After hint. */
  final case class RateLimited(retryAfterMs: Long)
    extends RuntimeException(s"rate limited; retry after $retryAfterMs ms")

  /** A failure the protocol may retry (the reference retries any
    * non-2xx/401/429 status and any transport exception). */
  final case class Retryable(reason: String)
    extends RuntimeException(reason)

  /** A 401 from the server: the access token was rejected. NOT
    * retryable by [[withRetries]] — the reference's response is to
    * force-refresh the token and replay (spotify_client.py:201-205),
    * which is [[withTokenRefresh]]'s job; a 401 that survives one
    * refresh is a credential problem no amount of retrying fixes. */
  final case class AuthRejected(reason: String)
    extends RuntimeException(reason)

  /** One refreshed access token: the bearer value plus its announced
    * lifetime (`expires_in`, seconds — the reference defaults a
    * missing field to 3600, spotify_client.py:141). */
  final case class Token(accessToken: String, expiresInSec: Long)

  /** OAuth2 access-token cache with refresh-ahead expiry — the
    * client-side token protocol of spotify_client.py:91-160: a cached
    * token is reused while valid, considered EXPIRED `earlyMs` (5
    * minutes, :103) before its announced lifetime ends so a token
    * never dies mid-collector-run, and refreshed through the injected
    * `refresh` transport otherwise. Clock injected like the rest of
    * the protocol layer, so specs pin expiry behavior without
    * wall-clock waits. Thread-safe; `refreshes` mirrors the
    * reference's token_refreshes stat. */
  final class TokenManager(refresh: () => Token, now: () => Long,
      earlyMs: Long = 5 * 60 * 1000L) {
    private var current: Option[(String, Long)] = None // (token, expiresAt)
    private var nRefreshes = 0

    /** A valid bearer token — cached if still live, freshly refreshed
      * otherwise. */
    def bearer(): String = synchronized {
      current match {
        case Some((tok, expiresAt)) if now() < expiresAt - earlyMs => tok
        case _ => forceRefresh()
      }
    }

    /** Unconditionally refresh (the 401 path — the cached token was
      * rejected regardless of what the clock says). */
    def forceRefresh(): String = synchronized {
      val t = refresh()
      current = Some((t.accessToken, now() + t.expiresInSec * 1000L))
      nRefreshes += 1
      t.accessToken
    }

    def refreshes: Int = synchronized(nRefreshes)
  }

  /** The refresh-on-401 envelope (spotify_client.py:201-205): run
    * `fetch` with a valid bearer token; if the server rejects it
    * ([[AuthRejected]]), force ONE refresh and replay. A second
    * consecutive 401 propagates fatally — the refreshed token being
    * rejected too means bad credentials, not an expired token, and
    * burning the retry budget on it would just hammer the auth
    * server. Compose INSIDE [[withRetries]] (the reference's 401 arm
    * lives inside its attempt loop) so transient failures after a
    * refresh still retry with the new token. */
  def withTokenRefresh[A](tokens: TokenManager)(fetch: String => A): A =
    try fetch(tokens.bearer())
    catch {
      case AuthRejected(_) => fetch(tokens.forceRefresh())
    }

  final case class RetryPolicy(
      maxRetries: Int = 3,
      baseDelayMs: Long = 1000L,
      minIntervalMs: Long = 100L)

  /** One paced, retried call. `attempt` is passed to `fetch` so specs
    * can script per-attempt behavior. Non-[[RateLimited]],
    * non-[[Retryable]] exceptions propagate immediately — the
    * reference treats auth/contract errors as fatal. */
  def withRetries[A](policy: RetryPolicy, sleep: Long => Unit)
      (fetch: Int => A): A = {
    var attempt = 0
    while (true) {
      try return fetch(attempt)
      catch {
        case RateLimited(after) if attempt < policy.maxRetries =>
          sleep(after)
        case Retryable(_) if attempt < policy.maxRetries =>
          sleep(policy.baseDelayMs * (1L << attempt))
      }
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Batched fan-out: `ids` in `batchSize` chunks, each chunk fetched
    * with [[withRetries]], with >= minIntervalMs between the STARTS of
    * consecutive calls (the reference's request pacing). Results come
    * back in input order. `now`/`sleep` are the injected clock. */
  def fanout[A, B](ids: Seq[A], batchSize: Int, policy: RetryPolicy,
      now: () => Long, sleep: Long => Unit)
      (fetch: Seq[A] => B): Seq[B] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    var lastStart = Long.MinValue
    ids.grouped(batchSize).map { chunk =>
      val t = now()
      if (lastStart != Long.MinValue &&
          t - lastStart < policy.minIntervalMs)
        sleep(policy.minIntervalMs - (t - lastStart))
      lastStart = now()
      withRetries(policy, sleep)(_ => fetch(chunk))
    }.toSeq
  }

  /** The refresh-token grant (spotify_client.py:121-159): POST the
    * token endpoint with Basic client credentials and the long-lived
    * refresh token, parse `access_token`/`expires_in` out of the JSON
    * response. Wire this as a [[TokenManager]]'s refresh transport:
    * {{{
    * new TokenManager(() => IngestClient.refreshAccessToken(
    *   tokenUrl, clientId, clientSecret, refreshToken), now)
    * }}} */
  def refreshAccessToken(tokenUrl: String, clientId: String,
      clientSecret: String, refreshToken: String): Token = {
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    parseTokenResponse(HttpFetch.postForm(tokenUrl,
      Map("Authorization" -> s"Basic $basic"),
      Map("grant_type" -> "refresh_token",
        "refresh_token" -> refreshToken)))
  }

  /** Parse a token-endpoint response body. `expires_in` defaults to
    * 3600 s like the reference (spotify_client.py:141); a response
    * without an access token is an auth failure, not a retry case.
    * Jackson is Spark's own JSON parser — already on the classpath. */
  private[sources] def parseTokenResponse(json: String): Token = {
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw AuthRejected(s"unparseable token response: ${e.getMessage}")
      }
    val tok = Option(node).flatMap(n => Option(n.get("access_token")))
      .map(_.asText()).filter(_.nonEmpty)
      .getOrElse(throw AuthRejected(
        "token response carries no access_token"))
    val exp = Option(node.get("expires_in")).map(_.asLong())
      .filter(_ > 0L).getOrElse(3600L)
    Token(tok, exp)
  }

  /** Build the search-endpoint URL (spotify_client.py:359-385:
    * `q`/`type`/`limit` params). The query is percent-encoded — the
    * reference gets that from `requests` params encoding; skipping it
    * here would corrupt any query with a space or `&`. */
  def searchUrl(base: String, query: String,
      searchType: String = "track", limit: Int = 20): String = {
    require(1 <= limit && limit <= 50,
      s"search limit must be in [1, 50], got $limit")
    val q = java.net.URLEncoder.encode(query,
      java.nio.charset.StandardCharsets.UTF_8)
    s"$base/search?q=$q&type=$searchType&limit=$limit"
  }
}

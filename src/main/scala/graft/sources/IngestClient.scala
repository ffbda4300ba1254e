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
}

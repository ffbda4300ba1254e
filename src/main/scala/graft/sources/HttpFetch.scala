package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** The HTTP transport for [[IngestClient]] — the piece the reference
  * implements with `requests.get`
  * (reference/src/spotify/spotify_client.py:195-236) and the one part
  * of S1-S3 the sandbox could not exercise against a live socket
  * until the in-process server spec (`HttpIngestSpec`). JDK-only
  * (`HttpURLConnection`), driver-side by design: this is the
  * collector's control plane (<= tens of calls per run); volume lands
  * in the JSON drop zone that [[JsonSource]] reads distributed.
  *
  * Status mapping mirrors the reference's `_make_api_request`:
  *  - 200 -> body string
  *  - 429 -> [[IngestClient.RateLimited]] carrying the server's
  *    Retry-After hint in ms (seconds granularity per RFC, default 1 s
  *    like spotify_client.py:211) — [[IngestClient.withRetries]] sleeps
  *    exactly that hint and retries
  *  - any other status -> [[IngestClient.Retryable]] (exponential
  *    backoff upstream), except 401: auth errors propagate as fatal —
  *    [[IngestClient]]'s documented contract (token refresh is the
  *    caller's concern, not the retry loop's)
  *  - transport IOExceptions -> [[IngestClient.Retryable]], like the
  *    reference's `requests.RequestException` arm
  */
object HttpFetch {

  def get(url: String, headers: Map[String, String] = Map.empty,
      timeoutMs: Int = 30000): String = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val code =
        try conn.getResponseCode
        catch {
          case e: IOException =>
            throw IngestClient.Retryable(s"transport: ${e.getMessage}")
        }
      code match {
        case 200 =>
          // the body read is inside the retryable envelope too: a
          // connection reset or read timeout MID-BODY is the same
          // transient transport failure as one before the status
          // line. A body SHORTER than the announced Content-Length is
          // the silent form of the same failure (the JDK surfaces a
          // clean EOF, not an error) — detected explicitly so a
          // truncated response can never land in the drop zone as if
          // it were complete.
          val bytes =
            try {
              val in = conn.getInputStream
              try in.readAllBytes() finally in.close()
            } catch {
              case e: IOException =>
                throw IngestClient.Retryable(s"transport: ${e.getMessage}")
            }
          val announced = conn.getContentLengthLong
          if (announced >= 0 && bytes.length < announced)
            throw IngestClient.Retryable(
              s"truncated body: ${bytes.length} of $announced bytes")
          new String(bytes, StandardCharsets.UTF_8)
        case 429 =>
          throw IngestClient.RateLimited(retryAfterMs(conn))
        case 401 =>
          throw new IllegalStateException(s"auth rejected (401) for $url")
        case other =>
          throw IngestClient.Retryable(s"HTTP $other from $url")
      }
    } finally {
      // drain and release the error body, if any, before disconnect
      Option(conn.getErrorStream).foreach { es =>
        try es.readAllBytes() finally es.close()
      }
      conn.disconnect()
    }
  }

  private def retryAfterMs(conn: HttpURLConnection): Long =
    Option(conn.getHeaderField("Retry-After"))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .map(_ * 1000L)
      .getOrElse(1000L)
}

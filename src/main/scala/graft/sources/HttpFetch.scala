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
  *    backoff upstream), except 401: [[IngestClient.AuthRejected]],
  *    which [[IngestClient.withTokenRefresh]] answers with ONE token
  *    refresh + replay (spotify_client.py:201-205) and anything else
  *    treats as fatal
  *  - transport IOExceptions -> [[IngestClient.Retryable]], like the
  *    reference's `requests.RequestException` arm
  */
object HttpFetch {

  def get(url: String, headers: Map[String, String] = Map.empty,
      timeoutMs: Int = 30000): String =
    exchange(url, headers, timeoutMs, form = None)

  /** POST an `application/x-www-form-urlencoded` body — the token
    * endpoint's grant shape (spotify_client.py:124-135). Same status
    * mapping and retry envelope as [[get]]. */
  def postForm(url: String, headers: Map[String, String],
      form: Map[String, String], timeoutMs: Int = 30000): String =
    exchange(url, headers, timeoutMs, Some(form.map { case (k, v) =>
      val enc = (s: String) => java.net.URLEncoder.encode(s,
        StandardCharsets.UTF_8)
      s"${enc(k)}=${enc(v)}"
    }.mkString("&")))

  private def exchange(url: String, headers: Map[String, String],
      timeoutMs: Int, form: Option[String]): String = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      form.foreach { body =>
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type",
          "application/x-www-form-urlencoded")
        conn.setDoOutput(true)
        try {
          val out = conn.getOutputStream
          try out.write(body.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        } catch {
          case e: IOException =>
            throw IngestClient.Retryable(s"transport: ${e.getMessage}")
        }
      }
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
          throw IngestClient.AuthRejected(s"auth rejected (401) for $url")
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

  /** The 429 Retry-After hint in ms. RFC 9110 allows both the
    * delta-seconds and the HTTP-date form; the value is CLAMPED to
    * >= 0 because it feeds Thread.sleep upstream — a malformed
    * negative delta (or an HTTP-date already in the past) must read
    * as "retry now", not throw IllegalArgumentException out of the
    * retry loop as a fake-fatal error. Unparseable values default to
    * 1 s like the reference (spotify_client.py:211). */
  private def retryAfterMs(conn: HttpURLConnection): Long = {
    val raw = Option(conn.getHeaderField("Retry-After")).map(_.trim)
    val deltaMs = raw.flatMap(s => scala.util.Try(s.toLong).toOption)
      .map(_ * 1000L)
    // getHeaderFieldDate parses the RFC 1123 HTTP-date form (0 when
    // absent/unparseable); converted to a relative wait since the
    // retry loop sleeps a duration, not until an instant
    def httpDate = raw.flatMap { _ =>
      val at = conn.getHeaderFieldDate("Retry-After", 0L)
      if (at > 0L) Some(at - System.currentTimeMillis()) else None
    }
    math.max(0L, deltaMs.orElse(httpDate).getOrElse(1000L))
  }
}

package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI}

/** Driver-side HTTP fetch with bounded retry — the reference's download
  * step (`/root/reference/data/airflow/dags/save_nyc_data_to_s3.py:98-107`:
  * GET, one retry after a backoff sleep) as a reusable utility. SURVEY §2.1
  * scopes HTTP ingest out-of-engine: files land via this utility (or any
  * fetcher), Spark reads the landed files — a 1000-executor cluster should
  * never funnel a download through query execution.
  *
  * Every error surfaced by this object is sanitized: only the HTTP status
  * or the exception CLASS name — never the URL, host, or original message,
  * any of which may embed pre-signed credentials or API keys. */
object Http {

  private val MaxRedirects = 3

  /** GET `url`, retrying transient failures (IO errors and 5xx) up to
    * `retries` times with a fixed backoff, following up to three redirects
    * (HttpURLConnection won't cross protocols on its own, and the TLC host
    * 301s http→https). 4xx responses fail immediately — re-requesting a
    * NotFound month is the reference's skip branch, not a retry case.
    * Returns the response body. */
  def fetchWithRetry(url: String, retries: Int = 1, backoffMs: Long = 1000L,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): Array[Byte] = {
    def attempt(target: String, redirectsLeft: Int): Array[Byte] = {
      val conn =
        try URI.create(target).toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        catch { // URI.create embeds the raw input in its message — redact
          case _: IllegalArgumentException | _: ClassCastException =>
            throw new IllegalArgumentException("malformed URL (redacted)")
        }
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setInstanceFollowRedirects(true) // same-protocol redirects
      try {
        val code = conn.getResponseCode
        if (code >= 300 && code < 400) {
          val loc = Option(conn.getHeaderField("Location"))
            .getOrElse(throw new IOException(s"HTTP $code without Location"))
          if (redirectsLeft <= 0)
            throw new IOException(s"HTTP $code: too many redirects")
          return attempt(loc, redirectsLeft - 1)
        }
        if (code >= 500) throw new IOException(s"HTTP $code (retryable)")
        if (code < 200 || code >= 300)
          throw new IllegalArgumentException(s"HTTP $code")
        val in = conn.getInputStream
        try in.readAllBytes() finally in.close()
      } finally conn.disconnect()
    }
    var attemptsLeft = retries
    while (true) {
      try return attempt(url, MaxRedirects)
      catch {
        case e: IOException =>
          if (attemptsLeft <= 0) {
            // UnknownHostException etc. carry the hostname — rethrow with
            // the class name only, no message, no cause chain
            val msg = Option(e.getMessage).filter(_.startsWith("HTTP "))
              .getOrElse(e.getClass.getSimpleName)
            throw new IOException(s"fetch failed after retries: $msg")
          }
          attemptsLeft -= 1
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

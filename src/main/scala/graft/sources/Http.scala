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
  * Error text deliberately carries only the HTTP status — never the URL,
  * which may embed pre-signed credentials or API keys. */
object Http {

  /** GET `url`, retrying transient failures (IO errors and 5xx) up to
    * `retries` times with a fixed backoff. 4xx responses fail immediately —
    * re-requesting a NotFound month is the reference's skip branch, not a
    * retry case. Returns the response body. */
  def fetchWithRetry(url: String, retries: Int = 1, backoffMs: Long = 1000L,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000): Array[Byte] = {
    def attempt(): Array[Byte] = {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      try {
        val code = conn.getResponseCode
        if (code >= 500) throw new IOException(s"HTTP $code (retryable)")
        if (code < 200 || code >= 300)
          throw new IllegalArgumentException(s"HTTP $code")
        val in = conn.getInputStream
        try in.readAllBytes() finally in.close()
      } finally conn.disconnect()
    }
    var attemptsLeft = retries
    while (true) {
      try return attempt()
      catch {
        case e: IOException =>
          if (attemptsLeft <= 0) throw e
          attemptsLeft -= 1
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

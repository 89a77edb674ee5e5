package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** OAuth bearer-token resolution for `gs://` — the auth mode most GCP
  * deployments actually issue (service-account / workload-identity
  * tokens), complementing the HMAC S3-interoperability path.
  *
  * Resolution order, per call:
  *  1. `graft.gs.token` / `GS_OAUTH_TOKEN`: a static access token
  *     (e.g. the output of `gcloud auth print-access-token`).
  *  2. `graft.gs.tokenUrl` / `GS_TOKEN_URL`: a metadata-server-style
  *     vending endpoint (the GCE/GKE convention:
  *     `http://metadata/computeMetadata/v1/instance/service-accounts/
  *     default/token`) returning `{"access_token":…,"expires_in":…}`.
  *     Requests carry `Metadata-Flavor: Google`, responses are cached
  *     until 60 s before expiry and refreshed on demand — one fetch
  *     serves many object requests, executors each vend their own.
  *
  * When neither is configured, [[configured]] is false and [[S3Store]]
  * falls back to HMAC SigV4 interop signing. Config is read per call
  * (JVM properties then env), same convention as the S3 credentials.
  */
object GcsToken {

  private def conf(prop: String, env: String): Option[String] =
    sys.props.get(prop).filter(_.nonEmpty)
      .orElse(sys.env.get(env).filter(_.nonEmpty))

  private def staticToken = conf("graft.gs.token", "GS_OAUTH_TOKEN")
  private def tokenUrl = conf("graft.gs.tokenUrl", "GS_TOKEN_URL")

  def configured: Boolean = staticToken.isDefined || tokenUrl.isDefined

  /** (token, expiresAtMs) — refreshed when less than 60 s of validity
    * remains, the margin Google's own client libraries use. */
  @volatile private var cached: (String, Long) = ("", 0L)

  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  def get(): String = staticToken.getOrElse {
    val url = tokenUrl.getOrElse(throw new IllegalStateException(
      "no gs:// bearer token source configured (graft.gs.token / " +
        "graft.gs.tokenUrl or GS_OAUTH_TOKEN / GS_TOKEN_URL)"))
    val now = System.currentTimeMillis()
    val c = cached
    if (now < c._2 - 60000L) c._1
    else synchronized {
      val c2 = cached // re-check under the lock: another thread may have refreshed
      if (System.currentTimeMillis() < c2._2 - 60000L) c2._1
      else {
        val (tok, ttlSec) = fetch(url)
        cached = (tok, System.currentTimeMillis() + ttlSec * 1000L)
        tok
      }
    }
  }

  private def fetch(url: String): (String, Long) = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(20))
      .header("Metadata-Flavor", "Google")
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200,
      s"HTTP ${resp.statusCode()} from token endpoint $url")
    val body = new String(resp.body(), UTF_8)
    val tok = "\"access_token\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(body).map(_.group(1)).getOrElse(
        throw new java.io.IOException(s"no access_token in response from $url"))
    val ttl = "\"expires_in\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(300L)
    (tok, ttl)
  }

  /** Test hook: drop the cache so a spec can force a refresh. */
  private[sources] def reset(): Unit = { cached = ("", 0L) }
}

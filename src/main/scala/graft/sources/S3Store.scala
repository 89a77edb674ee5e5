package graft.sources

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8

/** AWS Signature Version 4 request signing — the public algorithm from
  * the AWS General Reference ("Signature Version 4 signing process"),
  * service hard-wired to s3. Pure function of the request pieces so the
  * client, the test mock's verifier, and the documentation test vector
  * all call the same code path.
  *
  * Payloads are signed (`x-amz-content-sha256` = SHA-256 of the body,
  * never UNSIGNED-PAYLOAD): zarr blobs are already in memory when
  * written, so the hash is cheap and keeps the request verifiable
  * end-to-end. */
object SigV4 {

  def sha256Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  val emptyPayloadHash: String = sha256Hex(Array.emptyByteArray)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** RFC 3986 encoding with AWS's rules: unreserved chars pass through,
    * everything else percent-encodes uppercase; '/' passes through only
    * in paths (`encodeSlash = false`). */
  def uriEncode(s: String, encodeSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      val unreserved = c.isLetterOrDigit && c < 128 ||
        c == '-' || c == '_' || c == '.' || c == '~'
      if (unreserved || (c == '/' && !encodeSlash)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Compute the SigV4 `Authorization` header value plus the amz
    * headers that must travel with it. `query` is the DECODED
    * key→value list; `amzDate` is `yyyyMMdd'T'HHmmss'Z'`.
    * `service`/`region` form the credential scope. */
  def sign(method: String, host: String, path: String,
           query: Seq[(String, String)], payloadHash: String,
           amzDate: String, region: String, service: String,
           accessKey: String, secretKey: String,
           sessionToken: Option[String],
           extraSignedHeaders: Map[String, String] = Map.empty,
           signPayloadHeader: Boolean = true)
      : Map[String, String] = {
    val date = amzDate.substring(0, 8)
    val baseHeaders = Map(
      "host" -> host,
      "x-amz-date" -> amzDate) ++
      (if (signPayloadHeader) Map("x-amz-content-sha256" -> payloadHash)
       else Map.empty[String, String]) ++
      sessionToken.map("x-amz-security-token" -> _) ++
      extraSignedHeaders.map { case (k, v) => k.toLowerCase -> v.trim }
    val sortedHeaders = baseHeaders.toSeq.sortBy(_._1)
    val canonicalHeaders = sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")
    val canonicalQuery = query
      .map { case (k, v) => (uriEncode(k, encodeSlash = true),
        uriEncode(v, encodeSlash = true)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val canonicalRequest = Seq(
      method, uriEncode(path, encodeSlash = false), canonicalQuery,
      canonicalHeaders, signedHeaders, payloadHash).mkString("\n")
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secretKey).getBytes(UTF_8), date), region), service),
      "aws4_request")
    val signature = hmac(kSigning, stringToSign).map("%02x".format(_)).mkString
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
    (baseHeaders - "host") + ("Authorization" -> auth)
  }
}

/** S3-compatible authenticated object store (`s3://bucket/key…`) with
  * reads, ranged reads, listing, and writes (single PUT or multipart
  * for big blobs) — the backend the reference reaches through
  * fsspec/gcsfs for its flagship bucket-resident corpora
  * (examples/README.md:10). Speaks the public S3 REST API over
  * `java.net.http` with SigV4 signing; works against AWS or any
  * S3-compatible endpoint (MinIO, the test mock) via the standard
  * endpoint override.
  *
  * Config resolves per call from JVM system properties, then the
  * standard AWS environment variables (so executors configure
  * themselves the same way every AWS SDK does):
  *
  *  - `graft.s3.accessKey`  / `AWS_ACCESS_KEY_ID`
  *  - `graft.s3.secretKey`  / `AWS_SECRET_ACCESS_KEY`
  *  - `graft.s3.sessionToken` / `AWS_SESSION_TOKEN` (optional)
  *  - `graft.s3.region`     / `AWS_REGION` (default us-east-1)
  *  - `graft.s3.endpoint`   / `AWS_ENDPOINT_URL` (optional; presence
  *    switches to path-style addressing, the convention of
  *    S3-compatible servers)
  *  - `graft.s3.multipartBytes` — threshold AND part size for
  *    multipart PUT (default 64 MB; S3's single-PUT ceiling is 5 GB,
  *    its minimum part size 5 MB)
  *
  * Like [[HttpStore]]: shared pooled client, transient failures (IO,
  * 5xx, 429) retry with exponential backoff, sizes come from a 1-byte
  * ranged GET's `Content-Range` total (HEAD Content-Length is
  * unreliable across servers). Listing uses ListObjectsV2 with
  * `delimiter=/`. */
object S3Store extends BlobStore {
  private val maxAttempts = 4
  private val baseBackoffMs = 100L

  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(20))
    .build()

  /** Credential/config lookup chain: Spark task local property (set on
    * the DRIVER via `sc.setLocalProperty` — the only per-job channel
    * that reaches tasks in forked executor JVMs, where driver-side
    * `sys.props` are invisible; surfaced by the round-18 multi-JVM
    * correctness run) → JVM system property → environment variable.
    * On a real cluster, `spark.executorEnv.AWS_*` or an instance
    * profile are the usual sources; the local-property hop exists so
    * driver-vended per-job credentials also work. */
  private def conf(prop: String, env: String): Option[String] = {
    val tc = org.apache.spark.TaskContext.get()
    (if (tc == null) None
     else Option(tc.getLocalProperty(prop)).filter(_.nonEmpty))
      .orElse(sys.props.get(prop).filter(_.nonEmpty))
      .orElse(sys.env.get(env).filter(_.nonEmpty))
  }

  private final case class Cfg(endpoint: Option[URI], region: String,
                               accessKey: String, secretKey: String,
                               sessionToken: Option[String]) {
    def hostFor(bucket: String): String = endpoint match {
      case Some(u) =>
        if (u.getPort > 0) s"${u.getHost}:${u.getPort}" else u.getHost
      case None => s"$bucket.s3.$region.amazonaws.com"
    }
    def pathFor(bucket: String, key: String): String =
      if (endpoint.isDefined) s"/$bucket/$key" else s"/$key"
    def schemeFor: String = endpoint.map(_.getScheme).getOrElse("https")
  }

  /** Per-scheme config. `gs://` rides the same store through GCS's
    * public XML API at storage.googleapis.com (path-style), with two
    * auth modes:
    *  - OAuth bearer tokens ([[GcsToken]] — static token or a
    *    metadata-server-style vending endpoint), what GCP actually
    *    issues to service accounts / workload identity; the XML API
    *    accepts `Authorization: Bearer` directly. When a token source
    *    is configured it wins and no HMAC keys are required.
    *  - HMAC keys (GCS S3-interoperability credentials) from
    *    `GS_ACCESS_KEY_ID` / `GS_SECRET_ACCESS_KEY` (boto's naming)
    *    falling back to the AWS variables, SigV4 scope service
    *    `storage` with region `auto` — the convention of Google's
    *    XML-API signed requests. */
  private def cfgFor(url: String): (Cfg, String) =
    if (url.startsWith("gs://")) {
      val bearer = GcsToken.configured // HMAC keys unused (and not required)
      (Cfg(
        endpoint = conf("graft.gs.endpoint", "GS_ENDPOINT_URL").map(URI.create)
          .orElse(Some(URI.create("https://storage.googleapis.com"))),
        region = conf("graft.gs.region", "GS_REGION").getOrElse("auto"),
        accessKey = conf("graft.gs.accessKey", "GS_ACCESS_KEY_ID")
          .orElse(conf("graft.s3.accessKey", "AWS_ACCESS_KEY_ID"))
          .getOrElse(if (bearer) "" else
            throw new IllegalStateException(
              "gs:// needs credentials: set GS_OAUTH_TOKEN / GS_TOKEN_URL " +
                "(OAuth) or GS_ACCESS_KEY_ID / GS_SECRET_ACCESS_KEY (GCS " +
                "interoperability HMAC keys, or the AWS variables / " +
                "graft.gs.* system properties)")),
        secretKey = conf("graft.gs.secretKey", "GS_SECRET_ACCESS_KEY")
          .orElse(conf("graft.s3.secretKey", "AWS_SECRET_ACCESS_KEY"))
          .getOrElse(if (bearer) "" else
            throw new IllegalStateException("missing GS_SECRET_ACCESS_KEY")),
        sessionToken = None), "storage")
    }
    else (Cfg(
      endpoint = conf("graft.s3.endpoint", "AWS_ENDPOINT_URL").map(URI.create),
      region = conf("graft.s3.region", "AWS_REGION").getOrElse("us-east-1"),
      accessKey = conf("graft.s3.accessKey", "AWS_ACCESS_KEY_ID").getOrElse(
        throw new IllegalStateException(
          "s3:// needs credentials: set AWS_ACCESS_KEY_ID / " +
            "AWS_SECRET_ACCESS_KEY (or graft.s3.* system properties)")),
      secretKey = conf("graft.s3.secretKey", "AWS_SECRET_ACCESS_KEY").getOrElse(
        throw new IllegalStateException("missing AWS_SECRET_ACCESS_KEY")),
      sessionToken = conf("graft.s3.sessionToken", "AWS_SESSION_TOKEN")), "s3")

  private def multipartBytes: Long =
    conf("graft.s3.multipartBytes", "GRAFT_S3_MULTIPART_BYTES").map(_.toLong)
      .getOrElse(64L << 20)

  /** s3://bucket/key or gs://bucket/key → (bucket, key); key may be
    * empty (bucket root). */
  private[sources] def parse(url: String): (String, String) = {
    require(url.startsWith("s3://") || url.startsWith("gs://"),
      s"not an s3/gs url: $url")
    val rest = url.stripPrefix("s3://").stripPrefix("gs://")
    val slash = rest.indexOf('/')
    if (slash < 0) (rest, "")
    else (rest.substring(0, slash), rest.substring(slash + 1))
  }

  /** The scheme prefix of `url`, for re-building bucket-root urls. */
  private def schemePrefix(url: String): String =
    if (url.startsWith("gs://")) "gs://" else "s3://"

  private def amzNow(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  private def request(method: String, url: String,
                      query: Seq[(String, String)] = Nil,
                      body: Array[Byte] = Array.emptyByteArray,
                      range: Option[(Long, Long)] = None)
      : java.net.http.HttpResponse[Array[Byte]] = {
    val (c, service) = cfgFor(url)
    val (bucket, key) = parse(url)
    val path = c.pathFor(bucket, key)
    val host = c.hostFor(bucket)
    val payloadHash =
      if (body.isEmpty) SigV4.emptyPayloadHash else SigV4.sha256Hex(body)
    val canonicalQuery = query
      .map { case (k, v) => (SigV4.uriEncode(k, encodeSlash = true),
        SigV4.uriEncode(v, encodeSlash = true)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val uri = new URI(c.schemeFor, null, c.hostFor(bucket).split(':')(0),
      c.endpoint.map(_.getPort).getOrElse(-1), path,
      null, null).toString + (if (canonicalQuery.isEmpty) "" else s"?$canonicalQuery")
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      if (attempt > 0) Thread.sleep(baseBackoffMs << (attempt - 1))
      // signed fresh per attempt: the date (and so the signature) must
      // move with the retry clock; bearer mode re-resolves so a token
      // refreshed mid-retry is picked up
      val headers: Map[String, String] =
        if (service == "storage" && GcsToken.configured)
          Map("Authorization" -> s"Bearer ${GcsToken.get()}")
        else SigV4.sign(method, host, path, query, payloadHash,
          amzNow(), c.region, service, c.accessKey, c.secretKey, c.sessionToken)
      val b = java.net.http.HttpRequest.newBuilder(URI.create(uri))
        .timeout(java.time.Duration.ofMinutes(2))
        .method(method,
          if (body.isEmpty) java.net.http.HttpRequest.BodyPublishers.noBody()
          else java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      range.foreach { case (lo, hi) => b.header("Range", s"bytes=$lo-$hi") }
      try {
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() >= 500 || resp.statusCode() == 429)
          last = new java.io.IOException(
            s"HTTP ${resp.statusCode()} for $method $url")
        else return resp
      } catch {
        case e: java.io.IOException => last = e
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"$method $url failed after $maxAttempts attempts", last)
  }

  private def notFound(url: String) =
    throw new java.io.FileNotFoundException(s"no blob at $url")

  override def read(url: String): Array[Byte] = {
    val resp = request("GET", url)
    if (resp.statusCode() == 404) notFound(url)
    require(resp.statusCode() == 200,
      s"HTTP ${resp.statusCode()} for $url: ${new String(resp.body(), UTF_8).take(200)}")
    BlobStore.bytesFetched.addAndGet(resp.body().length.toLong)
    resp.body()
  }

  override def readIfExists(url: String): Option[Array[Byte]] = {
    val resp = request("GET", url)
    if (resp.statusCode() == 404) None
    else {
      require(resp.statusCode() == 200, s"HTTP ${resp.statusCode()} for $url")
      BlobStore.bytesFetched.addAndGet(resp.body().length.toLong)
      Some(resp.body())
    }
  }

  /** Size from a 1-byte ranged GET's `Content-Range: bytes 0-0/TOTAL`
    * (same rationale as [[HttpStore.sizeIfExists]]); 416 means the
    * blob exists but is empty (a zero-length object satisfies no
    * range), 200 means the server ignored Range and the body IS the
    * blob. */
  override def sizeIfExists(url: String): Option[Long] = {
    val resp = request("GET", url, range = Some((0L, 0L)))
    resp.statusCode() match {
      case 404 => None
      case 416 => Some(0L)
      case 206 =>
        val cr = resp.headers().firstValue("Content-Range")
        require(cr.isPresent, s"206 without Content-Range for $url")
        val total = cr.get().substring(cr.get().indexOf('/') + 1)
        require(total != "*", s"Content-Range total unknown for $url")
        Some(total.toLong)
      case 200 => Some(resp.body().length.toLong)
      case s => throw new java.io.IOException(s"HTTP $s sizing $url")
    }
  }

  override def readRange(url: String, offset: Long, length: Int): Array[Byte] = {
    require(offset >= 0 && length >= 0, s"bad range $offset+$length for $url")
    if (length == 0) return Array.emptyByteArray
    val resp = request("GET", url, range = Some((offset, offset + length - 1)))
    if (resp.statusCode() == 404) notFound(url)
    if (resp.statusCode() == 416) throw new java.io.IOException(
      s"range $offset+$length not satisfiable for $url")
    val body = resp.statusCode() match {
      case 206 => resp.body()
      case 200 =>
        require(offset + length <= resp.body().length,
          s"range $offset+$length past end of $url")
        java.util.Arrays.copyOfRange(
          resp.body(), offset.toInt, offset.toInt + length)
      case s => throw new java.io.IOException(s"HTTP $s for ranged $url")
    }
    require(body.length == length,
      s"ranged GET returned ${body.length} bytes, wanted $length ($url)")
    BlobStore.bytesFetched.addAndGet(length.toLong)
    BlobStore.rangeFetches.incrementAndGet()
    body
  }

  override def write(url: String, bytes: Array[Byte]): Unit =
    if (bytes.length <= multipartBytes) {
      val resp = request("PUT", url, body = bytes)
      require(resp.statusCode() == 200,
        s"HTTP ${resp.statusCode()} writing $url: " +
          new String(resp.body(), UTF_8).take(200))
    } else writeMultipart(url, bytes)

  /** Multipart upload for shard-sized blobs: initiate → parallel-safe
    * sequential part PUTs of `multipartBytes` each → complete with the
    * part manifest. Parts are uploaded from slices of the in-memory
    * blob; S3 requires every part but the last ≥ 5 MB, which the 64 MB
    * default satisfies. */
  private def writeMultipart(url: String, bytes: Array[Byte]): Unit = {
    val init = request("POST", url, query = Seq("uploads" -> ""))
    require(init.statusCode() == 200,
      s"HTTP ${init.statusCode()} initiating multipart for $url")
    val uploadId = firstXml(new String(init.body(), UTF_8), "UploadId")
      .getOrElse(throw new java.io.IOException(
        s"no UploadId in InitiateMultipartUpload response for $url"))
    val partSize = multipartBytes.toInt
    val etags = Iterator.from(0).map(_.toLong * partSize)
      .takeWhile(_ < bytes.length).zipWithIndex.map { case (off, i) =>
        val end = math.min(off + partSize, bytes.length).toInt
        val part = java.util.Arrays.copyOfRange(bytes, off.toInt, end)
        val resp = request("PUT", url, query = Seq(
          "partNumber" -> (i + 1).toString, "uploadId" -> uploadId),
          body = part)
        require(resp.statusCode() == 200,
          s"HTTP ${resp.statusCode()} on part ${i + 1} of $url")
        val etag = resp.headers().firstValue("ETag")
        require(etag.isPresent, s"no ETag on part ${i + 1} of $url")
        (i + 1, etag.get())
      }.toSeq
    val manifest = etags.map { case (n, etag) =>
      s"<Part><PartNumber>$n</PartNumber><ETag>$etag</ETag></Part>"
    }.mkString("<CompleteMultipartUpload>", "", "</CompleteMultipartUpload>")
    val done = request("POST", url, query = Seq("uploadId" -> uploadId),
      body = manifest.getBytes(UTF_8))
    require(done.statusCode() == 200,
      s"HTTP ${done.statusCode()} completing multipart for $url")
  }

  override def exists(url: String): Boolean =
    sizeIfExists(url).isDefined || isContainer(url)

  /** ListObjectsV2 with `delimiter=/`: immediate child "directories"
    * are the CommonPrefixes. Continuation tokens page through large
    * stores. */
  override def listChildren(url: String): Seq[String] = {
    val (bucket, key) = parse(url.stripSuffix("/") + "/")
    val out = scala.collection.mutable.LinkedHashSet[String]()
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = Seq("list-type" -> "2", "prefix" -> key, "delimiter" -> "/") ++
        token.map("continuation-token" -> _)
      val resp = request("GET", schemePrefix(url) + s"$bucket/", query = q)
      require(resp.statusCode() == 200,
        s"HTTP ${resp.statusCode()} listing $url")
      val xml = new String(resp.body(), UTF_8)
      allXml(xml, "Prefix").filter(_ != key).foreach { p =>
        out += p.stripPrefix(key).stripSuffix("/")
      }
      token = firstXml(xml, "NextContinuationToken")
      more = firstXml(xml, "IsTruncated").contains("true") && token.isDefined
    }
    out.toSeq.sorted
  }

  override def isContainer(url: String): Boolean = {
    val (bucket, key) = parse(url.stripSuffix("/") + "/")
    val resp = request("GET", schemePrefix(url) + s"$bucket/", query = Seq(
      "list-type" -> "2", "prefix" -> key, "max-keys" -> "1"))
    require(resp.statusCode() == 200,
      s"HTTP ${resp.statusCode()} probing $url")
    firstXml(new String(resp.body(), UTF_8), "KeyCount").exists(_.toInt > 0)
  }

  // Minimal tag extraction for S3's flat response XML (keys in zarr
  // stores are [A-Za-z0-9._/-], so entity unescaping of the basic five
  // covers every payload we produce or parse).
  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    .replace("&apos;", "'").replace("&amp;", "&")

  private[sources] def firstXml(xml: String, tag: String): Option[String] =
    s"<$tag>([^<]*)</$tag>".r.findFirstMatchIn(xml).map(m => unescape(m.group(1)))

  private[sources] def allXml(xml: String, tag: String): Seq[String] =
    s"<$tag>([^<]*)</$tag>".r.findAllMatchIn(xml).map(m => unescape(m.group(1))).toSeq
}

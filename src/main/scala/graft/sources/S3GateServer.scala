package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

/** In-process S3-compatible endpoint backing the `x82` oracle gate.
  *
  * The SigV4 client ([[S3Store]]) is spec-proven against a
  * signature-verifying mock, but the driver's round gate
  * (`SparkEntry.queries`) is the only signal re-checked every round —
  * so the authenticated write path (StagedWrites staging → multipart
  * PUT assembly → signed ranged GETs on re-read) gets its own gate,
  * served by this endpoint. It is a test fixture that happens to live
  * in main so a `queries` entry can reach it; it binds 127.0.0.1 on an
  * ephemeral port, starts lazily on first use, and verifies the SigV4
  * signature of EVERY request by recomputing it with the known
  * credentials — an unsigned or mis-signed request 403s, so the gate
  * passing proves the client actually signs.
  *
  * Protocol surface (exactly what [[S3Store]] speaks): GET/HEAD object
  * (with Range), PUT object, ListObjectsV2, and the three-step
  * multipart upload. Blobs live in a process-wide map — driver and
  * local-mode executors share the JVM, mirroring how a real cluster
  * shares a bucket.
  */
object S3GateServer {

  val ACCESS = "GRAFTGATEACCESSKEY"
  val SECRET = "graft-gate-secret-key"

  private val blobs =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val uploads = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]]()

  /** Start (once) and point graft.s3.* at this endpoint. A tiny
    * multipart threshold forces shard-sized chunk blobs through the
    * multipart path, which is the code under test; real deployments
    * keep the 64 MB default. */
  def install(): Unit = synchronized {
    val ep = endpoint // force start
    val props = Seq(
      "graft.s3.endpoint" -> ep,
      "graft.s3.accessKey" -> ACCESS,
      "graft.s3.secretKey" -> SECRET,
      "graft.s3.multipartBytes" -> "4096")
    props.foreach { case (k, v) => sys.props(k) = v }
    // sys.props only reach tasks when executors share this JVM; local
    // properties ride every task launched from this thread (and its
    // children), so the gate also runs under local-cluster / real
    // clusters where executor JVMs are forked (S3Store.conf reads them
    // via TaskContext.getLocalProperty)
    org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
      props.foreach { case (k, v) => s.sparkContext.setLocalProperty(k, v) }
    }
  }

  /** Every server thread must be a daemon: Verify/Bench end by falling
    * off main, and a non-daemon dispatcher would keep the JVM alive
    * forever after the suite finishes. The dispatcher thread inherits
    * daemon status from its creator, so the server is started FROM a
    * daemon thread; the request pool gets an explicit daemon factory. */
  lazy val endpoint: String = {
    val handoff = new java.util.concurrent.ArrayBlockingQueue[String](1)
    val starter = new Thread(() => {
      val server = HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      // StagedWrites flushes with a 16-thread pool; serve concurrently
      server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => {
          val t = new Thread(r, "s3-gate-worker")
          t.setDaemon(true)
          t
        }))
      server.createContext("/", handler)
      server.start()
      handoff.put(s"http://127.0.0.1:${server.getAddress.getPort}")
    }, "s3-gate-starter")
    starter.setDaemon(true)
    starter.start()
    handoff.take()
  }

  private def parseQuery(raw: String): Seq[(String, String)] =
    if (raw == null || raw.isEmpty) Nil
    else raw.split("&").toSeq.map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (URLDecoder.decode(kv, "UTF-8"), "")
      else (URLDecoder.decode(kv.take(i), "UTF-8"),
        URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
    }

  /** Recompute the request's SigV4 signature with the known secret and
    * require an exact match (region/service taken from the request's
    * own credential scope, like a real verifier). */
  private def signatureOk(ex: HttpExchange, body: Array[Byte]): Boolean = {
    val hdr = ex.getRequestHeaders
    val auth = Option(hdr.getFirst("Authorization")).getOrElse(return false)
    val amzDate = Option(hdr.getFirst("x-amz-date")).getOrElse(return false)
    val bodyHash =
      Option(hdr.getFirst("x-amz-content-sha256")).getOrElse(return false)
    if (SigV4.sha256Hex(body) != bodyHash) return false
    val scope = "Credential=([^/]+)/\\d{8}/([^/]+)/([^/]+)/aws4_request".r
      .findFirstMatchIn(auth).getOrElse(return false)
    if (scope.group(1) != ACCESS) return false
    val expected = SigV4.sign(ex.getRequestMethod,
      Option(hdr.getFirst("Host")).getOrElse(""),
      ex.getRequestURI.getPath, parseQuery(ex.getRequestURI.getRawQuery),
      bodyHash, amzDate, scope.group(2), scope.group(3),
      ACCESS, SECRET, None)
    expected("Authorization") == auth
  }

  private val handler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      val body = ex.getRequestBody.readAllBytes()
      if (!signatureOk(ex, body)) { ex.sendResponseHeaders(403, -1); return }
      val key = ex.getRequestURI.getPath.stripPrefix("/")
      val q = parseQuery(ex.getRequestURI.getRawQuery).toMap
      (ex.getRequestMethod, q) match {
        case ("GET", qq) if qq.contains("list-type") => listV2(ex, key, qq)
        case ("POST", qq) if qq.contains("uploads") =>
          val id = java.util.UUID.randomUUID().toString
          val parts =
            new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
          parts.put(0, key.getBytes(UTF_8)) // slot 0 remembers the key
          uploads.put(id, parts)
          xml(ex, "<InitiateMultipartUploadResult><UploadId>" + id +
            "</UploadId></InitiateMultipartUploadResult>")
        case ("PUT", qq) if qq.contains("uploadId") =>
          val parts = uploads.get(qq("uploadId"))
          if (parts == null) { ex.sendResponseHeaders(404, -1); return }
          parts.put(qq("partNumber").toInt, body)
          ex.getResponseHeaders.add(
            "ETag", "\"" + SigV4.sha256Hex(body).take(32) + "\"")
          ex.sendResponseHeaders(200, -1)
        case ("POST", qq) if qq.contains("uploadId") =>
          val parts = uploads.remove(qq("uploadId"))
          if (parts == null) { ex.sendResponseHeaders(404, -1); return }
          val target = new String(parts.remove(0), UTF_8)
          import scala.jdk.CollectionConverters._
          blobs.put(target,
            parts.asScala.toSeq.sortBy(_._1).flatMap(_._2.toSeq).toArray)
          xml(ex, "<CompleteMultipartUploadResult/>")
        case ("PUT", _) =>
          blobs.put(key, body)
          ex.sendResponseHeaders(200, -1)
        case ("GET", _) | ("HEAD", _) =>
          val b = blobs.get(key)
          if (b == null) { ex.sendResponseHeaders(404, -1); return }
          if (ex.getRequestMethod == "HEAD") {
            ex.getResponseHeaders.add("Content-Length", b.length.toString)
            ex.sendResponseHeaders(200, -1)
            return
          }
          Option(ex.getRequestHeaders.getFirst("Range")) match {
            case Some(r) =>
              val Array(lo, hi) = r.stripPrefix("bytes=").split("-").map(_.toLong)
              if (lo >= b.length) {
                ex.getResponseHeaders.add("Content-Range", s"bytes */${b.length}")
                ex.sendResponseHeaders(416, -1)
                return
              }
              val end = math.min(hi, b.length - 1L).toInt
              val part = java.util.Arrays.copyOfRange(b, lo.toInt, end + 1)
              ex.getResponseHeaders.add(
                "Content-Range", s"bytes $lo-$end/${b.length}")
              ex.sendResponseHeaders(206, part.length.toLong)
              ex.getResponseBody.write(part)
            case None =>
              ex.sendResponseHeaders(200, math.max(b.length.toLong, -1L))
              if (b.nonEmpty) ex.getResponseBody.write(b)
          }
        case _ => ex.sendResponseHeaders(400, -1)
      }
    } finally ex.close()
  }

  /** ListObjectsV2: keys under bucket/prefix, optionally folded at the
    * delimiter into CommonPrefixes (how the client lists "directories"). */
  private def listV2(ex: HttpExchange, bucket: String,
                     q: Map[String, String]): Unit = {
    val prefix = q.getOrElse("prefix", "")
    val full = s"${bucket.stripSuffix("/")}/$prefix"
    import scala.jdk.CollectionConverters._
    val tails = blobs.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(full))
      .map(_.stripPrefix(s"${bucket.stripSuffix("/")}/"))
    val (keys, commons) = q.get("delimiter") match {
      case None => (tails, Nil)
      case Some(d) =>
        val (nested, flat) = tails.partition(_.stripPrefix(prefix).contains(d))
        (flat, nested.map(k =>
          prefix + k.stripPrefix(prefix).takeWhile(_ != d.head) + d).distinct)
    }
    val maxKeys = q.get("max-keys").map(_.toInt).getOrElse(1000)
    val shown = keys.take(maxKeys)
    val sb = new StringBuilder("<ListBucketResult>")
    sb.append(s"<KeyCount>${shown.size + commons.size}</KeyCount>")
    shown.foreach(k => sb.append(s"<Contents><Key>$k</Key></Contents>"))
    commons.foreach(p =>
      sb.append(s"<CommonPrefixes><Prefix>$p</Prefix></CommonPrefixes>"))
    sb.append("<IsTruncated>false</IsTruncated></ListBucketResult>")
    xml(ex, sb.toString)
  }

  private def xml(ex: HttpExchange, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    ex.sendResponseHeaders(200, b.length.toLong)
    ex.getResponseBody.write(b)
  }
}

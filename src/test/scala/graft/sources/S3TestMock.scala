package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-memory S3-compatible endpoint on an ephemeral port that VERIFIES
* SigV4 on every request against its CURRENT credentials — which are
* mutable via [[rotate]], so specs can prove that a driver-side
* credential rotation reaches later jobs' tasks (the vending scenario
* GraftProps exists for). Shared by S3StoreSpec and
* GraftPropsRotationSpec. */
final class S3TestMock(failFirst: Int = 0,
                     initialAccess: String, initialSecret: String) {
@volatile private var accessKey: String = initialAccess
@volatile private var secretKey: String = initialSecret
/** Swap the only credentials the verifier accepts (old ones 403). */
def rotate(access: String, secret: String): Unit = {
  accessKey = access; secretKey = secret
}
  val blobs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val uploads = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]]()
  private val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
  val authFailures = new java.util.concurrent.atomic.AtomicInteger(0)

  private val server = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  private def parseQuery(raw: String): Seq[(String, String)] =
    if (raw == null || raw.isEmpty) Nil
    else raw.split("&").toSeq.map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (URLDecoder.decode(kv, "UTF-8"), "")
      else (URLDecoder.decode(kv.take(i), "UTF-8"),
        URLDecoder.decode(kv.drop(i + 1), "UTF-8"))
    }

  /** Recompute the SigV4 signature for this exchange with the known
    * credentials; reject on mismatch. Region and service come from
    * the request's own credential scope (like a real verifier): the
    * gs:// interop path signs scope `auto/storage`, s3:// signs
    * `us-east-1/s3` — both must verify against the same secret. */
  private def authOk(ex: HttpExchange, body: Array[Byte]): Boolean = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
    val amzDate = Option(ex.getRequestHeaders.getFirst("x-amz-date"))
    val payloadHash = Option(ex.getRequestHeaders.getFirst("x-amz-content-sha256"))
    if (auth.isEmpty || amzDate.isEmpty || payloadHash.isEmpty) return false
    // the client signs the payload it sends: verify the hash too
    if (SigV4.sha256Hex(body) != payloadHash.get) return false
    val scope = "Credential=([^/]+)/(\\d{8})/([^/]+)/([^/]+)/aws4_request".r
      .findFirstMatchIn(auth.get).getOrElse(return false)
    if (scope.group(1) != accessKey) return false
    val host = Option(ex.getRequestHeaders.getFirst("Host")).getOrElse("")
    val expected = SigV4.sign(ex.getRequestMethod, host,
      ex.getRequestURI.getPath, parseQuery(ex.getRequestURI.getRawQuery),
      payloadHash.get, amzDate.get, scope.group(3), scope.group(4),
      accessKey, secretKey, None)
    expected("Authorization") == auth.get
  }

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      val body = ex.getRequestBody.readAllBytes()
      if (failures.getAndDecrement() > 0) {
        ex.sendResponseHeaders(500, -1)
        return
      }
      if (!authOk(ex, body)) {
        authFailures.incrementAndGet()
        ex.sendResponseHeaders(403, -1)
        return
      }
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val q = parseQuery(ex.getRequestURI.getRawQuery).toMap
      (ex.getRequestMethod, q) match {
        case ("GET", qq) if qq.contains("list-type") =>
          list(ex, path.stripSuffix("/"), qq)
        case ("POST", qq) if qq.contains("uploads") =>
          val id = java.util.UUID.randomUUID().toString
          uploads.put(id, new java.util.concurrent.ConcurrentHashMap())
          uploads.get(id).put(0, path.getBytes(UTF_8)) // slot 0: the key
          respond(ex, 200,
            s"<InitiateMultipartUploadResult><UploadId>$id</UploadId></InitiateMultipartUploadResult>")
        case ("PUT", qq) if qq.contains("uploadId") =>
          val parts = uploads.get(qq("uploadId"))
          if (parts == null) { ex.sendResponseHeaders(404, -1); return }
          val n = qq("partNumber").toInt
          parts.put(n, body)
          ex.getResponseHeaders.add("ETag", "\"" + SigV4.sha256Hex(body).take(32) + "\"")
          ex.sendResponseHeaders(200, -1)
        case ("POST", qq) if qq.contains("uploadId") =>
          val parts = uploads.remove(qq("uploadId"))
          if (parts == null) { ex.sendResponseHeaders(404, -1); return }
          val key = new String(parts.remove(0), UTF_8)
          import scala.jdk.CollectionConverters._
          val assembled = parts.asScala.toSeq.sortBy(_._1)
            .flatMap(_._2.toSeq).toArray
          blobs.put(key, assembled)
          respond(ex, 200, "<CompleteMultipartUploadResult/>")
        case ("PUT", _) =>
          blobs.put(path, body)
          ex.sendResponseHeaders(200, -1)
        case ("GET", _) | ("HEAD", _) =>
          val b = blobs.get(path)
          if (b == null) { ex.sendResponseHeaders(404, -1); return }
          if (ex.getRequestMethod == "HEAD") {
            ex.sendResponseHeaders(200, -1)
            return
          }
          Option(ex.getRequestHeaders.getFirst("Range")) match {
            case Some(r) =>
              val bounds = r.stripPrefix("bytes=").split("-")
              val lo = bounds(0).toLong
              val hi = bounds(1).toLong
              if (lo >= b.length) { // zero-length blob or past-end range
                ex.getResponseHeaders.add("Content-Range", s"bytes */${b.length}")
                ex.sendResponseHeaders(416, -1)
                return
              }
              val end = math.min(hi, b.length - 1L)
              val part = java.util.Arrays.copyOfRange(b, lo.toInt, end.toInt + 1)
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
  })

  private def respond(ex: HttpExchange, code: Int, xml: String): Unit = {
    val b = xml.getBytes(UTF_8)
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
  }

  /** ListObjectsV2 with delimiter: emit CommonPrefixes + KeyCount. */
  private def list(ex: HttpExchange, bucket: String,
                   q: Map[String, String]): Unit = {
    val prefix = q.getOrElse("prefix", "")
    val delim = q.get("delimiter")
    import scala.jdk.CollectionConverters._
    val keys = blobs.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(s"$bucket/$prefix"))
      .map(_.stripPrefix(s"$bucket/"))
    val (commons, plain) = delim match {
      case Some(d) =>
        val grouped = keys.partition(k =>
          k.stripPrefix(prefix).contains(d))
        (grouped._1.map(k =>
          prefix + k.stripPrefix(prefix).takeWhile(_ != d.head) + d).distinct,
          grouped._2)
      case None => (Nil, keys)
    }
    val maxKeys = q.get("max-keys").map(_.toInt).getOrElse(1000)
    val shown = plain.take(maxKeys)
    val xml = new StringBuilder("<ListBucketResult>")
    xml.append(s"<Prefix>$prefix</Prefix>")
    xml.append(s"<KeyCount>${shown.size + commons.size}</KeyCount>")
    xml.append("<IsTruncated>false</IsTruncated>")
    shown.foreach(k => xml.append(s"<Contents><Key>$k</Key></Contents>"))
    commons.foreach(p =>
      xml.append(s"<CommonPrefixes><Prefix>$p</Prefix></CommonPrefixes>"))
    xml.append("</ListBucketResult>")
    respond(ex, 200, xml.toString)
  }

  server.start()
  val port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

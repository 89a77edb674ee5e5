package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.nio.charset.StandardCharsets.UTF_8

/** gs:// OAuth bearer auth (SURVEY §8.1): an in-process token-vending
  * endpoint (the GCE metadata-server shape) plus a storage endpoint
  * that 403s any request not carrying `Authorization: Bearer` with the
  * CURRENTLY-vended token. Proves: requests are bearer-authenticated,
  * the token is cached across many object requests (one vend, many
  * uses), an expired token is re-vended, and the vend request carries
  * the `Metadata-Flavor: Google` header the metadata server requires. */
class GsOAuthSpec extends AnyFunSuite {

  /** Token vendor + storage on one server. Bump `rotate()` to expire
    * the current token: old bearers then 403. */
  private final class GsMock {
    @volatile var token = "tok-0"
    @volatile var ttlSec: Long = 3600L
    val vends = new java.util.concurrent.atomic.AtomicInteger(0)
    val badAuth = new java.util.concurrent.atomic.AtomicInteger(0)
    val blobs = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

    def rotate(): Unit = { token = "tok-" + (vends.get() + 100) }

    private val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

    server.createContext("/token", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        // the metadata server rejects vend requests without this header
        if (ex.getRequestHeaders.getFirst("Metadata-Flavor") != "Google") {
          ex.sendResponseHeaders(403, -1); return
        }
        vends.incrementAndGet()
        val body = (s"""{"access_token":"$token","expires_in":$ttlSec,""" +
          """"token_type":"Bearer"}""").getBytes(UTF_8)
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
      } finally ex.close()
    })

    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        if (auth != s"Bearer $token") {
          badAuth.incrementAndGet()
          ex.sendResponseHeaders(403, -1); return
        }
        val key = ex.getRequestURI.getPath.stripPrefix("/")
        val body = ex.getRequestBody.readAllBytes()
        ex.getRequestMethod match {
          case "PUT" =>
            blobs.put(key, body); ex.sendResponseHeaders(200, -1)
          case "GET" if ex.getRequestURI.getRawQuery != null &&
              ex.getRequestURI.getRawQuery.contains("list-type") =>
            import scala.jdk.CollectionConverters._
            val prefix = ex.getRequestURI.getRawQuery.split("&")
              .find(_.startsWith("prefix=")).map(p =>
                java.net.URLDecoder.decode(p.stripPrefix("prefix="), "UTF-8"))
              .getOrElse("")
            val kids = blobs.keySet().asScala.toSeq.sorted
              .filter(_.startsWith(s"$key$prefix"))
              .map(_.stripPrefix(key))
            val xml = (s"<ListBucketResult><KeyCount>${kids.size}</KeyCount>" +
              kids.map { k =>
                val tail = k.stripPrefix(prefix)
                if (tail.contains("/"))
                  s"<CommonPrefixes><Prefix>$prefix${tail.takeWhile(_ != '/')}/</Prefix></CommonPrefixes>"
                else s"<Contents><Key>$k</Key></Contents>"
              }.mkString +
              "<IsTruncated>false</IsTruncated></ListBucketResult>").getBytes(UTF_8)
            ex.sendResponseHeaders(200, xml.length.toLong)
            ex.getResponseBody.write(xml)
          case "GET" =>
            val b = blobs.get(key)
            if (b == null) { ex.sendResponseHeaders(404, -1); return }
            Option(ex.getRequestHeaders.getFirst("Range")) match {
              case Some(r) =>
                val Array(lo, hi) = r.stripPrefix("bytes=").split("-").map(_.toLong)
                if (lo >= b.length) {
                  ex.getResponseHeaders.add("Content-Range", s"bytes */${b.length}")
                  ex.sendResponseHeaders(416, -1); return
                }
                val end = math.min(hi, b.length - 1L).toInt
                val part = java.util.Arrays.copyOfRange(b, lo.toInt, end + 1)
                ex.getResponseHeaders.add("Content-Range", s"bytes $lo-$end/${b.length}")
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

    server.start()
    val port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def withMock(body: GsMock => Unit): Unit = {
    val mock = new GsMock
    val keys = Seq("graft.gs.endpoint", "graft.gs.tokenUrl", "graft.gs.token")
    val saved = keys.map(k => k -> sys.props.get(k))
    sys.props("graft.gs.endpoint") = s"http://127.0.0.1:${mock.port}"
    sys.props("graft.gs.tokenUrl") = s"http://127.0.0.1:${mock.port}/token"
    sys.props -= "graft.gs.token"
    GcsToken.reset()
    try body(mock)
    finally {
      saved.foreach { case (k, v) =>
        v match { case Some(x) => sys.props(k) = x; case None => sys.props -= k }
      }
      GcsToken.reset()
      mock.stop()
    }
  }

  test("bearer roundtrip: write/read/range/list all carry the vended token") {
    withMock { mock =>
      val store = BlobStore.forUrl("gs://bkt/obj")
      val payload = Array.tabulate[Byte](1000)(_.toByte)
      store.write("gs://bkt/dir/a", payload)
      store.write("gs://bkt/dir/sub/b", Array[Byte](1, 2, 3))
      assert(store.read("gs://bkt/dir/a").toSeq == payload.toSeq)
      assert(store.readRange("gs://bkt/dir/a", 10, 5).toSeq ==
        payload.slice(10, 15).toSeq)
      assert(store.sizeIfExists("gs://bkt/dir/a").contains(1000L))
      assert(store.listChildren("gs://bkt/dir").contains("sub"))
      assert(mock.badAuth.get() == 0)
      // one vend served every request above
      assert(mock.vends.get() == 1)
    }
  }

  test("expired token is re-vended; requests never go out stale") {
    withMock { mock =>
      mock.ttlSec = 61 // expires immediately past the 60s refresh margin
      val store = BlobStore.forUrl("gs://bkt/obj")
      store.write("gs://bkt/k1", Array[Byte](9))
      val vendsAfterFirst = mock.vends.get()
      mock.rotate() // server now only accepts the NEW token
      Thread.sleep(1100) // push past ttl - 60s margin
      assert(store.read("gs://bkt/k1").toSeq == Seq(9.toByte))
      assert(mock.vends.get() > vendsAfterFirst)
      assert(mock.badAuth.get() == 0)
    }
  }

  test("static token (graft.gs.token) wins over the vending endpoint") {
    withMock { mock =>
      sys.props("graft.gs.token") = mock.token
      try {
        BlobStore.forUrl("gs://bkt/x").write("gs://bkt/x", Array[Byte](7))
        assert(mock.vends.get() == 0)
        assert(mock.badAuth.get() == 0)
      } finally sys.props -= "graft.gs.token"
    }
  }
}

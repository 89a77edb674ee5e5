package graft.sources

import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.Fixtures.arange
import graft.core.{Template, VarSpec}
import graft.ndarray.DType

/** The http(s):// BlobStore against an in-process static file server —
  * the minimal GET/HEAD + Range surface any web server or object-store
  * website endpoint provides. Proves a consolidated zarr store is fully
  * readable over plain HTTP, including ranged reads of shard interiors,
  * and that transient 5xx responses are retried. */
class HttpStoreSpec extends AnyFunSuite {

  /** Serve `root` on an ephemeral localhost port. `failFirst` requests
    * get a 500 before the server behaves (retry exercise). `allowPut`
    * false answers 405 to writes — a static file server. */
  private def withServer[A](root: Path, failFirst: Int = 0,
                            allowPut: Boolean = true,
                            putStatus: Int = 201,
                            putStores: Boolean = true)
                           (body: String => A): A = {
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        if (failures.getAndDecrement() > 0) {
          ex.sendResponseHeaders(500, -1)
          return
        }
        val rel = ex.getRequestURI.getPath.stripPrefix("/")
        val f = root.resolve(rel)
        if (ex.getRequestMethod == "PUT") {
          // the WebDAV/nginx-dav write shape HttpStore.write targets
          if (!allowPut) { ex.sendResponseHeaders(405, -1); return }
          val bytes = ex.getRequestBody.readAllBytes()
          if (putStores) {
            Files.createDirectories(f.getParent)
            Files.write(f, bytes)
          }
          ex.sendResponseHeaders(putStatus, -1)
          return
        }
        if (!Files.exists(f) || Files.isDirectory(f)) {
          ex.sendResponseHeaders(404, -1)
          return
        }
        val all = Files.readAllBytes(f)
        if (ex.getRequestMethod == "HEAD") {
          ex.sendResponseHeaders(200, -1) // status only; no body
          return
        }
        Option(ex.getRequestHeaders.getFirst("Range")) match {
          case Some(r) =>
            val Array(lo, hi) = r.stripPrefix("bytes=").split("-").map(_.toLong)
            if (lo >= all.length) {
              // what real servers (incl. Java's HttpServer behind a
              // zero-length file) answer: 416 with the total after '/'
              ex.getResponseHeaders.add("Content-Range", s"bytes */${all.length}")
              ex.sendResponseHeaders(416, -1)
              return
            }
            val end = math.min(hi, all.length - 1L)
            val body = java.util.Arrays.copyOfRange(all, lo.toInt, end.toInt + 1)
            ex.getResponseHeaders.add(
              "Content-Range", s"bytes $lo-$end/${all.length}")
            ex.sendResponseHeaders(206, body.length.toLong)
            ex.getResponseBody.write(body)
          case None =>
            ex.sendResponseHeaders(200, all.length.toLong)
            ex.getResponseBody.write(all)
        }
      } finally ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val template = Template(
    Seq("t" -> 16L, "x" -> 8L),
    Map("v" -> VarSpec(Seq("t", "x"), DType.F64)),
    coords = Map("t" -> arange(DType.I64, 16)), attrs = Map.empty)

  test("consolidated v2 store over http://: open + region read") {
    val dir = Files.createTempDirectory("httpzarr")
    Zarr.setupStore(dir.toString, template, Map("t" -> 4, "x" -> 8),
      Some("zlib"))
    val data = arange(DType.F64, 16, 8)
    val meta = Zarr.readArrayMeta(dir.toString, "v")
    Zarr.writeRegion(dir.toString, "v", meta, Array(0L, 0L), data)
    withServer(dir) { base =>
      val sm = Zarr.openStore(base) // one GET of .zmetadata, no listing
      assert(sm.dims == Seq("t" -> 16L, "x" -> 8L))
      val m = sm.arrays("v")
      val got = Zarr.readRegion(base, "v", m, Array(3L, 2L), Array(6, 4))
      assert(got.sameAs(data.slice(Array(3, 2), Array(6, 4))))
      assert(Zarr.readCoord(base, "t", sm.arrays("t")).toLongs.toSeq ==
        (0L until 16L))
    }
  }

  test("sharded v3 store over http://: inner chunks fetched by ranged GET") {
    val dir = Files.createTempDirectory("httpzarr3")
    val big = Template(
      Seq("t" -> 32L, "x" -> 16L),
      Map("v" -> VarSpec(Seq("t", "x"), DType.F64)),
      coords = Map("t" -> arange(DType.I64, 32)), attrs = Map.empty)
    // 4 KiB inner chunks (8x8... here 8x8=512 doubles? 8*8*8=512B) —
    // sizes don't matter, the RATIO does
    Zarr.setupStore(dir.toString, big, Map("t" -> 8, "x" -> 8),
      zarrFormat = 3, shards = Map("t" -> 16, "x" -> 16))
    val data = arange(DType.F64, 32, 16)
    val meta = Zarr.readArrayMeta(dir.toString, "v")
    Zarr.writeRegion(dir.toString, "v", meta, Array(0L, 0L), data)
    val shardBytes = Files.size(dir.resolve("v").resolve("c")
      .resolve("0").resolve("0"))
    withServer(dir) { base =>
      val sm = Zarr.openStore(base)
      val m = sm.arrays("v")
      BlobStore.bytesFetched.set(0L)
      val got = Zarr.readRegion(base, "v", m, Array(0L, 0L), Array(8, 8))
      assert(got.sameAs(data.slice(Array(0, 0), Array(8, 8))))
      val fetched = BlobStore.bytesFetched.get()
      assert(fetched < shardBytes,
        s"http partial read fetched $fetched >= whole shard $shardBytes")
    }
  }

  test("transient 500s are retried with backoff") {
    val dir = Files.createTempDirectory("httpflaky")
    Files.write(dir.resolve("blob"), Array[Byte](1, 2, 3, 4, 5))
    withServer(dir, failFirst = 2) { base =>
      assert(HttpStore.read(s"$base/blob").toSeq == Seq[Byte](1, 2, 3, 4, 5))
    }
    // ranged after a failure
    withServer(dir, failFirst = 1) { base =>
      assert(HttpStore.readRange(s"$base/blob", 1L, 3).toSeq ==
        Seq[Byte](2, 3, 4))
    }
  }

  test("absent blobs, sizes, and the read-only/no-listing contract") {
    val dir = Files.createTempDirectory("httpmisc")
    Files.write(dir.resolve("blob"), Array.fill[Byte](100)(7))
    withServer(dir) { base =>
      assert(HttpStore.readIfExists(s"$base/nope").isEmpty)
      assert(!HttpStore.exists(s"$base/nope"))
      assert(HttpStore.exists(s"$base/blob"))
      assert(HttpStore.sizeIfExists(s"$base/blob").contains(100L))
      assert(HttpStore.sizeIfExists(s"$base/nope").isEmpty)
      intercept[java.io.FileNotFoundException] {
        HttpStore.read(s"$base/nope")
      }
      intercept[UnsupportedOperationException] {
        HttpStore.listChildren(base)
      }
    }
    // a static (no-PUT) endpoint rejects writes loudly and immediately
    withServer(dir, allowPut = false) { base =>
      val e = intercept[java.io.IOException] {
        HttpStore.write(s"$base/blob", Array[Byte](1))
      }
      assert(e.getMessage.contains("405"), e.getMessage)
    }
  }

  test("http PUT writes: full zarr store setup + re-read over http://") {
    val dir = Files.createTempDirectory("httpwrite")
    withServer(dir) { base =>
      val url = s"$base/store"
      // setup stages metadata + coords in memory and flushes as PUTs;
      // the consolidation listing is answered by the staged map, never
      // the (unlistable) http target
      Zarr.setupStore(url, template, Map("t" -> 4, "x" -> 8), Some("zlib"))
      val data = arange(DType.F64, 16, 8)
      val sm0 = Zarr.openStore(url) // via the consolidated metadata GET
      Zarr.writeRegion(url, "v", sm0.arrays("v"), Array(0L, 0L), data)
      val sm = Zarr.openStore(url)
      assert(sm.dims == Seq("t" -> 16L, "x" -> 8L))
      val got = Zarr.readRegion(url, "v", sm.arrays("v"),
        Array(0L, 0L), Array(16, 8))
      assert(got.sameAs(data))
      assert(Zarr.readCoord(url, "t", sm.arrays("t")).toLongs.toSeq ==
        (0L until 16L))
    }
    // transient 500s on PUT retry like reads
    val dir2 = Files.createTempDirectory("httpwflaky")
    withServer(dir2, failFirst = 2) { base =>
      HttpStore.write(s"$base/b", Array[Byte](9, 8))
      assert(HttpStore.read(s"$base/b").toSeq == Seq[Byte](9, 8))
    }
  }

  test("202 Accepted PUTs are verified with HEAD before counting as done") {
    // an async gateway that acks 202 AND durably stores: the
    // verify-after-write HEAD confirms the blob and the write succeeds
    val dir = Files.createTempDirectory("http202ok")
    withServer(dir, putStatus = 202) { base =>
      HttpStore.write(s"$base/b", Array[Byte](1, 2, 3))
      assert(HttpStore.read(s"$base/b").toSeq == Seq[Byte](1, 2, 3))
    }
    // a gateway that acks 202 but never materializes the blob: the
    // verify fails, the write retries, and the final error names the
    // unconfirmed verify instead of reporting silent success
    val dir2 = Files.createTempDirectory("http202lost")
    withServer(dir2, putStatus = 202, putStores = false) { base =>
      val e = intercept[java.io.IOException] {
        HttpStore.write(s"$base/gone", Array[Byte](7))
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null && m.contains("verify")),
        chain(e).mkString(" | "))
    }
  }

  test("overwrite onto http refuses a grid change; identical grid re-runs") {
    val dir = Files.createTempDirectory("httpow")
    withServer(dir) { base =>
      val url = s"$base/store"
      Zarr.setupStore(url, template, Map("t" -> 4, "x" -> 8), Some("zlib"))
      // identical grid: an idempotent re-run rewrites every referenced
      // key, so it stays allowed
      Zarr.setupStore(url, template, Map("t" -> 4, "x" -> 8), Some("zlib"))
      // a different chunk grid would strand the old grid's chunk blobs
      // behind fresh metadata — http can't LIST, so they can never be
      // cleared: refuse loudly
      val e = intercept[IllegalArgumentException] {
        Zarr.setupStore(url, template, Map("t" -> 8, "x" -> 8), Some("zlib"))
      }
      assert(e.getMessage.contains("cannot") && e.getMessage.contains("LIST"),
        e.getMessage)
      assert(e.getMessage.contains("chunk grid"), e.getMessage)
      // a shrunk dim is the same hazard
      val small = Template(Seq("t" -> 8L, "x" -> 8L),
        Map("v" -> VarSpec(Seq("t", "x"), DType.F64)),
        coords = Map("t" -> arange(DType.I64, 8)), attrs = Map.empty)
      val e2 = intercept[IllegalArgumentException] {
        Zarr.setupStore(url, small, Map("t" -> 4, "x" -> 8), Some("zlib"))
      }
      assert(e2.getMessage.contains("dim t"), e2.getMessage)
      // a listable target (plain filesystem) keeps the old behavior:
      // grid-changing overwrite allowed
      val localDir = Files.createTempDirectory("httpow-local")
      Zarr.setupStore(localDir.toString, template, Map("t" -> 4, "x" -> 8))
      Zarr.setupStore(localDir.toString, template, Map("t" -> 8, "x" -> 8))
    }
  }

  test("zero-length blobs size as 0 through the 416 answer") {
    val dir = Files.createTempDirectory("httpempty")
    Files.write(dir.resolve("empty"), Array.emptyByteArray)
    Files.write(dir.resolve("blob"), Array.fill[Byte](10)(3))
    withServer(dir) { base =>
      // the 1-byte ranged probe gets 416 for an empty blob; that means
      // EXISTS with size 0, not an error
      assert(HttpStore.sizeIfExists(s"$base/empty").contains(0L))
      assert(HttpStore.read(s"$base/empty").isEmpty)
      // a past-end range on a real blob is a loud error, not a fill
      intercept[java.io.IOException] {
        HttpStore.readRange(s"$base/blob", 100, 5)
      }
    }
  }
}

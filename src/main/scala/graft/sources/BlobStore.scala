package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Minimal byte-blob surface the Zarr IO layer runs on. A Zarr store is
  * a flat namespace of small objects ("<root>/<array>/<chunk-key>"), so
  * this is deliberately an object-store interface, not a filesystem
  * one: whole-blob read/write, existence, and child listing under a
  * root. The local-FS implementation backs every current use;
  * a GCS/S3 implementation slots in through [[BlobStore.forUrl]]'s
  * scheme dispatch without touching the Zarr layer.
  *
  * Implementations must be cheap to obtain on executors (resolved
  * per call via `forUrl`, never shipped in closures).
  */
trait BlobStore {
  def read(url: String): Array[Byte]
  def readIfExists(url: String): Option[Array[Byte]]
  /** Blob size in bytes without fetching the body (object-store HEAD);
    * None when absent. Default falls back to a whole read — override
    * wherever a cheaper stat exists. */
  def sizeIfExists(url: String): Option[Long] =
    readIfExists(url).map(_.length.toLong)
  /** Read `length` bytes starting at `offset` — the object-store ranged
    * GET. The seam that makes sharded-store reads scale: a v3 shard
    * interior is fetched chunk-by-chunk through this, never as a
    * whole-file read. Default falls back to a whole read + slice —
    * override wherever the backend can seek. */
  def readRange(url: String, offset: Long, length: Int): Array[Byte] = {
    require(offset >= 0 && length >= 0, s"bad range $offset+$length for $url")
    val all = read(url)
    require(offset + length <= all.length,
      s"range $offset+$length past end of $url (${all.length} bytes)")
    java.util.Arrays.copyOfRange(all, offset.toInt, offset.toInt + length)
  }
  /** Atomic whole-blob overwrite, creating parents as needed. */
  def write(url: String, bytes: Array[Byte]): Unit
  def exists(url: String): Boolean
  /** Names of immediate child containers (array nodes) under a root. */
  def listChildren(url: String): Seq[String]
  def isContainer(url: String): Boolean
  /** Whether this backend can enumerate keys under a prefix. False for
    * plain http(s): no directory protocol, so stale blobs from an older
    * store layout can never be found and cleared — write paths use this
    * to refuse grid-changing overwrites. */
  def canList: Boolean = true
}

object BlobStore {
  /** Scheme dispatch — the extension point for object stores. Plain
    * paths (and file://) resolve to the local filesystem; mem:// is the
    * in-memory object store ([[MemStore]]); s3:// is the authenticated
    * S3-compatible backend with writes ([[S3Store]]); http(s):// is the
    * ranged-GET backend with PUT writes ([[HttpStore]]). */
  def forUrl(url: String): BlobStore =
    if (url.startsWith("file://")) LocalFsStore
    else if (url.startsWith("mem://")) MemStore
    else if (url.startsWith("s3://") || url.startsWith("gs://")) S3Store
    else if (url.startsWith("http://") || url.startsWith("https://")) HttpStore
    else if (url.contains("://")) throw new IllegalArgumentException(
      s"no BlobStore registered for scheme of $url " +
        s"(mem://, s3://, gs://, http(s)://, and local paths)")
    else LocalFsStore

  /** JVM-wide count of payload bytes fetched by every store's read /
    * readRange — diagnostic instrumentation (specs assert a sharded
    * partial read fetched ≪ the shard file; in local mode driver and
    * executors share it). Not a metrics system: in cluster mode each
    * executor counts only its own fetches. */
  val bytesFetched = new java.util.concurrent.atomic.AtomicLong()

  /** JVM-wide count of readRange CALLS — pins range coalescing (a
    * full-shard read should issue ~2 ranged reads: index + one
    * coalesced run, not one per inner chunk). Same local-mode caveats
    * as [[bytesFetched]]. */
  val rangeFetches = new java.util.concurrent.atomic.AtomicLong()

  /** JVM-wide count of payload bytes PUT by writes that go over a
    * network protocol (currently http(s)). Same local-mode caveats as
    * [[bytesFetched]]. */
  val bytesWritten = new java.util.concurrent.atomic.AtomicLong()

  def stripScheme(url: String): String =
    if (url.startsWith("file://")) url.substring("file://".length) else url
}

/** In-memory object store (`mem://…`) — a FLAT concurrent key→bytes
  * namespace with object-store semantics: whole-blob put/get, no
  * rename, no real directories ("containers" exist only as key
  * prefixes). Exercises the exact surface a GCS/S3 backend would
  * implement, and backs store-layer tests without touching disk. One
  * namespace per JVM: driver and local-mode executors share it, which
  * is precisely the single-process scope such a test store is for. */
object MemStore extends BlobStore {
  private val blobs =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private def dirPrefix(url: String) = url.stripSuffix("/") + "/"

  override def read(url: String): Array[Byte] =
    readIfExists(url).getOrElse(
      throw new java.io.FileNotFoundException(s"no blob at $url"))

  override def readIfExists(url: String): Option[Array[Byte]] = {
    // cloned for symmetry with write's defensive copy — a caller
    // mutating the returned array (in-place decode, read-modify-write)
    // must not corrupt the store under concurrent readers
    val got = Option(blobs.get(url)).map(_.clone())
    got.foreach(b => BlobStore.bytesFetched.addAndGet(b.length.toLong))
    got
  }

  override def sizeIfExists(url: String): Option[Long] =
    Option(blobs.get(url)).map(_.length.toLong)

  override def readRange(url: String, offset: Long, length: Int): Array[Byte] = {
    val all = blobs.get(url)
    if (all == null) throw new java.io.FileNotFoundException(s"no blob at $url")
    require(offset >= 0 && length >= 0 && offset + length <= all.length,
      s"range $offset+$length past end of $url (${all.length} bytes)")
    BlobStore.bytesFetched.addAndGet(length.toLong)
    BlobStore.rangeFetches.incrementAndGet()
    java.util.Arrays.copyOfRange(all, offset.toInt, offset.toInt + length)
  }

  override def write(url: String, bytes: Array[Byte]): Unit =
    blobs.put(url, bytes.clone()) // defensive: callers may reuse buffers

  override def exists(url: String): Boolean =
    blobs.containsKey(url) || isContainer(url)

  override def listChildren(url: String): Seq[String] = {
    val prefix = dirPrefix(url)
    import scala.jdk.CollectionConverters._
    blobs.keySet().asScala.iterator
      .filter(_.startsWith(prefix))
      .map(_.substring(prefix.length))
      .filter(_.contains('/')) // containers only: a deeper key exists
      .map(_.takeWhile(_ != '/'))
      .toSeq.distinct.sorted
  }

  override def isContainer(url: String): Boolean = {
    val prefix = dirPrefix(url)
    import scala.jdk.CollectionConverters._
    blobs.keySet().asScala.exists(_.startsWith(prefix))
  }

  /** Test hook: drop every blob under `url` (or everything). */
  def clear(url: String = "mem://"): Unit = {
    import scala.jdk.CollectionConverters._
    val prefix = url.stripSuffix("/")
    blobs.keySet().asScala.filter(k =>
      k == prefix || k.startsWith(prefix + "/")).foreach(blobs.remove)
  }
}

/** java.nio-backed implementation for local (or locally-mounted)
  * filesystems. */
object LocalFsStore extends BlobStore {
  private def p(url: String) = Paths.get(BlobStore.stripScheme(url))

  override def read(url: String): Array[Byte] = {
    val b = Files.readAllBytes(p(url))
    BlobStore.bytesFetched.addAndGet(b.length.toLong)
    b
  }

  override def readIfExists(url: String): Option[Array[Byte]] = {
    val f = p(url)
    if (Files.exists(f) && !Files.isDirectory(f)) {
      val b = Files.readAllBytes(f)
      BlobStore.bytesFetched.addAndGet(b.length.toLong)
      Some(b)
    } else None
  }

  override def sizeIfExists(url: String): Option[Long] = {
    val f = p(url)
    if (Files.exists(f) && !Files.isDirectory(f)) Some(Files.size(f)) else None
  }

  override def readRange(url: String, offset: Long, length: Int): Array[Byte] = {
    require(offset >= 0 && length >= 0, s"bad range $offset+$length for $url")
    val ch = java.nio.channels.FileChannel.open(p(url),
      StandardOpenOption.READ)
    try {
      val bb = java.nio.ByteBuffer.allocate(length)
      var pos = offset
      while (bb.hasRemaining) {
        val n = ch.read(bb, pos)
        require(n >= 0, s"range $offset+$length past end of $url")
        pos += n
      }
      BlobStore.bytesFetched.addAndGet(length.toLong)
      BlobStore.rangeFetches.incrementAndGet()
      bb.array()
    } finally ch.close()
  }

  /** Atomic whole-blob write: stage to a same-directory temp file and
    * rename into place. Direct truncate+write would let CONCURRENT
    * duplicate attempts of the same chunk (speculative execution, a
    * zombie task racing its retry) interleave into a torn file — the
    * idempotent-retry contract needs last-writer-wins of a COMPLETE
    * payload, which object stores give per-PUT and the local FS only
    * gives via rename (the same atomicity note the reference leans on,
    * zarr.py:248-251). Unique temp names keep concurrent stagers from
    * clobbering each other before their renames. */
  override def write(url: String, bytes: Array[Byte]): Unit = {
    val f = p(url)
    Option(f.getParent).foreach(Files.createDirectories(_))
    val tmp = f.resolveSibling(
      f.getFileName.toString + ".tmp." +
        java.lang.Long.toHexString(Thread.currentThread.getId) + "." +
        java.lang.Long.toHexString(System.nanoTime()))
    // Any failure after the temp exists (disk full mid-write, an
    // interrupt, a rename error) must not orphan the .tmp — orphans
    // accumulate in the store directory where listing-based scans can
    // observe them.
    try {
      Files.write(tmp, bytes, StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE)
      try Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          // exotic filesystems: fall back to a plain replace (still a
          // rename on POSIX; at worst the pre-fix behavior)
          Files.move(tmp, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } catch {
      case e: Throwable =>
        try Files.deleteIfExists(tmp) catch { case _: Throwable => () }
        throw e
    }
  }

  override def exists(url: String): Boolean = Files.exists(p(url))

  override def listChildren(url: String): Seq[String] = {
    val s = Files.list(p(url))
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    finally s.close() // Files.list holds the directory handle until closed
  }

  override def isContainer(url: String): Boolean = Files.isDirectory(p(url))
}

/** HTTP(S) object store — the reference reads http-served zarr
  * through fsspec's http filesystem (zarr.py:374-386); this is the
  * same capability on `java.net.http.HttpClient`, plus fsspec's write
  * half (PUT) for endpoints that accept it. Whole-blob reads are
  * plain GETs, [[readRange]] is a `Range: bytes=` GET (the request
  * shape a 100 TB sharded layout depends on — one inner chunk per GET,
  * never the whole shard), sizes come from HEAD. Transient failures
  * (IO errors, 5xx, 429) retry with exponential backoff. Listing is
  * unsupported — plain HTTP has no directory protocol — so opening a
  * store over http requires consolidated metadata (.zmetadata / v3
  * root zarr.json), which [[Zarr.openStore]] prefers anyway (and
  * which setup writes via [[StagedWrites]], whose staged map answers
  * the consolidation listing without touching the target). */
object HttpStore extends BlobStore {
  private val maxAttempts = 4
  private val baseBackoffMs = 100L

  // one shared client: connection pooling across chunk GETs
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(20))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  private def request(url: String, head: Boolean = false,
                      range: Option[(Long, Long)] = None)
      : java.net.http.HttpResponse[Array[Byte]] = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMinutes(2))
    if (head) b.method("HEAD",
      java.net.http.HttpRequest.BodyPublishers.noBody())
    range.foreach { case (lo, hi) => b.header("Range", s"bytes=$lo-$hi") }
    var attempt = 0
    var last: Either[Throwable, java.net.http.HttpResponse[Array[Byte]]] = null
    while (attempt < maxAttempts) {
      if (attempt > 0) Thread.sleep(baseBackoffMs << (attempt - 1))
      try {
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() >= 500 || resp.statusCode() == 429)
          last = Left(new java.io.IOException(
            s"HTTP ${resp.statusCode()} for $url"))
        else return resp
      } catch {
        case e: java.io.IOException => last = Left(e)
        case e: InterruptedException => throw e
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"$url failed after $maxAttempts attempts", last.swap.toOption.get)
  }

  private def notFound(url: String) =
    throw new java.io.FileNotFoundException(s"no blob at $url")

  override def read(url: String): Array[Byte] = {
    val resp = request(url)
    if (resp.statusCode() == 404) notFound(url)
    require(resp.statusCode() == 200, s"HTTP ${resp.statusCode()} for $url")
    BlobStore.bytesFetched.addAndGet(resp.body().length.toLong)
    resp.body()
  }

  override def readIfExists(url: String): Option[Array[Byte]] = {
    val resp = request(url)
    if (resp.statusCode() == 404) None
    else {
      require(resp.statusCode() == 200, s"HTTP ${resp.statusCode()} for $url")
      BlobStore.bytesFetched.addAndGet(resp.body().length.toLong)
      Some(resp.body())
    }
  }

  /** Size via a 1-byte ranged GET, reading the total out of
    * `Content-Range: bytes 0-0/TOTAL` — HEAD Content-Length is
    * unreliable across servers (Java's own HttpServer drops it), the
    * Content-Range total is not; fsspec's http filesystem does the
    * same. A server without range support answers 200 with the whole
    * body, whose length is the size. */
  override def sizeIfExists(url: String): Option[Long] = {
    val resp = request(url, range = Some((0L, 0L)))
    resp.statusCode() match {
      case 404 => None
      case 206 =>
        val cr = resp.headers().firstValue("Content-Range")
        require(cr.isPresent, s"206 without Content-Range for $url")
        val total = cr.get().substring(cr.get().indexOf('/') + 1)
        require(total != "*", s"Content-Range total unknown for $url")
        Some(total.toLong)
      case 200 => Some(resp.body().length.toLong)
      case 416 =>
        // a zero-length blob satisfies no range: most servers
        // (including Java's HttpServer) answer 416 here, ideally with
        // the total in `Content-Range: bytes */TOTAL`; without it, a
        // plain GET settles existence and size
        val cr = resp.headers().firstValue("Content-Range")
        if (cr.isPresent && cr.get().contains("/") &&
            !cr.get().endsWith("/*"))
          Some(cr.get().substring(cr.get().indexOf('/') + 1).toLong)
        else readIfExists(url).map(_.length.toLong)
      case s => throw new java.io.IOException(s"HTTP $s sizing $url")
    }
  }

  override def readRange(url: String, offset: Long, length: Int): Array[Byte] = {
    require(offset >= 0 && length >= 0, s"bad range $offset+$length for $url")
    if (length == 0) return Array.emptyByteArray
    val resp = request(url, range = Some((offset, offset + length - 1)))
    if (resp.statusCode() == 404) notFound(url)
    if (resp.statusCode() == 416) throw new java.io.IOException(
      s"range $offset+$length not satisfiable for $url " +
        s"(${resp.headers().firstValue("Content-Range").orElse("no Content-Range")})")
    val body = resp.statusCode() match {
      case 206 => resp.body()
      case 200 => // server ignored Range: fall back to slicing the body
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

  /** PUT the blob — the write half of fsspec's http filesystem: the
    * target is any endpoint accepting `PUT <url>` (WebDAV, nginx
    * dav_methods, a signed-URL proxy). Any 2xx succeeds (202 Accepted
    * from async gateways and WebDAV proxies included); transient
    * failures (IO errors, 5xx, 429) retry with the read path's
    * backoff; anything else fails loudly — a server without PUT
    * answers 405 and surfaces immediately, not after retries. Note
    * plain HTTP still cannot LIST, so overwriting an http store does
    * not clear stale chunks from an older grid (same caveat as any
    * non-listable target); point new grids at fresh paths. */
  override def write(url: String, bytes: Array[Byte]): Unit = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMinutes(2))
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      if (attempt > 0) Thread.sleep(baseBackoffMs << (attempt - 1))
      val resp =
        try Some(client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray()))
        catch {
          case e: java.io.IOException => last = e; None
          case e: InterruptedException => throw e
        }
      resp.foreach { r =>
        r.statusCode() match {
          // 202 Accepted means an async gateway acknowledged WITHOUT
          // durably storing yet — verify with HEAD before declaring
          // success (size must match when the endpoint reports one);
          // a failed verify is retryable like a 5xx. Durability past
          // the verified HEAD is necessarily delegated to the gateway.
          case 202 =>
            // A genuinely asynchronous gateway may materialize the blob
            // a beat after acknowledging; re-HEAD with a short bounded
            // backoff before declaring the verify failed, so
            // eventual-consistency within a few hundred ms still
            // succeeds without burning a full PUT retry.
            def headOnce(): Boolean =
              try {
                val head = request(url, head = true)
                head.statusCode() == 200 && {
                  val len = head.headers.firstValue("Content-Length")
                  !len.isPresent || len.get.toLong == bytes.length.toLong
                }
              } catch { case _: java.io.IOException => false }
            var verifies = 0
            var ok = headOnce()
            while (!ok && verifies < 2) {
              Thread.sleep(baseBackoffMs << verifies)
              verifies += 1
              ok = headOnce()
            }
            if (ok) {
              BlobStore.bytesWritten.addAndGet(bytes.length.toLong)
              return
            } else last = new java.io.IOException(
              s"HTTP 202 writing $url but verify-after-write HEAD " +
                "did not confirm the blob")
          case s if s >= 200 && s < 300 =>
            BlobStore.bytesWritten.addAndGet(bytes.length.toLong)
            return
          case s if s >= 500 || s == 429 =>
            last = new java.io.IOException(s"HTTP $s writing $url")
          case s => throw new java.io.IOException(
            s"HTTP $s writing $url (the endpoint must accept PUT)")
        }
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"PUT $url failed after $maxAttempts attempts", last)
  }

  override def exists(url: String): Boolean = {
    val resp = request(url, head = true)
    resp.statusCode() == 200
  }

  override def listChildren(url: String): Seq[String] =
    throw new UnsupportedOperationException(
      "http(s) BlobStore cannot list: plain HTTP has no directory " +
        "protocol. Open http-served stores through consolidated " +
        "metadata (.zmetadata / v3 root zarr.json).")

  override def isContainer(url: String): Boolean = false

  override def canList: Boolean = false
}

/** One already-fetched blob served through the BlobStore surface — the
  * dense-shard-read view: [[Zarr]]'s adaptive shard reader fetches a
  * mostly-needed shard file whole (one get), then runs the same
  * index-walk + inner-chunk decode code against this in-memory view.
  * Deliberately does NOT touch [[BlobStore.bytesFetched]] /
  * [[BlobStore.rangeFetches]]: the single real fetch was already
  * counted by whichever store produced `bytes`. */
private[sources] final class ShardBytesView(url: String, bytes: Array[Byte])
    extends BlobStore {
  private def check(u: String): Unit =
    require(u == url, s"ShardBytesView of $url asked for $u")
  override def read(u: String): Array[Byte] = { check(u); bytes }
  override def readIfExists(u: String): Option[Array[Byte]] = {
    check(u); Some(bytes)
  }
  override def sizeIfExists(u: String): Option[Long] = {
    check(u); Some(bytes.length.toLong)
  }
  override def readRange(u: String, offset: Long, length: Int): Array[Byte] = {
    check(u)
    require(offset >= 0 && length >= 0 && offset + length <= bytes.length,
      s"range $offset+$length past end of $u (${bytes.length} bytes)")
    java.util.Arrays.copyOfRange(bytes, offset.toInt, offset.toInt + length)
  }
  override def write(u: String, b: Array[Byte]): Unit =
    throw new UnsupportedOperationException("ShardBytesView is read-only")
  override def exists(u: String): Boolean = u == url
  override def listChildren(u: String): Seq[String] = Seq.empty
  override def isContainer(u: String): Boolean = false
}

/** Write-buffering wrapper — the `stage_locally` analogue
  * (zarr.py:463-513): driver-side store setup writes its many tiny
  * metadata blobs (and eager coordinate chunks) here, then [[flush]]
  * pushes them to the target in one batch. On an object store that
  * batch is where parallel upload / retry policy lives; reads fall
  * through to staged content first so setup logic never notices the
  * indirection. */
final class StagedWrites(target: BlobStore) extends BlobStore {
  private val staged =
    scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()

  override def read(url: String): Array[Byte] =
    staged.getOrElse(url, target.read(url))
  override def readIfExists(url: String): Option[Array[Byte]] =
    staged.get(url).orElse(target.readIfExists(url))
  override def sizeIfExists(url: String): Option[Long] =
    staged.get(url).map(_.length.toLong).orElse(target.sizeIfExists(url))
  override def readRange(url: String, offset: Long, length: Int): Array[Byte] =
    staged.get(url) match {
      case Some(all) =>
        require(offset >= 0 && length >= 0 && offset + length <= all.length,
          s"range $offset+$length past end of $url (${all.length} bytes)")
        java.util.Arrays.copyOfRange(all, offset.toInt, offset.toInt + length)
      case None => target.readRange(url, offset, length)
    }
  override def write(url: String, bytes: Array[Byte]): Unit =
    staged(url) = bytes
  override def exists(url: String): Boolean =
    staged.contains(url) || target.exists(url)
  override def listChildren(url: String): Seq[String] = {
    val prefix = url.stripSuffix("/") + "/"
    val fromStaged = staged.keys.filter(_.startsWith(prefix))
      .map(_.substring(prefix.length).takeWhile(_ != '/')).toSeq.distinct
    val fromTarget =
      if (target.isContainer(url)) target.listChildren(url) else Seq.empty
    (fromTarget ++ fromStaged).distinct
  }
  override def isContainer(url: String): Boolean =
    target.isContainer(url) || staged.keys.exists(
      _.startsWith(url.stripSuffix("/") + "/"))

  def pendingCount: Int = staged.size

  /** Push all staged blobs to the target through a bounded thread pool
    * — the reference's 128-thread metadata copy (zarr.py:374-386) made
    * policy: setup writes dozens-to-thousands of tiny blobs, and over a
    * high-latency object store a serial loop pays one round trip each.
    * Blobs are independent objects, so completion order doesn't matter;
    * the staged map is only cleared after EVERY write succeeded (a
    * failed flush keeps the batch intact and rethrows the first
    * error). Pool size via `graft.stagedFlushThreads` (default 16,
    * clamped to the batch size; 1 degenerates to the serial loop). */
  def flush(): Unit = {
    if (staged.isEmpty) return
    val threads = math.max(1, math.min(
      sys.props.get("graft.stagedFlushThreads").map(_.toInt).getOrElse(16),
      staged.size))
    if (threads == 1) staged.foreach { case (k, v) => target.write(k, v) }
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val futures = staged.toSeq.map { case (k, v) =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = target.write(k, v)
          })
        }
        futures.foreach(_.get()) // propagates the first failure
      } catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      } finally pool.shutdown()
    }
    staged.clear()
  }
}

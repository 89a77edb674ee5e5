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
  /** Atomic whole-blob overwrite, creating parents as needed. */
  def write(url: String, bytes: Array[Byte]): Unit
  def exists(url: String): Boolean
  /** Names of immediate child containers (array nodes) under a root. */
  def listChildren(url: String): Seq[String]
  def isContainer(url: String): Boolean
}

object BlobStore {
  /** Scheme dispatch — the extension point for object stores. Plain
    * paths (and file://) resolve to the local filesystem; mem:// is the
    * in-memory object store ([[MemStore]]). */
  def forUrl(url: String): BlobStore =
    if (url.startsWith("file://")) LocalFsStore
    else if (url.startsWith("mem://")) MemStore
    else if (url.contains("://")) throw new IllegalArgumentException(
      s"no BlobStore registered for scheme of $url (mem:// and local paths)")
    else LocalFsStore

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

  override def readIfExists(url: String): Option[Array[Byte]] =
    Option(blobs.get(url))

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

  override def read(url: String): Array[Byte] = Files.readAllBytes(p(url))

  override def readIfExists(url: String): Option[Array[Byte]] = {
    val f = p(url)
    if (Files.exists(f) && !Files.isDirectory(f)) Some(Files.readAllBytes(f))
    else None
  }

  override def write(url: String, bytes: Array[Byte]): Unit = {
    val f = p(url)
    Option(f.getParent).foreach(Files.createDirectories(_))
    Files.write(f, bytes, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
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

  /** Push all staged blobs to the target (insertion order). */
  def flush(): Unit = {
    staged.foreach { case (k, v) => target.write(k, v) }
    staged.clear()
  }
}

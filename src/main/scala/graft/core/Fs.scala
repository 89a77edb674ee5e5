package graft.core

/** Tiny filesystem helpers shared by the sinks, the streaming gates,
  * and the scratch-store queries. */
object Fs {

  /** Delete a directory tree (or single file) if it exists, depth-first.
    * `Files.walk` returns a stream that holds directory handles open —
    * the paths are collected and the stream CLOSED before any delete
    * runs (an unclosed walk leaks fds until GC and can hold the very
    * directories being removed). No-op on a missing path. */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(root)) return
    val walk = java.nio.file.Files.walk(root)
    val paths =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toVector
      } finally walk.close()
    paths.reverse.foreach { p =>
      java.nio.file.Files.deleteIfExists(p); ()
    }
  }

  def deleteRecursively(path: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(path))
}

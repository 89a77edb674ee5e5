package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class BlobStoreSpec extends AnyFunSuite {

  test("scheme dispatch: local, file://, mem://, s3://, gs:// resolve; others fail") {
    assert(BlobStore.forUrl("/tmp/x") eq LocalFsStore)
    assert(BlobStore.forUrl("file:///tmp/x") eq LocalFsStore)
    assert(BlobStore.forUrl("mem://bucket/x") eq MemStore)
    assert(BlobStore.forUrl("s3://bucket/x") eq S3Store)
    assert(BlobStore.forUrl("gs://bucket/x") eq S3Store)
    val e = intercept[IllegalArgumentException](BlobStore.forUrl("abfs://c/x"))
    assert(e.getMessage.contains("no BlobStore registered"))
  }

  test("mem store: flat object semantics — put/get, prefix containers, no rename") {
    val root = "mem://bucket/memsem"
    MemStore.clear(root)
    MemStore.write(s"$root/a/.zarray", Array[Byte](1))
    MemStore.write(s"$root/a/0.0", Array[Byte](2, 3))
    MemStore.write(s"$root/.zgroup", Array[Byte](4))
    assert(MemStore.read(s"$root/a/0.0").toSeq == Seq[Byte](2, 3))
    assert(MemStore.readIfExists(s"$root/missing").isEmpty)
    intercept[java.io.FileNotFoundException](MemStore.read(s"$root/missing"))
    // containers are key prefixes, nothing more: "a" lists as a child
    // (a deeper key exists); the blob ".zgroup" does not
    assert(MemStore.listChildren(root) == Seq("a"))
    assert(MemStore.isContainer(s"$root/a") && !MemStore.isContainer(s"$root/.zgroup"))
    assert(MemStore.exists(s"$root/a") && MemStore.exists(s"$root/.zgroup"))
    // writes are whole-blob overwrites of an immutable copy
    val buf = Array[Byte](7)
    MemStore.write(s"$root/a/0.0", buf)
    buf(0) = 9
    assert(MemStore.read(s"$root/a/0.0").toSeq == Seq[Byte](7))
    MemStore.clear(root)
    assert(!MemStore.isContainer(root))
  }

  test("local store: write creates parents, read/exists/list roundtrip") {
    val root = Files.createTempDirectory("blob").toString
    LocalFsStore.write(s"$root/a/chunk.0", Array[Byte](1, 2, 3))
    assert(LocalFsStore.exists(s"$root/a/chunk.0"))
    assert(LocalFsStore.read(s"$root/a/chunk.0").toSeq == Seq[Byte](1, 2, 3))
    assert(LocalFsStore.readIfExists(s"$root/missing").isEmpty)
    assert(LocalFsStore.listChildren(root) == Seq("a"))
  }

  test("local store: concurrent duplicate writers never expose a torn blob") {
    // the speculative-execution / zombie-vs-retry shape: two attempts
    // write the SAME key with complete (here: distinct) payloads
    // concurrently while readers poll. Atomic temp+rename means every
    // observed state is ONE complete payload — a truncate+write path
    // would interleave. 2 MB payloads x 40 rounds x 4 writer threads.
    val root = Files.createTempDirectory("blobrace").toString
    val key = s"$root/store/chunk.0"
    val pa = Array.fill[Byte](2 << 20)('A')
    val pb = Array.fill[Byte](2 << 20)('B')
    LocalFsStore.write(key, pa)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val writers = (0 until 4).map { i =>
      new Thread(() => {
        var r = 0
        while (r < 40 && !stop.get) {
          LocalFsStore.write(key, if ((r + i) % 2 == 0) pa else pb)
          r += 1
        }
      })
    }
    val reader = new Thread(() => {
      while (!stop.get) {
        val got = LocalFsStore.read(key)
        if (got.length != pa.length)
          torn.compareAndSet(null, s"short read: ${got.length}")
        else {
          val first = got(0)
          var j = 1
          while (j < got.length) {
            if (got(j) != first) {
              torn.compareAndSet(null, s"mixed payload at byte $j")
              j = got.length
            } else j += 1
          }
        }
      }
    })
    reader.start(); writers.foreach(_.start())
    writers.foreach(_.join(30000))
    stop.set(true); reader.join(5000)
    assert(torn.get == null, s"torn blob observed: ${torn.get}")
    // no temp files linger after clean completion
    val leftovers = Files.list(java.nio.file.Paths.get(root, "store"))
    try assert(!leftovers.toArray.map(_.toString).exists(_.contains(".tmp.")),
      "orphaned temp files after clean writes")
    finally leftovers.close()
  }

  test("StagedWrites buffers until flush, reads through, lists union") {
    val root = Files.createTempDirectory("staged").toString
    LocalFsStore.write(s"$root/pre/.zarray", Array[Byte](9))
    val staged = new StagedWrites(LocalFsStore)
    staged.write(s"$root/v/.zarray", Array[Byte](1))
    staged.write(s"$root/.zgroup", Array[Byte](2))
    // visible through the stager, not yet on the target
    assert(staged.exists(s"$root/v/.zarray"))
    assert(!LocalFsStore.exists(s"$root/v/.zarray"))
    assert(staged.read(s"$root/v/.zarray").toSeq == Seq[Byte](1))
    assert(staged.read(s"$root/pre/.zarray").toSeq == Seq[Byte](9)) // read-through
    assert(staged.listChildren(root).toSet.contains("v"))
    assert(staged.pendingCount == 2)
    staged.flush()
    assert(staged.pendingCount == 0)
    assert(LocalFsStore.read(s"$root/v/.zarray").toSeq == Seq[Byte](1))
    assert(LocalFsStore.read(s"$root/.zgroup").toSeq == Seq[Byte](2))
  }

  test("StagedWrites flush overlaps writes through the bounded pool") {
    // A latency-injected target: each write sleeps 50 ms. 24 staged
    // blobs serially = 1.2 s; the 16-thread pool must land them in two
    // waves (~100 ms). The 600 ms bound proves overlap with plenty of
    // scheduling slack while a serial flush cannot pass it.
    val written = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    object SlowStore extends BlobStore {
      override def read(url: String): Array[Byte] = written.get(url)
      override def readIfExists(url: String): Option[Array[Byte]] =
        Option(written.get(url))
      override def write(url: String, bytes: Array[Byte]): Unit = {
        Thread.sleep(50)
        written.put(url, bytes)
      }
      override def exists(url: String): Boolean = written.containsKey(url)
      override def listChildren(url: String): Seq[String] = Nil
      override def isContainer(url: String): Boolean = false
    }
    val staged = new StagedWrites(SlowStore)
    (1 to 24).foreach(i => staged.write(s"mem://slow/b$i", Array(i.toByte)))
    val t0 = System.nanoTime()
    staged.flush()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 600, s"flush took $elapsedMs ms — writes did not overlap")
    assert(staged.pendingCount == 0)
    assert(written.size == 24)
    (1 to 24).foreach(i =>
      assert(written.get(s"mem://slow/b$i").toSeq == Seq(i.toByte)))
  }

  test("StagedWrites flush failure keeps the batch and rethrows") {
    object FailStore extends BlobStore {
      override def read(url: String): Array[Byte] = throw new java.io.IOException
      override def readIfExists(url: String): Option[Array[Byte]] = None
      override def write(url: String, bytes: Array[Byte]): Unit =
        throw new java.io.IOException(s"refused $url")
      override def exists(url: String): Boolean = false
      override def listChildren(url: String): Seq[String] = Nil
      override def isContainer(url: String): Boolean = false
    }
    val staged = new StagedWrites(FailStore)
    staged.write("mem://f/a", Array[Byte](1))
    staged.write("mem://f/b", Array[Byte](2))
    val e = intercept[java.io.IOException](staged.flush())
    assert(e.getMessage.startsWith("refused"))
    assert(staged.pendingCount == 2, "a failed flush must keep the batch")
  }

  test("setupStore pushes all metadata in one staged batch (zarr.py:463-513)") {
    import graft.Fixtures.arange
    import graft.core.{Template, VarSpec}
    import graft.ndarray.DType
    val path = Files.createTempDirectory("stagedsetup").toString + "/store"
    val template = Template(
      Seq("t" -> 6L), Map("v" -> VarSpec(Seq("t"), DType.F64)),
      coords = Map("t" -> arange(DType.I64, 6)), attrs = Map("k" -> "v"))
    Zarr.setupStore(path, template, Map("t" -> 3))
    // everything a reader needs landed atomically at flush
    val store = Zarr.openStore(path)
    assert(store.dataVars.keySet == Set("v"))
    assert(Zarr.readCoord(path, "t").get.toLongs.toSeq == (0L until 6L))
    assert(LocalFsStore.exists(s"$path/.zmetadata"))
  }
}

package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.Fixtures.arange
import graft.core.{Template, VarSpec}
import graft.ndarray.DType

/** The s3:// BlobStore against an in-process S3-compatible mock that
  * VERIFIES SigV4 on every request (recomputing the signature from the
  * request pieces and the known secret — a wrong or missing signature
  * is a 403, so every passing test proves authenticated requests).
  * Covers object GET/PUT, ranged GET, ListObjectsV2, multipart upload,
  * retry on 500, and a full zarr v2 + v3 (sharded, partial-read)
  * roundtrip through the store seam. */
class S3StoreSpec extends AnyFunSuite {

  private val ACCESS = "GRAFTTESTACCESSKEY"
  private val SECRET = "graft-test-secret-key/with+chars"
  private val REGION = "us-east-1"

  /** Point the s3:// scheme at a fresh mock for the test body. */
  private def withMock[A](failFirst: Int = 0)(body: S3TestMock => A): A = {
    val mock = new S3TestMock(failFirst, ACCESS, SECRET)
    val saved = Seq("graft.s3.endpoint", "graft.s3.accessKey",
      "graft.s3.secretKey", "graft.s3.region").map(k => k -> sys.props.get(k))
    sys.props("graft.s3.endpoint") = s"http://127.0.0.1:${mock.port}"
    sys.props("graft.s3.accessKey") = ACCESS
    sys.props("graft.s3.secretKey") = SECRET
    sys.props("graft.s3.region") = REGION
    try body(mock)
    finally {
      mock.stop()
      saved.foreach { case (k, v) =>
        v match { case Some(x) => sys.props(k) = x; case None => sys.props -= k }
      }
      assert(mock.authFailures.get() == 0,
        s"${mock.authFailures.get()} requests failed SigV4 verification")
    }
  }

  test("SigV4 reproduces the AWS documentation example signature") {
    // Public worked example from the AWS General Reference (Signature
    // Version 4 signing process, "Calculate the signature"): GET
    // iam.amazonaws.com ListUsers with known credentials and date.
    val headers = SigV4.sign(
      method = "GET", host = "iam.amazonaws.com", path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      payloadHash = SigV4.emptyPayloadHash,
      amzDate = "20150830T123600Z", region = "us-east-1", service = "iam",
      accessKey = "AKIDEXAMPLE",
      secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      sessionToken = None,
      extraSignedHeaders = Map(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      signPayloadHeader = false)
    assert(headers("Authorization") ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("object put/get/range/size/list against the signed mock") {
    withMock() { mock =>
      val base = "s3://bucket/store"
      val store = BlobStore.forUrl(base)
      assert(store eq S3Store)
      val payload = Array.tabulate[Byte](1000)(_.toByte)
      store.write(s"$base/a/chunk0", payload)
      store.write(s"$base/b/chunk1", Array[Byte](1, 2, 3))
      store.write(s"$base/empty", Array.emptyByteArray)
      assert(store.read(s"$base/a/chunk0").toSeq == payload.toSeq)
      assert(store.readIfExists(s"$base/missing").isEmpty)
      assert(store.readRange(s"$base/a/chunk0", 100, 10).toSeq ==
        payload.slice(100, 110).toSeq)
      assert(store.sizeIfExists(s"$base/a/chunk0").contains(1000L))
      assert(store.sizeIfExists(s"$base/empty").contains(0L),
        "zero-length blob must size as 0 through the 416 path")
      assert(store.sizeIfExists(s"$base/missing").isEmpty)
      assert(store.exists(s"$base/a/chunk0"))
      assert(!store.exists(s"$base/missing"))
      assert(store.listChildren(base) == Seq("a", "b"))
      assert(store.isContainer(base))
      assert(!store.isContainer(s"$base/nothing"))
    }
  }

  test("transient 500s are retried with the signature refreshed") {
    withMock(failFirst = 2) { _ =>
      val store = BlobStore.forUrl("s3://bucket/x")
      store.write("s3://bucket/x", Array[Byte](9, 9))
      assert(store.read("s3://bucket/x").toSeq == Seq[Byte](9, 9))
    }
  }

  test("multipart upload assembles parts in order") {
    withMock() { mock =>
      val saved = sys.props.get("graft.s3.multipartBytes")
      sys.props("graft.s3.multipartBytes") = "1024" // force multipart
      try {
        val blob = Array.tabulate[Byte](3000)(i => (i % 251).toByte)
        S3Store.write("s3://bucket/big", blob)
        assert(mock.blobs.get("bucket/big").toSeq == blob.toSeq)
        // and reads come back whole through the plain GET path
        assert(S3Store.read("s3://bucket/big").toSeq == blob.toSeq)
      } finally saved match {
        case Some(v) => sys.props("graft.s3.multipartBytes") = v
        case None => sys.props -= "graft.s3.multipartBytes"
      }
    }
  }

  test("gs:// rides the S3 store through the GCS interop conventions") {
    // same mock, gs config: endpoint override + HMAC keys; requests
    // sign with scope auto/storage, which the verifier checks from the
    // request's own credential scope
    val mock = new S3TestMock(0, ACCESS, SECRET)
    val saved = Seq("graft.gs.endpoint", "graft.gs.accessKey",
      "graft.gs.secretKey").map(k => k -> sys.props.get(k))
    sys.props("graft.gs.endpoint") = s"http://127.0.0.1:${mock.port}"
    sys.props("graft.gs.accessKey") = ACCESS
    sys.props("graft.gs.secretKey") = SECRET
    try {
      val store = BlobStore.forUrl("gs://bucket/obj")
      assert(store eq S3Store)
      store.write("gs://bucket/obj", Array[Byte](5, 6, 7))
      assert(store.read("gs://bucket/obj").toSeq == Seq[Byte](5, 6, 7))
      assert(store.readRange("gs://bucket/obj", 1, 2).toSeq == Seq[Byte](6, 7))
      store.write("gs://bucket/dir/a", Array[Byte](1))
      assert(store.listChildren("gs://bucket") == Seq("dir"))
    } finally {
      mock.stop()
      saved.foreach { case (k, v) =>
        v match { case Some(x) => sys.props(k) = x; case None => sys.props -= k }
      }
      assert(mock.authFailures.get() == 0,
        s"${mock.authFailures.get()} gs requests failed SigV4 verification")
    }
  }

  private val template = Template(
    Seq("t" -> 16L, "x" -> 8L),
    Map("v" -> VarSpec(Seq("t", "x"), DType.F64)),
    coords = Map("t" -> arange(DType.I64, 16)), attrs = Map.empty)

  test("zarr v2 roundtrip over s3://") {
    withMock() { _ =>
      val root = "s3://bucket/v2store"
      Zarr.setupStore(root, template, Map("t" -> 4, "x" -> 8), Some("zlib"))
      val data = arange(DType.F64, 16, 8)
      val meta = Zarr.readArrayMeta(root, "v")
      Zarr.writeRegion(root, "v", meta, Array(0L, 0L), data)
      val sm = Zarr.openStore(root)
      assert(sm.dims == Seq("t" -> 16L, "x" -> 8L))
      val got = Zarr.readRegion(root, "v", sm.arrays("v"), Array(3L, 2L), Array(6, 4))
      assert(got.sameAs(data.slice(Array(3, 2), Array(6, 4))))
    }
  }

  test("zarr v3 sharded roundtrip over s3:// reads shards partially") {
    withMock() { _ =>
      val root = "s3://bucket/v3store"
      // inner chunks 4x8 packed into one 16x8 shard (4 inner chunks)
      Zarr.setupStore(root, template, Map("t" -> 4, "x" -> 8), Some("gzip"),
        zarrFormat = 3, shards = Map("t" -> 16, "x" -> 8))
      val data = arange(DType.F64, 16, 8)
      val meta = Zarr.readArrayMeta(root, "v")
      Zarr.writeRegion(root, "v", meta, Array(0L, 0L), data)
      val sm = Zarr.openStore(root)
      val m = sm.arrays("v")
      val before = (BlobStore.bytesFetched.get(), BlobStore.rangeFetches.get())
      // one inner chunk (4 x 8) out of a 16 x 8 shard region
      val got = Zarr.readRegion(root, "v", m, Array(4L, 0L), Array(4, 8))
      assert(got.sameAs(data.slice(Array(4, 0), Array(4, 8))))
      val rangedBytes = BlobStore.bytesFetched.get() - before._1
      val rangedCalls = BlobStore.rangeFetches.get() - before._2
      assert(rangedCalls >= 1, "sharded read over s3 must use ranged GETs")
      val shardBytes = S3Store.sizeIfExists(s"$root/v/c/0/0").getOrElse(0L)
      assert(rangedBytes < shardBytes,
        s"partial read fetched $rangedBytes of a $shardBytes-byte shard")
    }
  }
}

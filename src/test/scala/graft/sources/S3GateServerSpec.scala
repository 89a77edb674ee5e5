package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The x82 gate endpoint must actually VERIFY signatures — the gate's
  * value rests on "every request was signed correctly", so an unsigned
  * or tampered request has to 403, and the signed client path has to
  * roundtrip. (The signing client itself is proven in S3StoreSpec; this
  * pins the server side of the gate's claim.) */
class S3GateServerSpec extends AnyFunSuite {

  private lazy val client = HttpClient.newHttpClient()

  private def raw(method: String, path: String,
                  headers: Map[String, String] = Map.empty,
                  body: Array[Byte] = Array.emptyByteArray): Int = {
    val b = HttpRequest.newBuilder(URI.create(S3GateServer.endpoint + path))
      .method(method,
        if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofByteArray(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("unsigned and tampered requests are rejected; signed ones roundtrip") {
    assert(raw("PUT", "/bkt/k", body = Array[Byte](1)) == 403,
      "a request with no Authorization must 403")
    assert(raw("GET", "/bkt/k") == 403)
    // full SigV4 headers but signed with the WRONG secret
    val badSig = SigV4.sign("PUT", URI.create(S3GateServer.endpoint).getAuthority,
      "/bkt/k", Nil, SigV4.sha256Hex(Array[Byte](1)), "20260813T000000Z",
      "us-east-1", "s3", S3GateServer.ACCESS, "not-the-secret", None)
    assert(raw("PUT", "/bkt/k", badSig, Array[Byte](1)) == 403,
      "a wrong-secret signature must 403")
    // body swapped after signing (hash mismatch)
    val swapped = SigV4.sign("PUT", URI.create(S3GateServer.endpoint).getAuthority,
      "/bkt/k", Nil, SigV4.sha256Hex(Array[Byte](1)), "20260813T000000Z",
      "us-east-1", "s3", S3GateServer.ACCESS, S3GateServer.SECRET, None)
    assert(raw("PUT", "/bkt/k", swapped, Array[Byte](2)) == 403,
      "a tampered body must 403")
    // the real client, configured by install(), writes and reads back
    val saved = Seq("graft.s3.endpoint", "graft.s3.accessKey",
      "graft.s3.secretKey", "graft.s3.multipartBytes")
      .map(k => k -> sys.props.get(k))
    S3GateServer.install()
    try {
      val payload = Array.tabulate[Byte](10000)(_.toByte) // > multipart threshold
      S3Store.write("s3://bkt/spec-roundtrip", payload)
      assert(S3Store.read("s3://bkt/spec-roundtrip").toSeq == payload.toSeq)
      assert(S3Store.sizeIfExists("s3://bkt/spec-roundtrip").contains(10000L))
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => sys.props(k) = x; case None => sys.props -= k }
    }
  }
}

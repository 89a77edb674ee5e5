package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, TestSpark}
import graft.api.XbeamDataset
import graft.ndarray.DType

/** Rotation-under-load proof for the GraftProps driver→executor
  * credential transport: its docstring claims a credential-vending
  * driver can rotate `graft.s3.*` mid-session and the NEXT job's tasks
  * sign with the new secret (the snapshot rides EACH plan's closures,
  * captured at toZarr-call time, not at dataset construction). This
  * spec proves it against the SigV4-VERIFYING mock: after
  * [[S3TestMock.rotate]] the verifier accepts ONLY the new credentials
  * (any task still holding the old secret gets a 403, which would
  * exhaust S3Store's retries and fail the job), and the mock counts
  * every auth rejection — a green run means zero stale-credential
  * requests were ever sent.
  *
  * Probative on `local-cluster` (forked executor JVMs that never see
  * driver sys.props — run via SPARK_GRAFT_TEST_MASTER); in default
  * single-JVM runs it still pins the rotate/restore ordering. */
class GraftPropsRotationSpec extends AnyFunSuite {

  private val KEYS = Seq("graft.s3.endpoint", "graft.s3.accessKey",
    "graft.s3.secretKey", "graft.s3.region")

  test("mid-session graft.s3.* rotation reaches the NEXT toZarr job's tasks") {
    val spark = TestSpark.spark
    val mock = new S3TestMock(0, "GRAFTROTACCESS1", "graft-rot-secret-1")
    val saved = KEYS.map(k => k -> sys.props.get(k))
    try {
      sys.props("graft.s3.endpoint") = s"http://127.0.0.1:${mock.port}"
      sys.props("graft.s3.accessKey") = "GRAFTROTACCESS1"
      sys.props("graft.s3.secretKey") = "graft-rot-secret-1"
      sys.props("graft.s3.region") = "us-east-1"

      def ds = XbeamDataset.fromLocal(spark, Fixtures.era5(),
        chunks = Map("time" -> 4))

      // job 1 signs with credential set 1
      ds.toZarr("s3://bucket/rot1")

      // the driver rotates; the verifier now 403s credential set 1
      mock.rotate("GRAFTROTACCESS2", "graft-rot-secret-2")
      sys.props("graft.s3.accessKey") = "GRAFTROTACCESS2"
      sys.props("graft.s3.secretKey") = "graft-rot-secret-2"

      // job 2's tasks must sign with credential set 2 — a stale
      // executor-side snapshot would 403 out through S3Store's retries
      ds.toZarr("s3://bucket/rot2")

      // both stores readable and identical (reads sign with set 2)
      val m1 = Zarr.readArrayMeta("s3://bucket/rot1", "temperature")
      val m2 = Zarr.readArrayMeta("s3://bucket/rot2", "temperature")
      assert(m1.dtype == DType.F64 && m2.dtype == DType.F64)
      val a1 = Zarr.readRegion("s3://bucket/rot1", "temperature", m1,
        Array(0L, 0L, 0L), m1.shape.map(_.toInt).toArray)
      val a2 = Zarr.readRegion("s3://bucket/rot2", "temperature", m2,
        Array(0L, 0L, 0L), m2.shape.map(_.toInt).toArray)
      assert(a1.sameAs(a2), "the two stores must hold identical data")
      assert(mock.authFailures.get() == 0,
        s"${mock.authFailures.get()} requests failed SigV4 verification " +
          "— some task signed with stale credentials after the rotation")
    } finally {
      mock.stop()
      saved.foreach { case (k, v) =>
        v match { case Some(x) => sys.props(k) = x; case None => sys.props -= k }
      }
    }
  }
}

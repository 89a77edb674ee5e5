package graft.sources

/** Driver→executor transport for `graft.*` JVM system properties —
  * store endpoints, credentials, tuning knobs ([[S3Store]],
  * [[BlobStore]] read them ambiently via `sys.props`).
  *
  * In `local[N]` executors share the driver JVM and see its properties
  * for free, which is exactly why this gap survived 17 rounds: the
  * round-18 multi-JVM correctness run (local-cluster) failed every
  * s3:// gate with "needs credentials" because forked executor JVMs
  * never see driver `sys.props`, and Spark task local properties do
  * not ride the AQE/broadcast thread pools reliably either. The honest
  * mechanism is explicit: capture a snapshot ON THE DRIVER at plan
  * time (a plain `Map` riding the task closure) and restore it inside
  * the task before any store IO. Restore overwrites prior snapshots
  * (credential rotation on the driver must propagate); environment
  * variables and instance profiles remain a separate fallback level
  * in the stores' lookup chain for keys the driver never set.
  *
  * At 100 TB this is also the right shape: credentials vended on the
  * driver (e.g. a token service) reach every task without requiring
  * cluster-wide env plumbing. */
object GraftProps {
  /** All `graft.*` system properties, captured on the driver. */
  def snapshot(): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    System.getProperties.stringPropertyNames.asScala.iterator
      .filter(_.startsWith("graft."))
      .map(k => k -> System.getProperty(k))
      .filter(_._2 != null)
      .toMap
  }

  /** Restore a driver snapshot inside an executor JVM (idempotent;
    * overwrites earlier snapshots so driver-side rotation propagates). */
  def restore(snap: Map[String, String]): Unit =
    snap.foreach { case (k, v) =>
      if (v != System.getProperty(k)) System.setProperty(k, v)
    }
}

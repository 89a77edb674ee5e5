package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for the named queries to
  * <outDir>/<name>_<suffix>.txt — the plan evidence committed under
  * plans/rNN/ each optimization round. Usage:
  *   runMain graft.PlanDump <outDir> <suffix> <name1,name2,...>
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. The dump is
  * the PRE-execution formatted plan (no action runs first), which is
  * what the plan-shape claims reference — Exchange count, join
  * strategy, PushedFilters/ReadSchema; AQE's runtime re-optimizations
  * (partition coalescing, join downgrades) are NOT visible here.
  * `spark.graft.queryScope=lazy` keeps the scoped-cache gates' full
  * plans dumpable (eager mode would checkpoint the result and dump a
  * bare checkpoint scan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, namesCsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.queryScope", "lazy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    namesCsv.split(",").foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

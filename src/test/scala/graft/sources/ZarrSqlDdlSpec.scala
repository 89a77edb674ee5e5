package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The catalog face of the connector: a zarr store registered with
  * `CREATE TABLE ... USING zarr` is a first-class SQL table — schema
  * inferred from store metadata, SELECT through the DSv2 scan (with
  * all its pruning), INSERT INTO through the append write path. */
class ZarrSqlDdlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CREATE TABLE USING zarr: select, prune, insert-into append") {
    import graft.api.XbeamDataset
    import graft.core.{Template, VarSpec}
    import graft.ndarray.DType
    import graft.operators.ChunkTransforms.Pair
    val dir = Files.createTempDirectory("zarr_ddl").toString + "/store"
    // 8x3 store, one chunk row [0,4) filled by the API; [4,8) left to
    // INSERT INTO
    val template = Template(
      Seq("t" -> 8L, "x" -> 3L),
      Map("v" -> VarSpec(Seq("t", "x"), DType.I64)),
      Map.empty, Map.empty)
    XbeamDataset.fromPairs(spark, template, Map("t" -> 4, "x" -> 3),
      spark.emptyDataset[Pair](graft.operators.ChunkTransforms.pairEnc),
      validate = false).toZarr(dir)
    spark.range(0, 12).selectExpr("id div 3 AS t", "id % 3 AS x",
        "id * 10 AS v")
      .write.format("zarr").option("dims", "t,x")
      .option("sizes", "t=8,x=3").mode("append").save(dir)

    val tbl = "zarr_ddl_" + System.nanoTime()
    // the session catalog stores the declared columns (a column-less
    // CREATE records an empty schema — schema inference is the
    // path-based `spark.read.format("zarr")` route)
    spark.sql(s"""CREATE TABLE $tbl (t BIGINT, x BIGINT, v BIGINT)
      USING zarr OPTIONS (path '$dir')""")
    try {
      val cols = spark.table(tbl).schema.fieldNames.toList
      assert(cols == List("t", "x", "v"), s"got $cols")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 24L)
      assert(spark.sql(
        s"SELECT sum(v) FROM $tbl WHERE t < 4").head().getLong(0) ==
        (0 until 12).map(_ * 10L).sum)
      // INSERT INTO routes through the append write: fill [4, 8)
      spark.sql(s"""INSERT INTO $tbl
        SELECT id div 3 + 4 AS t, id % 3 AS x, id * 100 AS v
        FROM range(12)""")
      val rows = spark.sql(
        s"SELECT t, x, v FROM $tbl WHERE t >= 4 ORDER BY t, x").collect()
      assert(rows.length == 12)
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == i * 100L, s"row $i: $r")
      }
      // the store itself saw the region writes (not just the session)
      assert(spark.read.format("zarr").load(dir).count() == 24L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}

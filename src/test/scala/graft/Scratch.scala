package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t

/** Dev-only profiling harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String, reps: Int = 2)(f: => DataFrame): Unit = {
      var n = 0L
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime(); n = f.count()
        println(f"TIMER $label%-28s rep$r ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      }
    }

    val names = args.toSet
    if (names.isEmpty || names("hot")) {
      Seq("d02_dedup_word_jaccard", "d03_dedup_shingle_jaccard",
          "d04_minhash_lsh_candidates", "q12_event_gaps",
          "x06_transpose", "x03_mean_dim").foreach { q =>
        time(q)(SparkEntry.queries(q)(spark, dir))
      }
    }

    if (names("shingle")) {
      // variant A: current formulation (collapsed projections)
      val SH = """array_distinct(transform(sequence(1, size(words) - 2),
        |  i -> concat(element_at(words, i), ' ', element_at(words, i + 1),
        |              ' ', element_at(words, i + 2))))""".stripMargin
      def tokA = {
        val w = t(spark, dir, "documents")
          .selectExpr("doc_id","lang","n_chars","split(text, ' ') AS words")
        val sh = w.filter(expr("size(words) >= 3"))
          .selectExpr("doc_id","lang","n_chars",s"$SH AS shingles")
          .withColumn("sz", expr("size(shingles)"))
        sh.select($"doc_id",$"lang",$"n_chars",$"sz", explode($"shingles").as("s"))
          .withColumn("h", expr("xxhash64(s)")).drop("s")
      }
      // variant B: barrier between words and shingles
      def tokB = {
        val w = t(spark, dir, "documents")
          .selectExpr("doc_id","lang","n_chars","split(text, ' ') AS words")
          .repartition(32)
        val sh = w.filter(expr("size(words) >= 3"))
          .selectExpr("doc_id","lang","n_chars",s"$SH AS shingles")
          .withColumn("sz", expr("size(shingles)"))
        sh.select($"doc_id",$"lang",$"n_chars",$"sz", explode($"shingles").as("s"))
          .withColumn("h", expr("xxhash64(s)")).drop("s")
      }
      // variant C: single-pass shingle expr over split() bound once via
      // a lambda over a 1-element wrapper (no repartition)
      val SH1 = """array_distinct(flatten(transform(array(split(text, ' ')),
        |  words -> transform(sequence(1, size(words) - 2),
        |    i -> concat(element_at(words, i), ' ', element_at(words, i + 1),
        |                ' ', element_at(words, i + 2))))))""".stripMargin
      def tokC = {
        val sh = t(spark, dir, "documents")
          .filter(expr("size(split(text, ' ')) >= 3"))
          .selectExpr("doc_id","lang","n_chars",s"$SH1 AS shingles")
          .withColumn("sz", expr("size(shingles)"))
        sh.select($"doc_id",$"lang",$"n_chars",$"sz", explode($"shingles").as("s"))
          .withColumn("h", expr("xxhash64(s)")).drop("s")
      }
      time("tokA count")(tokA)
      time("tokB count")(tokB)
      time("tokC count")(tokC)
      def joinOf(tok: DataFrame) = tok.as("a").join(tok.as("b"),
          $"a.h" === $"b.h" && $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id" &&
          abs($"a.n_chars" - $"b.n_chars") <= 50)
        .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          $"a.sz".as("sz_a"), $"b.sz".as("sz_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", $"inter".cast("double")/($"sz_a"+$"sz_b"-$"inter"))
        .filter($"jaccard" >= 0.5)
      time("d03 via A")(joinOf(tokA))
      time("d03 via B")(joinOf(tokB))
      time("d03 via C")(joinOf(tokC))
    }

    if (names("d02")) {
      val d = t(spark, dir, "documents").selectExpr(
        "doc_id", "lang", "n_chars",
        "array_distinct(split(text, ' ')) AS ws")
        .withColumn("sz", expr("size(ws)"))
      val tok = d.select($"doc_id", $"lang", $"n_chars", $"sz",
        explode($"ws").as("w"))
      time("d02 tok")(tok)
      val dfreq = tok.groupBy($"w").agg(count(lit(1)).as("df"))
      time("d02 dfreq")(dfreq)
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"df", $"w")
      val prefix = tok.join(dfreq, "w")
        .withColumn("rn", row_number().over(wDoc))
        .filter($"rn" <= $"sz" - expr("(9 * sz + 9) div 10") + 1)
        .select($"doc_id", $"lang", $"n_chars", $"w")
      time("d02 prefix")(prefix)
      val cand = prefix.as("a").join(prefix.as("b"),
          $"a.w" === $"b.w" && $"a.lang" === $"b.lang" &&
          $"a.doc_id" < $"b.doc_id" &&
          abs($"a.n_chars" - $"b.n_chars") <= 50)
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
        .distinct()
      time("d02 cand")(cand)
      time("d02 full")(SparkEntry.queries("d02_dedup_word_jaccard")(spark, dir))
      val sets = d.select($"doc_id", $"ws", $"sz")
      val verified = cand
        .join(broadcast(sets.select($"doc_id".as("id_a"), $"ws".as("ws_a"), $"sz".as("sz_a"))), "id_a")
        .join(broadcast(sets.select($"doc_id".as("id_b"), $"ws".as("ws_b"), $"sz".as("sz_b"))), "id_b")
        .withColumn("inter", expr("size(array_intersect(ws_a, ws_b))"))
        .withColumn("jaccard", $"inter".cast("double") /
          ($"sz_a" + $"sz_b" - $"inter"))
        .filter($"jaccard" >= 0.9)
        .select($"id_a", $"id_b", $"jaccard")
        .orderBy($"id_a", $"id_b")
      time("d02 bcast verify")(verified)
    }

    if (names("plan")) {
      val df = SparkEntry.queries(sys.env.getOrElse("PLANQ", "d04_minhash_lsh_candidates"))(spark, dir)
      val p = df.queryExecution.optimizedPlan.toString
      println("PLAN md5 occurrences: " + "md5".r.findAllIn(p).length)
      println("PLAN transform occurrences: " + "transform".r.findAllIn(p).length)
      println(p.take(6000))
    }

    if (names("d04")) {
      val q = SparkEntry.queries("d04_minhash_lsh_candidates")
      time("d04 full")(q(spark, dir))
      val SH = """array_distinct(flatten(transform(array(split(text, ' ')),
        |  ws -> transform(sequence(1, size(ws) - 2),
        |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
        |                ' ', element_at(ws, i + 2))))))""".stripMargin
      val sh = t(spark, dir, "documents").filter(expr("size(split(text, ' ')) >= 3"))
        .selectExpr("doc_id", s"$SH AS shingles")
      val sig = sh.selectExpr("doc_id",
        """element_at(transform(array(shingles), sha ->
          |  transform(sequence(0, 7), k ->
          |    array_min(transform(
          |      transform(sha, s -> md5(concat(cast(k div 4 AS string), '|', s))),
          |      d -> substr(d, (k % 4) * 8 + 1, 8))))), 1) AS sigs""".stripMargin)
      time("d04 sig")(sig)
      val bands = sig.select($"doc_id",
          posexplode(expr(
            "transform(sequence(0, 3), b -> concat(element_at(sigs, 2*b+1), element_at(sigs, 2*b+2)))")))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band")
      time("d04 bands")(bands)
      val cand = bands.as("a")
        .join(bands.as("b"), Seq("band_idx", "band"))
        .filter($"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
        .distinct()
      time("d04 cand")(cand)
    }

    if (names("d06")) {
      time("d06 current")(SparkEntry.queries("d06_simhash_neardup_pairs")(spark, dir))
      // variant: fp via collect_list + aggregate expr, then 7-block banding
      val wd = t(spark, dir, "documents")
        .select($"doc_id", $"lang", explode(expr("array_distinct(split(text, ' '))")).as("w"))
        .withColumn("h", expr("cast(conv(substr(md5(w), 1, 8), 16, 10) AS bigint)"))
      val fp = wd.groupBy($"doc_id", $"lang")
        .agg(collect_list($"h").as("hs"))
        .withColumn("simhash", expr(
          """aggregate(sequence(0, 31), cast(0 AS bigint), (acc, b) ->
            |  acc + CASE WHEN 2 * size(filter(hs, h -> (shiftright(h, b) & 1) = 1)) > size(hs)
            |             THEN shiftleft(cast(1 AS bigint), b) ELSE cast(0 AS bigint) END)""".stripMargin))
        .select($"doc_id", $"lang", $"simhash")
      time("d06 fp-arr")(fp)
      val bands = fp.select($"doc_id", $"lang", $"simhash",
        posexplode(expr(
          """transform(sequence(0, 6), b ->
            |  CASE WHEN b < 4 THEN shiftright(simhash, 5 * b) & 31
            |       ELSE shiftright(simhash, 20 + (b - 4) * 4) & 15 END)""".stripMargin)))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band")
      val cand = bands.as("a").join(bands.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band" === $"b.band" &&
          $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
                $"a.simhash".as("sh_a"), $"b.simhash".as("sh_b"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(sh_a ^ sh_b) AS bigint)"))
        .filter($"hamming" <= 6)
        .select($"id_a", $"id_b", $"hamming")
        .orderBy($"id_a", $"id_b")
      time("d06 banded")(cand)
    }

    if (names("q12")) {
      val ev = t(spark, dir, "events")
      time("events count")(ev)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      time("q12 window only")(
        ev.withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
          .select($"event_id", $"user_id",
                  (unix_micros($"ts") - $"prev_us").as("gap_us")))
      time("q12 full")(SparkEntry.queries("q12_event_gaps")(spark, dir))
    }
    spark.stop()
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import CacheScope.Scoped
import org.apache.spark.sql.expressions.Window

/** Training-data text pipeline operators over the `documents` table:
  * deduplication (exact, word/shingle Jaccard, MinHash+LSH, SimHash,
  * connected-component resolution), language scoring (marker heuristic
  * and trained bigram profiles), quality scoring, token counting,
  * fingerprinting, and the multimodal binary-payload pipelines
  * (image/video/audio-shaped, stub decode).
  *
  * These go beyond the reference's surface (xarray-beam has no text ops)
  * and are designed scale-first: candidate generation is always banded /
  * bucketed (MinHash bands, SimHash buckets) so the pair space at 100 TB
  * is bounded by band-bucket collisions, never a full cross join; the
  * brute-force pair variants kept here double as oracles for the banded
  * paths at test scale.
  *
  * Everything is codegen'd Catalyst built-ins (higher-order array
  * functions, md5, bit ops) — no UDFs — and every query has a DuckDB
  * oracle that replicates the exact same deterministic computation.
  */
object TextOps {
  import Tables.t

  /** Distinct 3-word shingles per doc, with the split() array bound
    * ONCE via a single-element-array lambda wrapper. Without the
    * wrapper, Catalyst's project collapsing inlines `split(text)` into
    * every `element_at(words, i)` lambda reference, turning shingle
    * construction O(words^2) per document (measured 6x slower at
    * sf0.1). The wrapper keeps the split a lambda-bound value that is
    * evaluated once per row no matter how projections collapse. */
  private[graft] val SHINGLES_SPARK =
    """array_distinct(flatten(transform(array(split(text, ' ')),
      |  ws -> transform(sequence(1, size(ws) - 2),
      |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
      |                ' ', element_at(ws, i + 2))))))""".stripMargin

  /** doc_id, lang, n_chars, shingles for docs with >= 3 words. */
  private[graft] def shingled(s: SparkSession, dir: String): DataFrame =
    // tPar: the shingle+hash pass is CPU-dense; a single-file scan would
    // run it as ONE task (Tables.tPar spreads the scan when needed)
    Tables.tPar(s, dir, "documents").filter(expr("size(split(text, ' ')) >= 3"))
      .selectExpr("doc_id", "lang", "n_chars", s"$SHINGLES_SPARK AS shingles")
  /** The shared shingle WORKING SET of every shingle-based dedup gate
    * (d03/d04/d07/d11/d12): one pass over `documents` computes the
    * shingle arrays PLUS their sorted 64-bit hash form, persisted
    * MEMORY_AND_DISK (the d02 idiom, promoted to a first-class building
    * block). Before this, d04/d11/d12 re-ran the shingle pass up to 4x
    * per query — once per band self-join side and once per verify-join
    * side (plan evidence: plans/r21/d04_minhash_lsh_candidates_before.txt
    * shows 4 parquet scans each redoing split+transform+md5/xxhash).
    * In production the same table is the materialized intermediate all
    * dedup stages share; composition amortizes it by construction. */
  private[graft] def shingleBase(s: SparkSession, dir: String): DataFrame =
    shingled(s, dir)
      .selectExpr("doc_id", "lang", "n_chars", "shingles",
        "array_sort(transform(shingles, x -> xxhash64(x))) AS hsh",
        "size(shingles) AS sz")
      .scopedPersist()

  private val SHINGLES_DUCK =
    """list_distinct(list_transform(range(1, len(words) - 1),
      |  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))""".stripMargin

  private[graft] val DUCK_SHINGLE_CTE =
    s"""WITH w AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS words FROM documents),
       |sh AS (SELECT doc_id, lang, n_chars, $SHINGLES_DUCK AS shingles
       |       FROM w WHERE len(words) >= 3)""".stripMargin

  /** Exact shingle-Jaccard >= num/den pair join — the d02 prefix-filter
    * idiom (AllPairs/PPJoin) shared by d03 and d07. Shingles get a
    * global canonical order (document frequency ascending, then hash);
    * for J >= t two sets must share a shingle within their first
    * |X| - ceil(t*|X|) + 1 shingles of that order, so only those short
    * rare-shingle prefixes are inverted-index-joined; candidates then
    * verify with the exact Jaccard over sorted 64-bit shingle hashes
    * (codegen'd merge kernel, 2^-64 collision odds per shingle pair —
    * the d02/d04 justification). The result is IDENTICAL to joining on
    * every shared shingle, but the hot-key failure mode is gone: a
    * corpus-wide boilerplate shingle has maximal df, ranks LAST in the
    * canonical order, and so never enters a prefix (prefix length is
    * ~(1-t)*sz), where the naive index join would have shuffled its
    * D^2 collision pairs. ceil(t*sz) is integer math — (num*sz+den-1)
    * div den — so float rounding can never shorten a prefix and drop a
    * true pair. */
  private def shingleJaccardPairs(s: SparkSession, dir: String,
                                  num: Int, den: Int): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // the hashed shingle sets are the working set of BOTH the prefix
    // branch and the verify branch; the shared [[shingleBase]] persist
    // means shingling and hashing run once per query (and its plan is
    // identical across the shingle gates, so the suite materializes it
    // once rather than once per gate)
    val sh = shingleBase(s, dir)
    val tok = sh.select($"doc_id", $"lang", $"n_chars", $"sz",
      explode($"hsh").as("h"))
    val dfreq = tok.groupBy($"h").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"h")
    // persisted: the prefix feeds BOTH sides of the candidate self-join;
    // without it the df-count + window pass runs twice per query.
    // Repartitioned before the persist: AQE coalesces the tiny window
    // output to one partition, and the prefix SELF-JOIN expands pairs
    // quadratically — a 1-partition cache would serialize it (the d06
    // fp lesson); the spread parallelizes both join sides for free.
    val prefix = tok.join(dfreq, "h")
      .withColumn("rn", row_number().over(wDoc))
      .filter($"rn" <= $"sz" - expr(s"($num * sz + ${den - 1}) div $den") + 1)
      .select($"doc_id", $"lang", $"n_chars", $"h")
      .repartition(s.sparkContext.defaultParallelism)
      .scopedPersist()
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.h" === $"b.h" && $"a.lang" === $"b.lang" &&
        $"a.doc_id" < $"b.doc_id" &&
        abs($"a.n_chars" - $"b.n_chars") <= 50)
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()
    val hsets = sh.select($"doc_id", $"hsh", $"sz")
    cand
      .join(hsets.select($"doc_id".as("id_a"), $"hsh".as("h_a"), $"sz".as("sz_a")), "id_a")
      .join(hsets.select($"doc_id".as("id_b"), $"hsh".as("h_b"), $"sz".as("sz_b")), "id_b")
      .withColumn("inter", expr("sorted_intersect_count(h_a, h_b)"))
      .withColumn("jaccard", $"inter".cast("double") /
        ($"sz_a" + $"sz_b" - $"inter"))
      .filter($"jaccard" >= lit(num.toDouble / den))
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** 8-lane minhash signature from TWO md5 digests per shingle: each
    * digest array is computed ONCE (as an argument of the array()
    * wrapper, not inside the k-loop where it would be re-evaluated 8x),
    * then sliced into 4 x 32-bit hex lanes and min-reduced per lane.
    * Lane k = digest (k div 4), slice (k % 4) — the exact order the
    * DuckDB oracles' k-loops produce. */
  private[graft] val MINHASH_SIGS_EXPR =
    """element_at(transform(array(shingles), sha ->
      |  flatten(transform(
      |    array(transform(sha, s -> md5(concat('0|', s))),
      |          transform(sha, s -> md5(concat('1|', s)))),
      |    dg -> transform(sequence(0, 3),
      |      j -> array_min(transform(dg, d -> substr(d, j * 8 + 1, 8))))))), 1)""".stripMargin
  /** Four 2-lane LSH bands over `sigs`. Lambda-bound once — otherwise
    * projection collapse re-inlines the whole minhash computation into
    * every element_at reference (8x per doc, measured 2s at sf0.1). */
  private[graft] val MINHASH_BANDS_EXPR =
    """element_at(transform(array(sigs), sg ->
      |  transform(sequence(0, 3),
      |    b -> concat(element_at(sg, 2*b+1), element_at(sg, 2*b+2)))), 1)""".stripMargin

  /** The MinHash-LSH banding rule as an explicit function: split
    * `totalHashes` signature lanes into (bands, rowsPerBand) so the
    * S-curve threshold (1/b)^(1/r) sits closest to `targetJaccard` —
    * pairs are LSH candidates with probability 1-(1-j^r)^b, and the
    * midpoint of that curve is (1/b)^(1/r), so picking (b, r) IS
    * picking the similarity the dedup targets. d04's fixed 4x2 table
    * is exactly this rule at (8 lanes, t=0.5); d11 demonstrates the
    * knob at (16, 0.7) -> 4 bands x 4 rows. Ties break to fewer bands
    * (fewer shuffled rows). Mirrors [[VectorOps.autoLshBits]]: the
    * sizing rule is a first-class default, not folklore. */
  def autoMinhashBands(totalHashes: Int, targetJaccard: Double): (Int, Int) = {
    require(totalHashes >= 1 && targetJaccard > 0 && targetJaccard < 1,
      s"autoMinhashBands(totalHashes=$totalHashes, t=$targetJaccard)")
    val pairs = (1 to totalHashes)
      .filter(totalHashes % _ == 0).map(b => (b, totalHashes / b))
    pairs.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - targetJaccard), b)
    }
  }

  /** 16 minhash lanes (4 md5 seeds x 4 lanes each) — the d04 signature
    * widened for threshold-targeted banding; lane k = seed k/4, hex
    * window k%4, identical to the oracle's `k // 4` / `k % 4`. */
  private[graft] val MINHASH16_SIGS_EXPR =
    """element_at(transform(array(shingles), sha ->
      |  flatten(transform(
      |    array(transform(sha, s -> md5(concat('0|', s))),
      |          transform(sha, s -> md5(concat('1|', s))),
      |          transform(sha, s -> md5(concat('2|', s))),
      |          transform(sha, s -> md5(concat('3|', s)))),
      |    dg -> transform(sequence(0, 3),
      |      j -> array_min(transform(dg, d -> substr(d, j * 8 + 1, 8))))))), 1)""".stripMargin

  /** Banded minhash rows for LSH bucketing: every non-(doc_id,
    * shingles) column of `docs` is carried through, `shingles` is
    * replaced by (band_idx, band). Shared by d04's batch LSH and the
    * streaming near-dup gate (s11). Streaming-safe: pure codegen
    * expressions, no aggregation. */
  private[graft] def minhashBands(docs: DataFrame): DataFrame = {
    val carry = docs.columns.filterNot(Set("doc_id", "shingles")).toSeq
    val sel = Seq("doc_id") ++ carry ++ Seq(s"$MINHASH_SIGS_EXPR AS sigs")
    docs.selectExpr(sel: _*)
      .select((Seq(col("doc_id")) ++ carry.map(col) :+
        posexplode(expr(MINHASH_BANDS_EXPR))): _*)
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band")
  }

  /** 32-bit SimHash majority vote in ONE aggregation (d05/d06/d08):
    * from rows of (groupCols..., h) — one row per distinct word, h its
    * 32-bit md5 prefix — compute per group a row count and 32
    * conditional bit-sums, then assemble the fingerprint as a sum of
    * disjoint powers of two. Bit-for-bit identical to the previous
    * explode(sequence(0,31)) + two-level aggregation (pos = count of
    * rows with bit b set = sum of that bit; the majority test `2*pos>n`
    * is unchanged), but the shuffle carries 33 longs per group instead
    * of 32 ROWS per (group, bit) — and the map side no longer feeds
    * 32x the input rows through an aggregation hash map. */
  private def simhashFp(wd: DataFrame, groupCols: Seq[String]): DataFrame = {
    val sums = (0 until 32).map(b =>
      sum(expr(s"shiftright(h, $b) & 1")).as(s"p$b"))
    val fp = (0 until 32).map(b =>
      expr(s"CASE WHEN p$b * 2 > n THEN ${1L << b}L ELSE 0L END"))
      .reduce(_ + _)
    wd.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(groupCols.map(col) :+ fp.as("simhash"): _*)
  }

  /** Connected components over an undirected edge list (`u`, `v`
    * columns) by min-label propagation with a pointer-doubling
    * shortcut: each round every vertex takes the least of its own
    * label, its neighbors' labels, AND its label's label
    * (`label(label(u))`), so label chains halve per round and
    * convergence is O(log diameter) rounds instead of
    * O(diameter) — the same doubling idea as large-star/small-star.
    * The convergence test rides a LongAccumulator filled by the SAME
    * eager `localCheckpoint` that materializes the round, so each
    * round is ONE action (the r15 shape ran a second `count()` job
    * per round). Returns (labels: doc_id → component-min label,
    * rounds). Task retries can only over-count `changed`, which at
    * worst delays termination one round — never a wrong result. */
  def connectedComponents(s: SparkSession, edges0: DataFrame,
                          maxRounds: Int = 16): (DataFrame, Int) = {
    // the closed-form seed IS round 1, and convergence is only ever
    // detected by a verification round inside the loop — so at least
    // one loop round must be allowed to run
    require(maxRounds >= 2,
      s"connectedComponents needs maxRounds >= 2 (got $maxRounds): " +
        "the seed round cannot observe its own convergence")
    import s.implicits._
    // symmetrize once and cut lineage: every round re-reads the edges
    val edges = edges0.select($"u".cast("long"), $"v".cast("long"))
      .union(edges0.select($"v".cast("long").as("u"),
        $"u".cast("long").as("v")))
      .filter($"u" =!= $"v").distinct()
      .localCheckpoint()
    // Seed = round 1 computed in closed form: from identity labels the
    // round's update least(label, min-neighbor-label, label(label))
    // collapses to least(u, min(v)) — a plain aggregation over edges, no
    // joins, no pointer deref (label(label(u)) = u). This replaces BOTH
    // the old identity-label checkpoint action and the old round-1
    // 3-join action with one cheap agg action; later rounds are
    // unchanged, so the final labels are identical.
    var labels = edges.groupBy($"u".as("doc_id"))
      .agg(min($"v").as("mn"))
      .select($"doc_id", least($"doc_id", $"mn").as("label"))
      .localCheckpoint()
    var rounds = 1
    var converged = false
    while (!converged && rounds < maxRounds) {
      val acc = s.sparkContext.longAccumulator(s"graft.cc.changed.r$rounds")
      val msgs = edges
        .join(labels.select($"doc_id".as("v"), $"label".as("nlabel")),
          Seq("v"))
        .groupBy($"u".as("doc_id"))
        .agg(min($"nlabel").as("minN"))
      val next = labels.as("a")
        .join(msgs, Seq("doc_id"), "left")
        .join(labels.select($"doc_id".as("p"), $"label".as("lref")),
          $"a.label" === $"p", "left")
        .select($"doc_id", $"a.label".as("old"),
          least($"a.label", coalesce($"minN", $"a.label"),
            coalesce($"lref", $"a.label")).as("label"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, old, nl) =>
            if (nl != old) acc.add(1L)
            (id, nl)
          }
        }.toDF("doc_id", "label")
        .localCheckpoint() // eager: materializes the round AND fills acc
      converged = acc.value == 0
      labels = next
      rounds += 1
    }
    require(converged, s"component labels did not converge in $rounds rounds")
    (labels, rounds)
  }

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- d01
    // Exact dedup: hash-groupBy on normalized content. At scale this is
    // one shuffle on a 128-bit key; the min-id keep rule is deterministic.
    QueryDef(
      "d01_dedup_exact",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .groupBy(md5(lower(trim($"text"))).as("fingerprint"))
          .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy($"keep_id")
      },
      Some("""
        SELECT md5(lower(trim(text))) AS fingerprint,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keep_id""")),

    // ---------------------------------------------------------------- d02
    // Word-set Jaccard near-dup pairs — prefix-filtered set-similarity
    // join (AllPairs/PPJoin style). Tokens get a global canonical order
    // (document frequency ascending, then word); for J >= t two sets
    // must share a token within their first |X| - ceil(t*|X|) + 1 tokens
    // of that order, so only those short rare-token prefixes are
    // inverted-index-joined. Candidates (a superset of the answer) are
    // then verified with the exact Jaccard. At 100 TB this replaces the
    // O(n^2) block cross-join with one df count, one prefix join on
    // rare tokens, and a verify join — all shuffle-on-key, all AQE/skew
    // friendly. Prefix length uses integer math: ceil(0.9*sz) computed
    // as (9*sz+9) div 10, so float rounding can never shorten a prefix
    // and drop a true pair.
    QueryDef(
      "d02_dedup_word_jaccard",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        // persisted word working set (the shingleBase idiom for the
        // word-token path): the split+distinct+hash pass feeds the
        // token explode AND the verify sets from one materialization
        val d = Tables.tPar(s, dir, "documents").selectExpr(
          "doc_id", "lang", "n_chars",
          "array_distinct(split(text, ' ')) AS ws")
          .withColumn("sz", expr("size(ws)"))
          .withColumn("wsh", expr("array_sort(transform(ws, w -> xxhash64(w)))"))
          .scopedPersist()
        val tok = d.select($"doc_id", $"lang", $"n_chars", $"sz",
          explode($"ws").as("w"))
        val dfreq = tok.groupBy($"w").agg(count(lit(1)).as("df"))
        val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"w")
        // persisted: the prefix feeds BOTH candidate self-join sides
        // (repartitioned before the persist — the d06 fp lesson: a
        // 1-partition cache serializes the pair-expanding self-join)
        val prefix = tok.join(dfreq, "w")
          .withColumn("rn", row_number().over(wDoc))
          .filter($"rn" <= $"sz" - expr("(9 * sz + 9) div 10") + 1)
          .select($"doc_id", $"lang", $"n_chars", $"w")
          .repartition(s.sparkContext.defaultParallelism)
          .scopedPersist()
        val cand = prefix.as("a").join(prefix.as("b"),
            $"a.w" === $"b.w" && $"a.lang" === $"b.lang" &&
            $"a.doc_id" < $"b.doc_id" &&
            abs($"a.n_chars" - $"b.n_chars") <= 50)
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
          .distinct()
        // Verify with the native merge kernel over sorted 64-bit word
        // hashes: same intersection size as size(array_intersect(ws_a,
        // ws_b)) (2^-64 collision odds per word pair), but the verify
        // join ships 8-byte hashes instead of strings and the per-pair
        // count is a codegen'd primitive loop, not an interpreted
        // hash-set build.
        val sets = d.select($"doc_id", $"wsh", $"sz")
        cand
          .join(sets.select($"doc_id".as("id_a"), $"wsh".as("h_a"), $"sz".as("sz_a")), "id_a")
          .join(sets.select($"doc_id".as("id_b"), $"wsh".as("h_b"), $"sz".as("sz_b")), "id_b")
          .withColumn("inter", expr("sorted_intersect_count(h_a, h_b)"))
          .withColumn("jaccard", $"inter".cast("double") /
            ($"sz_a" + $"sz_b" - $"inter"))
          .filter($"jaccard" >= 0.9)
          .select($"id_a", $"id_b", $"jaccard")
          .orderBy($"id_a", $"id_b")
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, n_chars,
                          list_distinct(string_split(text, ' ')) AS ws
                   FROM documents)
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
                 (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jaccard
          FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
                           AND abs(a.n_chars - b.n_chars) <= 50)
        WHERE jaccard >= 0.9 ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- d03
    // 3-gram shingle Jaccard near-dup pairs (the planted near-dups
    // separate cleanly: max ~0.99 vs p99 ~0.015 on this corpus).
    // Prefix-filtered set-similarity join ([[shingleJaccardPairs]]):
    // identical results to the every-shared-shingle index join, but
    // only the rare-shingle prefixes hit the inverted index, so a
    // corpus-wide boilerplate shingle can no longer manufacture a hot
    // join key — the round-14 hardening item for the 100 TB posture.
    QueryDef(
      "d03_dedup_shingle_jaccard",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        shingleJaccardPairs(s, dir, 1, 2).orderBy($"id_a", $"id_b")
      },
      Some(s"""
        $DUCK_SHINGLE_CTE
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                 (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
                             AND abs(a.n_chars - b.n_chars) <= 50)
        WHERE jaccard >= 0.5 ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- d04
    // MinHash + LSH: 8 md5-derived minhashes, 4 bands × 2 rows; pairs
    // sharing any band are candidates, then verified with true shingle
    // Jaccard. This is the 100 TB dedup path: cost is bounded by band
    // collisions (one shuffle on band value), not by the pair space.
    QueryDef(
      "d04_minhash_lsh_candidates",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        // shared persisted working set: the shingle pass runs ONCE and
        // feeds both band self-join sides and both verify-join sides
        // (was 4 full passes — see shingleBase)
        val sh = shingleBase(s, dir)
        // bands carry only (doc_id, band): candidate ids are deduped
        // BEFORE any array payload is shuffled, then verified against
        // the shingle sets — the band join never moves document content.
        // Persisted: both self-join sides read the one materialized band
        // table, so the md5 signature pass runs once, not twice.
        val bands = minhashBands(sh.select($"doc_id", $"shingles"))
          .scopedPersist()
        val cand = bands.as("a")
          .join(bands.as("b"), Seq("band_idx", "band"))
          .filter($"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
          .distinct()
        // Verify through sorted 64-bit shingle hashes and the codegen'd
        // merge kernel (the d02 idiom): identical intersection counts
        // (2^-64 collision odds per shingle pair), but the verify join
        // ships 8-byte hashes instead of ~50-char strings and the
        // per-pair count is a primitive loop, not an interpreted
        // hash-set build.
        graft.functions.GraftFunctions.register(s)
        val hsets = sh.select($"doc_id", $"hsh", $"sz")
        cand
          .join(hsets.select($"doc_id".as("id_a"), $"hsh".as("h_a"), $"sz".as("sz_a")), "id_a")
          .join(hsets.select($"doc_id".as("id_b"), $"hsh".as("h_b"), $"sz".as("sz_b")), "id_b")
          .withColumn("inter", expr("sorted_intersect_count(h_a, h_b)"))
          .withColumn("jaccard", $"inter".cast("double") /
            ($"sz_a" + $"sz_b" - $"inter"))
          .select($"id_a", $"id_b", $"jaccard")
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        $DUCK_SHINGLE_CTE,
        sig AS (SELECT doc_id, shingles,
                       list_transform(range(0, 8),
                         k -> list_aggregate(list_transform(
                                list_transform(shingles,
                                  s -> md5((k // 4)::VARCHAR || '|' || s)),
                                d -> substr(d, (k % 4) * 8 + 1, 8)), 'min')) AS sigs
                FROM sh),
        bands AS (SELECT doc_id, b AS band_idx,
                         sigs[2*b+1] || sigs[2*b+2] AS band
                  FROM sig, unnest([0, 1, 2, 3]) AS t(b)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band_idx = b.band_idx AND a.band = b.band
                  AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
               (len(x.shingles) + len(y.shingles) - len(list_intersect(x.shingles, y.shingles))) AS jaccard
        FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
        ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- d05
    // SimHash: 32-bit fingerprint from md5-hashed distinct words,
    // majority vote per bit. Pure relational formulation (explode →
    // two-level agg) so the oracle can replicate it exactly.
    QueryDef(
      "d05_simhash_fingerprint",
      (s, dir) => {
        import s.implicits._
        val wd = Tables.tPar(s, dir, "documents")
          .select($"doc_id", explode(expr("array_distinct(split(text, ' '))")).as("w"))
          .withColumn("h", expr("cast(conv(substr(md5(w), 1, 8), 16, 10) AS bigint)"))
        // single-aggregation majority vote (see simhashFp): same result
        // as the explode(0..31) two-level shape, 1/32nd the agg input
        simhashFp(wd, Seq("doc_id"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH wd AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
                    FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
                          FROM documents)),
        bits AS (SELECT doc_id, b,
                        count(*) FILTER (WHERE ((h >> b) & 1) = 1) AS pos,
                        count(*) AS n
                 FROM wd, unnest(range(0, 32)) AS t(b)
                 GROUP BY doc_id, b)
        SELECT doc_id,
               CAST(sum(CASE WHEN pos * 2 > n THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- d06
    // SimHash near-dup pairs: hamming distance <= 6 within a language,
    // found by pigeonhole banding — the 32-bit fingerprint splits into
    // 7 disjoint blocks (5,5,5,5,4,4,4 bits), and <= 6 differing bits
    // cannot touch all 7 blocks, so every qualifying pair shares at
    // least one exact block value. Candidate generation is therefore an
    // equi-join on (block, block_value, lang) — shuffle bounded by
    // block-value collisions, never the O(n²) pair space — followed by
    // pair dedup and exact hamming verification. Same result set as the
    // all-pairs formulation the oracle uses.
    QueryDef(
      "d06_simhash_neardup_pairs",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        val wd = Tables.tPar(s, dir, "documents")
          .select($"doc_id", $"lang", explode(expr("array_distinct(split(text, ' '))")).as("w"))
          .withColumn("h", expr("cast(conv(substr(md5(w), 1, 8), 16, 10) AS bigint)"))
        // single-aggregation majority vote (see simhashFp): same result
        // as the explode(0..31) two-level shape, 1/32nd the agg input.
        // Persisted: the fingerprint pass (word explode + md5 + agg)
        // feeds both block self-join sides from one materialization.
        // Repartitioned BEFORE the persist: AQE coalesces the tiny agg
        // output to one partition, and a 1-partition cache serializes
        // the downstream band self-join — a stage that EXPANDS pairs
        // quadratically while reading almost no bytes (measured ~1.0 s
        // single-task at sf0.1, ~0.1 s spread). The round-robin spread
        // of the cached rows parallelizes every cache consumer without
        // adding a per-consumer exchange.
        val fp = simhashFp(wd, Seq("doc_id", "lang"))
          .repartition(s.sparkContext.defaultParallelism)
          .scopedPersist()
        // blocks 0-3: 5 bits at 0,5,10,15; blocks 4-6: 4 bits at 20,24,28
        val bands = fp
          .withColumn("blk", explode(expr("sequence(0, 6)")))
          .withColumn("bval", expr(
            """shiftright(simhash,
               |  CASE WHEN blk < 4 THEN blk * 5 ELSE 20 + (blk - 4) * 4 END)
               |& CASE WHEN blk < 4 THEN 31 ELSE 15 END""".stripMargin))
        // A pair sharing k blocks comes out of the join k times; keep
        // only the copy from the FIRST matching block (the xor of the
        // fingerprints tells us which one that is). Dedup is then a
        // codegen'd filter in the join stage — no distinct shuffle.
        // (r22 note: do NOT rewrite these post-join filters into the
        // join condition with expr("a.simhash ^ b.simhash") — in a
        // self-join the string-resolved a./b. references are ambiguous
        // and silently resolve to one side; measured 1.35M wrong rows.
        // The optimizer folds the filters into the BHJ condition anyway,
        // with correctly disambiguated expression ids.)
        bands.as("a").join(bands.as("b"),
            $"a.blk" === $"b.blk" && $"a.bval" === $"b.bval" &&
              $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id")
          .withColumn("x", expr("a.simhash ^ b.simhash"))
          .filter(expr(
            """a.blk = CASE WHEN (x & 31) = 0 THEN 0
              |          WHEN (shiftright(x, 5) & 31) = 0 THEN 1
              |          WHEN (shiftright(x, 10) & 31) = 0 THEN 2
              |          WHEN (shiftright(x, 15) & 31) = 0 THEN 3
              |          WHEN (shiftright(x, 20) & 15) = 0 THEN 4
              |          WHEN (shiftright(x, 24) & 15) = 0 THEN 5
              |          ELSE 6 END""".stripMargin))
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
            expr("cast(bit_count(x) AS bigint)").as("hamming"))
          .filter($"hamming" <= 6)
          .orderBy($"id_a", $"id_b")
      },
      Some("""
        WITH wd AS (SELECT doc_id, lang, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
                    FROM (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS w
                          FROM documents)),
        bits AS (SELECT doc_id, lang, b,
                        count(*) FILTER (WHERE ((h >> b) & 1) = 1) AS pos,
                        count(*) AS n
                 FROM wd, unnest(range(0, 32)) AS t(b)
                 GROUP BY doc_id, lang, b),
        fp AS (SELECT doc_id, lang,
                      CAST(sum(CASE WHEN pos * 2 > n THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS simhash
               FROM bits GROUP BY doc_id, lang)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
        ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- d08
    // Survivor selection — the step AFTER dedup in a real pipeline:
    // within each near-dup cluster (here: identical 32-bit simhash per
    // language, i.e. hamming-0 neighbors), keep the member with the
    // best quality score, ties to the lowest doc id. One aggregation
    // over cluster keys via a lexicographic struct-max — max quality,
    // then min id — so the shuffle carries one row per cluster.
    QueryDef(
      "d08_dedup_survivor_quality",
      (s, dir) => {
        import s.implicits._
        val wd = Tables.tPar(s, dir, "documents")
          .select($"doc_id", $"lang", explode(expr("array_distinct(split(text, ' '))")).as("w"))
          .withColumn("h", expr("cast(conv(substr(md5(w), 1, 8), 16, 10) AS bigint)"))
        // single-aggregation majority vote (see simhashFp): same result
        // as the explode(0..31) two-level shape, 1/32nd the agg input
        val fp = simhashFp(wd, Seq("doc_id", "lang"))
        val quality = Tables.tPar(s, dir, "documents")
          .withColumn("ws", expr("split(text, ' ')"))
          .withColumn("nw", expr("cast(size(ws) AS bigint)"))
          .withColumn("quality",
            (expr("cast(size(filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS bigint)")
              .cast("double") / $"nw") * 0.5 +
            (expr("cast(size(array_distinct(ws)) AS bigint)").cast("double") / $"nw") * 0.5 -
            expr("cast(length(regexp_replace(text, '[^0-9]', '')) AS bigint)")
              .cast("double") / expr("length(text)"))
          .select($"doc_id", $"quality")
        fp.join(quality, "doc_id")
          .groupBy($"lang", $"simhash")
          .agg(max(struct($"quality", (-$"doc_id").as("negid"))).as("m"),
               count(lit(1)).as("n_members"))
          .select($"lang", $"simhash", (-$"m.negid").cast("long").as("survivor_id"),
            $"m.quality".as("quality"), $"n_members")
          .orderBy($"lang", $"simhash")
      },
      Some("""
        WITH wd AS (SELECT doc_id, lang, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
                    FROM (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS w
                          FROM documents)),
        bits AS (SELECT doc_id, lang, b,
                        count(*) FILTER (WHERE ((h >> b) & 1) = 1) AS pos,
                        count(*) AS n
                 FROM wd, unnest(range(0, 32)) AS t(b)
                 GROUP BY doc_id, lang, b),
        fp AS (SELECT doc_id, lang,
                      CAST(sum(CASE WHEN pos * 2 > n THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS simhash
               FROM bits GROUP BY doc_id, lang),
        q AS (SELECT doc_id,
                     (CAST(len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) / len(ws)) * 0.5
                   + (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) * 0.5
                   - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS quality
              FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)),
        j AS (SELECT fp.lang, fp.simhash, fp.doc_id, q.quality
              FROM fp JOIN q USING (doc_id)),
        g AS (SELECT lang, simhash, max(quality) AS mq, count(*) AS n_members
              FROM j GROUP BY 1, 2)
        SELECT g.lang, g.simhash, min(j.doc_id) AS survivor_id,
               any_value(g.mq) AS quality, any_value(g.n_members) AS n_members
        FROM j JOIN g ON j.lang = g.lang AND j.simhash = g.simhash
                     AND j.quality = g.mq
        GROUP BY g.lang, g.simhash
        ORDER BY g.lang, g.simhash""")),

    // ---------------------------------------------------------------- d09
    // Repeated-span removal (the C4/RefinedWeb line-dedup shape: drop
    // any span of text that recurs verbatim across the corpus, keeping
    // the rest of each document): documents slice into non-overlapping
    // 8-word spans (the corpus is single-line, so fixed word windows
    // stand in for lines), spans recurring >= 3 times corpus-wide are
    // removed everywhere, and documents reassemble in span order. The
    // span table carries (doc_id, pos, span) only; the recurring-span
    // set is tiny by construction (bounded by actual duplication), so
    // the removal join is broadcast-sized at any scale — content never
    // shuffles a second time. At 100 TB the span join key would be a
    // 128-bit hash instead of the span text; the shape is identical.
    QueryDef(
      "d09_dedup_repeated_spans",
      (s, dir) => {
        import s.implicits._
        // bind split() once (the d02 lambda-wrapper pattern), then one
        // slice per span — no word explode
        val spans = t(s, dir, "documents")
          .withColumn("spans", expr(
            """element_at(transform(array(split(text, ' ')), ws ->
              |  transform(sequence(0, cast(ceil(size(ws) / 8.0) AS int) - 1),
              |    i -> array_join(slice(ws, i * 8 + 1, 8), ' '))), 1)""".stripMargin))
          .select($"doc_id", posexplode($"spans").as(Seq("pos", "span")))
        val dup = spans.filter(length(trim($"span")) >= 20)
          .groupBy($"span").agg(count(lit(1)).as("cnt"))
          .filter($"cnt" >= 3).select($"span", lit(true).as("dup"))
        spans.join(dup, Seq("span"), "left")
          .groupBy($"doc_id")
          .agg(
            array_join(expr(
              "transform(array_sort(collect_list(CASE WHEN dup IS NULL THEN struct(pos, span) END)), s -> s.span)"),
              " ").as("text"),
            count(when($"dup", 1)).as("n_removed"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH spans AS (
          SELECT doc_id, unnest(range(CAST(ceil(len(w) / 8.0) AS BIGINT))) AS pos,
                 unnest(list_transform(range(CAST(ceil(len(w) / 8.0) AS BIGINT)),
                        i -> array_to_string(w[i*8+1:i*8+8], ' '))) AS span
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        dup AS (SELECT span FROM spans WHERE length(trim(span)) >= 20
                GROUP BY span HAVING count(*) >= 3)
        SELECT s.doc_id,
               coalesce(string_agg(CASE WHEN d.span IS NULL THEN s.span END, ' ' ORDER BY s.pos), '') AS text,
               count(*) FILTER (WHERE d.span IS NOT NULL) AS n_removed
        FROM spans s LEFT JOIN dup d ON s.span = d.span
        GROUP BY s.doc_id ORDER BY s.doc_id""")),

    // ---------------------------------------------------------------- m03
    // Multimodal audio analysis through a REAL codec: the payload is a
    // genuine RIFF/WAVE container (8-bit PCM mono, built from the text
    // bytes — the testdata ships no binary column) parsed back with
    // [[graft.media.Wav.decode]], then analyzed in 64-sample windows —
    // RMS energy (integer sum-of-squares, one division) and zero
    // crossings against the 128 midline. PCM is lossless, so the
    // features equal those over the original bytes and the oracle
    // needs no codec.
    QueryDef(
      "m03_multimodal_audio",
      (s, dir) => {
        import s.implicits._
        val bin = t(s, dir, "documents")
          // byte-for-byte parity with the codepoint-based oracle needs
          // ASCII payloads: restrict to docs whose UTF-8 byte length
          // equals the character length (the oracle filters identically)
          .filter(octet_length($"text") === length($"text"))
          .select($"doc_id", encode($"text", "utf-8").as("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) =>
            (id, graft.media.Wav.encode(
              graft.media.Wav.Audio(16000, 1, 8, bytes.map(_ & 0xff))))
          }
        bin.mapPartitions { it =>
          it.flatMap { case (id, wav) =>
            val samples = graft.media.Wav.decode(wav).samples // REAL parse
            val win = 64
            val nWin = samples.length / win
            if (nWin < 1) Iterator.empty
            else {
              var bestW = 0
              var bestSq = -1L
              var crossings = 0L
              var w = 0
              while (w < nWin) {
                var sq = 0L
                var i = 0
                while (i < win) {
                  val v = samples(w * win + i) - 128
                  sq += v.toLong * v
                  if (i > 0) {
                    val p = samples(w * win + i - 1) - 128
                    if ((p < 0 && v >= 0) || (p >= 0 && v < 0)) crossings += 1
                  }
                  i += 1
                }
                if (sq > bestSq) { bestSq = sq; bestW = w }
                w += 1
              }
              Iterator((id, nWin.toLong, bestW.toLong,
                math.sqrt(bestSq.toDouble / win),
                crossings.toDouble / nWin))
            }
          }
        }.toDF("doc_id", "n_windows", "peak_window", "peak_rms", "zcr_per_window")
          .orderBy($"doc_id")
      },
      Some("""
        WITH b AS (SELECT doc_id,
                          list_transform(string_split(text, ''), c -> ascii(c) - 128) AS s,
                          length(text) // 64 AS n_windows
                   FROM documents
                   WHERE length(text) // 64 >= 1 AND strlen(text) = length(text)),
        w AS (SELECT doc_id, n_windows,
                     list_transform(range(0, n_windows), w ->
                       list_reduce(list_transform(range(w*64+1, w*64+65),
                         i -> CAST(s[i] * s[i] AS BIGINT)), (a, b) -> a + b)) AS sq
              FROM b),
        pk AS (SELECT doc_id, n_windows, sq,
                      list_indexof(sq, list_aggregate(sq, 'max')) - 1 AS peak_window
               FROM w),
        zc AS (SELECT doc_id,
                      len(list_filter(range(0, n_windows * 64),
                        i -> i % 64 > 0 AND
                             ((s[i] < 0 AND s[i+1] >= 0) OR (s[i] >= 0 AND s[i+1] < 0))))
                        AS crossings
               FROM b)
        SELECT p.doc_id, CAST(p.n_windows AS BIGINT) AS n_windows,
               CAST(p.peak_window AS BIGINT) AS peak_window,
               sqrt(CAST(p.sq[p.peak_window + 1] AS DOUBLE) / 64) AS peak_rms,
               CAST(z.crossings AS DOUBLE) / p.n_windows AS zcr_per_window
        FROM pk p JOIN zc z ON z.doc_id = p.doc_id
        ORDER BY p.doc_id""")),

    // ---------------------------------------------------------------- m04
    // Image TRANSFORM pipeline (the resize leg of the multimodal
    // brief): decode a real PNG (4-wide grey "video", one 4x4 frame
    // per 4 rows), mean-pool each frame to a 2x2 thumbnail in INTEGER
    // space (sum div 4 — stays in byte range), re-encode the thumbnail
    // stack as a second real PNG (Up-filtered), decode THAT, and
    // summarize. Both codec directions run as executor-side pipeline
    // stages; every feature is computed from decoded pixels (never
    // from compressed bytes, which would tie results to the zlib
    // build), so the oracle replicates the integer pooling directly.
    QueryDef(
      "m04_multimodal_thumbnail",
      (s, dir) => {
        import s.implicits._
        val bin = t(s, dir, "documents")
          // byte-for-byte parity with the codepoint-based oracle needs
          // ASCII payloads: restrict to docs whose UTF-8 byte length
          // equals the character length (the oracle filters identically)
          .filter(octet_length($"text") === length($"text"))
          .select($"doc_id", encode($"text", "utf-8").as("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) =>
            val nF = bytes.length / 16
            val png =
              if (nF < 1) Array.empty[Byte]
              else graft.media.Png.encode(
                graft.media.Png.Image(4, 4 * nF, 1, bytes.take(nF * 16)),
                filter = 4)
            (id, png)
          }
        bin.mapPartitions { it =>
          it.flatMap { case (id, png) =>
            if (png.isEmpty) Iterator.empty
            else {
              val src = graft.media.Png.decode(png) // REAL parse
              val b = src.pixels
              val nFrames = b.length / 16
              // integer 2x2 mean-pool: frame f, quadrant q (row-major)
              val thumb = new Array[Byte](nFrames * 4)
              var f = 0
              while (f < nFrames) {
                var q = 0
                while (q < 4) {
                  val base = f * 16 + (q / 2) * 8 + (q % 2) * 2
                  thumb(f * 4 + q) = (((b(base) & 0xff) + (b(base + 1) & 0xff) +
                    (b(base + 4) & 0xff) + (b(base + 5) & 0xff)) / 4).toByte
                  q += 1
                }
                f += 1
              }
              // re-encode the thumbnail stack, decode it back, and
              // feature-extract from the SECOND decode
              val thumbPng = graft.media.Png.encode(
                graft.media.Png.Image(2, 2 * nFrames, 1, thumb), filter = 2)
              val out = graft.media.Png.decode(thumbPng).pixels
              var sum = 0L
              var i = 0
              while (i < out.length) { sum += (out(i) & 0xff); i += 1 }
              Iterator((id, nFrames.toLong, (out(0) & 0xff).toLong, sum,
                sum.toDouble / out.length))
            }
          }
        }.toDF("doc_id", "n_frames", "first_px", "sum_px", "mean_px")
          .orderBy($"doc_id")
      },
      Some("""
        WITH b AS (SELECT doc_id,
                          list_transform(string_split(text, ''), c -> ascii(c)) AS bytes,
                          length(text) // 16 AS n_frames
                   FROM documents WHERE strlen(text) = length(text)),
        p AS (SELECT doc_id, n_frames,
                     flatten(list_transform(range(0, n_frames), f ->
                       list_transform(range(0, 4), q ->
                         (bytes[f*16 + (q//2)*8 + (q%2)*2 + 1]
                        + bytes[f*16 + (q//2)*8 + (q%2)*2 + 2]
                        + bytes[f*16 + (q//2)*8 + (q%2)*2 + 5]
                        + bytes[f*16 + (q//2)*8 + (q%2)*2 + 6]) // 4))) AS thumb
              FROM b WHERE n_frames >= 1)
        SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
               CAST(thumb[1] AS BIGINT) AS first_px,
               CAST(list_reduce(thumb, (a, x) -> a + x) AS BIGINT) AS sum_px,
               CAST(list_reduce(thumb, (a, x) -> a + x) AS DOUBLE) / len(thumb) AS mean_px
        FROM p ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m05
    // Perceptual image dedup via dHash (difference hash — THE standard
    // cheap near-dup fingerprint for image corpora): each document's
    // first 72 bytes become a genuine 9x8 greyscale PNG (the m01/m04
    // manufacture trick — testdata ships no binary column), decoded by
    // the REAL parser (CRC walk + inflate + unfilter), and the hash is
    // the 64 horizontal-gradient sign bits px[r][c] < px[r][c+1],
    // packed into two 32-bit BIGINT halves (the e16 packing — 16
    // bytes/row serving index). Dedup groups = exact hash equality:
    // ONE map-side-combined shuffle on the 16-byte code; canonical id
    // is the group min. PNG is lossless, so the oracle computes the
    // same gradient bits straight from the text bytes.
    QueryDef(
      "m05_image_dhash_dedup",
      (s, dir) => {
        import s.implicits._
        val bin = t(s, dir, "documents")
          // byte-for-byte parity with the codepoint-based oracle needs
          // ASCII payloads: restrict to docs whose UTF-8 byte length
          // equals the character length (the oracle filters identically)
          .filter(octet_length($"text") === length($"text"))
          .select($"doc_id", encode($"text", "utf-8").as("payload"))
          .as[(Long, Array[Byte])]
          .flatMap { case (id, bytes) =>
            if (bytes.length < 72) None
            else Some((id, graft.media.Png.encode(
              graft.media.Png.Image(9, 8, 1, bytes.take(72)), filter = 3)))
          }
        val hashed = bin.mapPartitions { it =>
          it.map { case (id, png) =>
            val px = graft.media.Png.decode(png).pixels // REAL parse
            var lo = 0L
            var hi = 0L
            var k = 0
            while (k < 64) {
              val p = (k / 8) * 9 + (k % 8)
              if ((px(p) & 0xff) < (px(p + 1) & 0xff)) {
                if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
              }
              k += 1
            }
            (id, lo, hi)
          }
        }.toDF("doc_id", "lo", "hi")
        val canon = hashed.groupBy($"lo", $"hi")
          .agg(min($"doc_id").as("canonical_id"),
            count(lit(1)).as("group_n"))
        hashed.join(canon, Seq("lo", "hi"))
          .select($"doc_id", $"lo", $"hi", $"canonical_id", $"group_n")
          .orderBy($"doc_id")
      },
      Some("""
        WITH b AS (SELECT doc_id,
                          list_transform(string_split(text, ''),
                                         c -> ascii(c)) AS px
                   FROM documents
                   WHERE length(text) >= 72 AND strlen(text) = length(text)),
        h AS (SELECT doc_id,
                list_reduce(list_transform(range(0, 32), k ->
                  CASE WHEN px[(k // 8) * 9 + (k % 8) + 1]
                          < px[(k // 8) * 9 + (k % 8) + 2]
                       THEN (1::BIGINT << k::INT) ELSE 0::BIGINT END),
                  (a, b) -> a + b) AS lo,
                list_reduce(list_transform(range(32, 64), k ->
                  CASE WHEN px[(k // 8) * 9 + (k % 8) + 1]
                          < px[(k // 8) * 9 + (k % 8) + 2]
                       THEN (1::BIGINT << (k - 32)::INT) ELSE 0::BIGINT END),
                  (a, b) -> a + b) AS hi
              FROM b),
        c AS (SELECT lo, hi, min(doc_id) AS canonical_id,
                     count(*) AS group_n
              FROM h GROUP BY lo, hi)
        SELECT h.doc_id, h.lo, h.hi, c.canonical_id, c.group_n
        FROM h JOIN c USING (lo, hi) ORDER BY h.doc_id""")),

    // ---------------------------------------------------------------- d07
    // Dedup resolution: near-dup pairs (d03's shingle-Jaccard edges) →
    // connected components → one canonical survivor per component (min
    // doc_id). This is the decision step of a dedup pipeline:
    // min-label propagation with a pointer-doubling shortcut
    // (connectedComponents above) — O(log diameter) rounds, ONE Spark
    // action per round with the convergence test folded into the
    // round's accumulator. At 100 TB edges are near-dup pairs (small
    // by construction) and never collect to the driver. The oracle
    // computes the same components via a recursive reachability CTE.
    QueryDef(
      "d07_dedup_components",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        // prefix-filtered exact pair join (the d03 path — same hot-key
        // hardening applies to the component edge list)
        val pairs = shingleJaccardPairs(s, dir, 1, 2)
          .select($"id_a", $"id_b")
        val (labels, _) = connectedComponents(s,
          pairs.select($"id_a".as("u"), $"id_b".as("v")))
        labels.select($"doc_id", $"label".as("component_id"),
            ($"doc_id" === $"label").as("keep"))
          .orderBy($"doc_id")
      },
      Some(s"""
        ${DUCK_SHINGLE_CTE.replace("WITH w", "WITH RECURSIVE w")},
        pairs AS (
          SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                   (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
                               AND abs(a.n_chars - b.n_chars) <= 50)
          WHERE jaccard >= 0.5),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        verts AS (SELECT DISTINCT u AS doc_id FROM edges),
        reach AS (
          SELECT doc_id, doc_id AS r FROM verts
          UNION
          SELECT reach.doc_id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r)
        SELECT doc_id, min(r) AS component_id, doc_id = min(r) AS keep
        FROM reach GROUP BY doc_id ORDER BY doc_id""")),

    // ---------------------------------------------------------------- t01
    // Language/content scoring: deterministic marker-count heuristic
    // (replace-and-measure occurrence counting), argmax with fixed tie
    // order, summarized as a lang × predicted confusion table.
    QueryDef(
      "t01_lang_score",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("s_the", expr("cast((length(text) - length(replace(text, 'the', ''))) / 3 AS bigint)"))
          .withColumn("s_data", expr("cast((length(text) - length(replace(text, 'data', ''))) / 4 AS bigint)"))
          .withColumn("s_query", expr("cast((length(text) - length(replace(text, 'query', ''))) / 5 AS bigint)"))
          .withColumn("predicted", expr(
            """CASE WHEN s_the >= s_data AND s_the >= s_query THEN 'en-article'
              |     WHEN s_data >= s_query THEN 'en-data'
              |     ELSE 'en-query' END""".stripMargin))
          .groupBy($"lang", $"predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"predicted")
      },
      Some("""
        WITH scored AS (
          SELECT lang,
                 CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS s_the,
                 CAST((length(text) - length(replace(text, 'data', ''))) / 4 AS BIGINT) AS s_data,
                 CAST((length(text) - length(replace(text, 'query', ''))) / 5 AS BIGINT) AS s_query
          FROM documents)
        SELECT lang,
               CASE WHEN s_the >= s_data AND s_the >= s_query THEN 'en-article'
                    WHEN s_data >= s_query THEN 'en-data'
                    ELSE 'en-query' END AS predicted,
               count(*) AS n
        FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""")),

    // ---------------------------------------------------------------- t05
    // Character-bigram profile language ID (Cavnar-Trenkle shape):
    // per-language profiles = top-20 bigrams by frequency over a
    // deterministic 20% md5-hash sample (at 100 TB you train profiles
    // on a sample, never the full corpus), docs scored by
    // distinct-bigram overlap with each profile, argmax with
    // ascending-language tiebreak, summarized as a confusion matrix.
    // Profiles are a tiny dimension table — the scoring pass folds them
    // into plan-time literals at any corpus size.
    QueryDef(
      "t05_bigram_lang_id",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        // Training explodes a bounded 400-char prefix, not the whole
        // text: Cavnar–Trenkle character profiles converge within a few
        // hundred characters per document, so the training cost is
        // O(sampled docs x 400) regardless of document length — at
        // 100 TB the profile pass reads a fixed prefix per sampled doc
        // instead of 2x the corpus characters.
        val occ = docs
          .filter(expr(
            "cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 5 = 0"))
          .select($"lang", explode(expr(
            "transform(sequence(1, greatest(least(length(text), 401) - 1, 0)), i -> substr(text, i, 2))")).as("bg"))
        // count + top-20 fold into aggregations (no window): the second
        // agg runs over the already-tiny (lang, bg) side and selects the
        // profile via one sorted-struct slice per language.
        val profiles = occ.groupBy($"lang", $"bg").agg(count(lit(1)).as("cnt"))
          .groupBy($"lang")
          .agg(slice(array_sort(collect_list(
            struct((-$"cnt").as("neg"), $"bg"))), 1, 20).as("top"))
        // The trained profile is ~20 bigrams x ~5 langs: collect it and
        // fold it into plan-time array literals (the e02 plane-weights
        // idiom). Scoring is then one narrow pass with the doc's
        // distinct-bigram array lambda-bound ONCE (the SHINGLES_SPARK
        // idiom): the whole argmax — 5 array_intersects and a
        // struct-min — happens inside a single transform lambda, so
        // projection collapse cannot re-inline the 300-element bigram
        // construction into every profile's score (measured 2.5x slower
        // without the binding).
        val prof: Map[String, Seq[String]] = profiles.collect()
          .map(r => r.getString(0) ->
            r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1)).toSeq)
          .toMap
        val plangs = prof.keys.toSeq.sorted
        if (plangs.isEmpty) {
          // empty/tiny corpus: no profiles trained, no predictions — the
          // oracle's join-based formulation returns zero rows too
          import org.apache.spark.sql.types._
          s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            StructType(Seq(StructField("lang", StringType),
              StructField("predicted", StringType), StructField("n", LongType))))
        } else {
          // Profile arrays enter the plan as typedLit Column literals, not
          // spliced SQL text: corpus-derived bigrams may contain quotes or
          // backslashes, which Spark's lexer treats differently from
          // DuckDB's (adjacent-literal concatenation, backslash escapes) —
          // literals bypass the lexer entirely. Scoring is the native
          // one-pass codegen'd kernel ([[graft.functions.BigramBestProfile]]):
          // identical argmax semantics to the declarative
          // distinct-bigrams + per-profile array_intersect chain, but one
          // codepoint walk per row instead of ~L substring allocations,
          // a distinct hash, and |langs| interpreted intersects.
          graft.functions.GraftFunctions.register(s)
          val idx = call_function("bigram_best_profile", $"text",
            typedLit(plangs.map(prof)))
          val predicted = get(typedLit(plangs), idx)
          docs
            .select($"lang", predicted.as("predicted"))
            .groupBy($"lang", $"predicted")
            .agg(count(lit(1)).as("n"))
            .orderBy($"lang", $"predicted")
        }
      },
      Some("""
        WITH occ AS (
          SELECT lang, unnest(list_transform(range(1, greatest(least(length(text), 401) - 1, 0) + 1),
                   i -> substr(text, i, 2))) AS bg
          FROM documents
          WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 5 = 0),
        profiles AS (
          SELECT lang AS plang, bg FROM (
            SELECT lang, bg, count(*) AS cnt,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY count(*) DESC, bg) AS prank
            FROM occ GROUP BY lang, bg)
          WHERE prank <= 20),
        doc_bg AS (
          SELECT doc_id, lang,
                 unnest(list_distinct(list_transform(range(1, greatest(length(text) - 1, 0) + 1),
                   i -> substr(text, i, 2)))) AS bg
          FROM documents),
        scores AS (
          SELECT d.doc_id, d.lang, p.plang, count(*) AS score
          FROM doc_bg d JOIN profiles p ON d.bg = p.bg
          GROUP BY 1, 2, 3),
        base AS (
          SELECT doc_id, lang, plang
          FROM documents, (SELECT DISTINCT plang FROM profiles)),
        allscores AS (
          SELECT b.doc_id, b.lang, b.plang, coalesce(s.score, 0) AS score
          FROM base b LEFT JOIN scores s
            ON s.doc_id = b.doc_id AND s.plang = b.plang),
        best AS (
          SELECT doc_id, lang, plang FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, plang) AS brank
            FROM allscores)
          WHERE brank = 1)
        SELECT lang, plang AS predicted, count(*) AS n
        FROM best GROUP BY 1, 2 ORDER BY lang, predicted""")),

    // ---------------------------------------------------------------- t02
    // Quality scoring: word stats, stopword ratio, digit ratio, and a
    // deterministic composite score.
    QueryDef(
      "t02_quality_score",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("ws", expr("split(text, ' ')"))
          .withColumn("n_words", expr("cast(size(ws) AS bigint)"))
          .withColumn("n_distinct_words", expr("cast(size(array_distinct(ws)) AS bigint)"))
          .withColumn("stop_hits", expr(
            "cast(size(filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS bigint)"))
          .withColumn("n_digits", expr(
            "cast(length(regexp_replace(text, '[^0-9]', '')) AS bigint)"))
          .withColumn("avg_word_len",
            (expr("length(text)") - ($"n_words" - 1)).cast("double") / $"n_words")
          .withColumn("stop_ratio", $"stop_hits".cast("double") / $"n_words")
          .withColumn("digit_ratio", $"n_digits".cast("double") / expr("length(text)"))
          .withColumn("quality",
            $"stop_ratio" * 0.5 +
            ($"n_distinct_words".cast("double") / $"n_words") * 0.5 -
            $"digit_ratio")
          .select($"doc_id", $"n_words", $"n_distinct_words", $"stop_hits",
                  $"avg_word_len", $"stop_ratio", $"digit_ratio", $"quality")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id, n_words, n_distinct_words, stop_hits, avg_word_len,
               stop_ratio, digit_ratio,
               stop_ratio * 0.5 + (CAST(n_distinct_words AS DOUBLE) / n_words) * 0.5 - digit_ratio AS quality
        FROM (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS n_words,
                 CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
                 CAST(len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS stop_hits,
                 CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws) AS avg_word_len,
                 CAST(len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) / len(ws) AS stop_ratio,
                 CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio
          FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents))
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- t03
    // Token counting: whitespace tokens, BPE-ish regex tokens, and the
    // chars/4 heuristic.
    QueryDef(
      "t03_token_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("n_ws_tokens", expr("cast(size(split(text, ' ')) AS bigint)"))
          .withColumn("n_re_tokens", expr(
            "cast(size(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+|[^ a-z0-9]+', 0)) AS bigint)"))
          .withColumn("est_bpe_tokens", expr("cast(ceil(length(text) / 4.0) AS bigint)"))
          .select($"doc_id", $"n_ws_tokens", $"n_re_tokens", $"est_bpe_tokens")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+|[^ a-z0-9]+')) AS BIGINT) AS n_re_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------- t04
    // Document fingerprinting: a char-level polynomial rolling hash
    // (sequential fold — identical left-to-right evaluation in both
    // engines) plus a winnowing-style min-shingle md5.
    QueryDef(
      "t04_doc_fingerprint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("poly_hash", expr(
            """aggregate(transform(split(text, ''), c -> ascii(c)),
              |  cast(0 AS bigint), (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin))
          .withColumn("min_shingle_md5", expr(
            """array_min(transform(sequence(1, greatest(length(text) - 4, 1)),
              |  i -> md5(substr(text, i, 5))))""".stripMargin))
          .select($"doc_id", $"poly_hash", $"min_shingle_md5")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               list_reduce(list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
                           (acc, x) -> (acc * 31 + x) % 1000000007) AS poly_hash,
               list_aggregate(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
                              i -> md5(substr(text, i, 5))), 'min') AS min_shingle_md5
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m01
    // Multimodal audio features through a REAL codec: the payload is a
    // genuine RIFF/WAVE container (8-bit PCM mono; the testdata ships
    // no binary column, so the gate manufactures the container from the
    // text bytes) and the decode step is [[graft.media.Wav.decode]] — a
    // real parser that walks chunks, validates the header, and rejects
    // malformed streams — not a stub. PCM is lossless, so the features
    // over the decoded samples equal the features over the original
    // bytes and the oracle needs no codec.
    QueryDef(
      "m01_multimodal_features",
      (s, dir) => {
        import s.implicits._
        val bin = t(s, dir, "documents")
          // byte-for-byte parity with the codepoint-based oracle needs
          // ASCII payloads: restrict to docs whose UTF-8 byte length
          // equals the character length (the oracle filters identically)
          .filter(octet_length($"text") === length($"text"))
          .select($"doc_id", encode($"text", "utf-8").as("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) =>
            (id, graft.media.Wav.encode(
              graft.media.Wav.Audio(16000, 1, 8, bytes.map(_ & 0xff))))
          }
        bin.mapPartitions { it =>
          it.map { case (id, wav) =>
            val samples = graft.media.Wav.decode(wav).samples // REAL parse
            var sum = 0L
            var i = 0
            while (i < samples.length) { sum += samples(i); i += 1 }
            val first = if (samples.nonEmpty) samples(0).toLong else -1L
            (id, samples.length.toLong, first, sum % 256,
             sum.toDouble / samples.length)
          }
        }.toDF("doc_id", "n_bytes", "first_byte", "checksum", "mean_byte")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
               CAST(list_reduce(list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
                                (a, b) -> a + b) % 256 AS BIGINT) AS checksum,
               CAST(list_reduce(list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
                                (a, b) -> a + b) AS DOUBLE) / length(text) AS mean_byte
        FROM documents WHERE strlen(text) = length(text)
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- m02
    // Multimodal frame pipeline through a REAL codec: the "video" is a
    // genuine PNG (8-bit greyscale, 4 px wide, one 4x4 frame per 4
    // rows, Paeth-filtered rows, built from the text bytes — the
    // testdata ships no binary column) and the decode step is
    // [[graft.media.Png.decode]]: chunk walk with CRC verification,
    // zlib inflate, per-row unfiltering — not a stub. PNG is lossless,
    // so frame sampling (every 4th), the 2x2 mean-pool "resize", and
    // the per-doc summary compute over exactly the original bytes and
    // the oracle needs no codec. Every arithmetic step is an integer
    // sum followed by one double division, replicated exactly in the
    // oracle, so features are bit-identical.
    QueryDef(
      "m02_multimodal_frames",
      (s, dir) => {
        import s.implicits._
        val bin = t(s, dir, "documents")
          // byte-for-byte parity with the codepoint-based oracle needs
          // ASCII payloads: restrict to docs whose UTF-8 byte length
          // equals the character length (the oracle filters identically)
          .filter(octet_length($"text") === length($"text"))
          .select($"doc_id", encode($"text", "utf-8").as("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, bytes) =>
            val nF = bytes.length / 16
            val png =
              if (nF < 1) Array.empty[Byte]
              else graft.media.Png.encode(
                graft.media.Png.Image(4, 4 * nF, 1, bytes.take(nF * 16)),
                filter = 4)
            (id, png)
          }
        bin.mapPartitions { it =>
          it.flatMap { case (id, png) =>
            if (png.isEmpty) Iterator.empty
            else {
              val img = graft.media.Png.decode(png) // REAL parse
              val bytes = img.pixels
              val nFrames = bytes.length / 16
              val sampled = (0 until nFrames).filter(_ % 4 == 0)
              def pool(f: Int, q: Int): Double = {
                // 2x2 mean pool of the 4x4 row-major frame; quadrant q
                val base = f * 16 + (q / 2) * 8 + (q % 2) * 2
                ((bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
                  (bytes(base + 4) & 0xff) + (bytes(base + 5) & 0xff)) / 4.0
              }
              def frameMean(f: Int): Double =
                (pool(f, 0) + pool(f, 1) + pool(f, 2) + pool(f, 3)) / 4.0
              val means = sampled.map(frameMean)
              Iterator((id, nFrames.toLong, sampled.length.toLong,
                pool(sampled.head, 0), means.sum / means.length))
            }
          }
        }.toDF("doc_id", "n_frames", "n_sampled", "first_pool", "mean_pooled")
          .orderBy($"doc_id")
      },
      Some("""
        WITH b AS (SELECT doc_id,
                          list_transform(string_split(text, ''), c -> ascii(c)) AS bytes,
                          length(text) // 16 AS n_frames
                   FROM documents WHERE strlen(text) = length(text)),
        f AS (SELECT doc_id, bytes, n_frames,
                     list_filter(range(0, n_frames), j -> j % 4 = 0) AS sampled
              FROM b WHERE n_frames >= 1),
        p AS (SELECT doc_id, bytes, n_frames, sampled,
                     list_transform(sampled, j ->
                       ((bytes[j*16+1] + bytes[j*16+2] + bytes[j*16+5] + bytes[j*16+6]) / 4.0
                      + (bytes[j*16+3] + bytes[j*16+4] + bytes[j*16+7] + bytes[j*16+8]) / 4.0
                      + (bytes[j*16+9] + bytes[j*16+10] + bytes[j*16+13] + bytes[j*16+14]) / 4.0
                      + (bytes[j*16+11] + bytes[j*16+12] + bytes[j*16+15] + bytes[j*16+16]) / 4.0) / 4.0) AS means
              FROM f)
        SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
               CAST(len(sampled) AS BIGINT) AS n_sampled,
               (bytes[sampled[1]*16+1] + bytes[sampled[1]*16+2]
              + bytes[sampled[1]*16+5] + bytes[sampled[1]*16+6]) / 4.0 AS first_pool,
               list_reduce(means, (a, b) -> a + b) / len(means) AS mean_pooled
        FROM p ORDER BY doc_id""")),

    // ---------------------------------------------------------------- t07
    // PII detection + redaction — the scrub step a training corpus runs
    // before anything ships. The synthetic corpus carries no PII, so the
    // query first INJECTS deterministic addresses/phones (a pure
    // function of doc_id, built identically in both engines), then
    // counts matches and hashes the redacted text — detection,
    // replacement, and ordering semantics all land in the oracle
    // comparison. Patterns use only class/quantifier constructs whose
    // semantics agree between Java regex (Spark) and RE2 (DuckDB), and
    // enter the plan as Column literals, never spliced SQL. Map-only at
    // any scale: no shuffle, no state.
    // ---------------------------------------------------------------- t08
    // The composed Gopher-style document filter — the verdict a real
    // pipeline materializes from the t02/t06 signal family: five
    // heuristic gates (length bounds, mean word length, stopword
    // fraction, distinct-word fraction, digit fraction) fold into a
    // reason BITMASK per document plus the keep verdict. One narrow
    // pass, no explode (higher-order array functions only), no
    // shuffle before the final order-by. Every ratio is a per-row
    // division of exact integers, so thresholds compare identically
    // on both engines.
    QueryDef(
      "t08_filter_verdict",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("f", expr(
            """element_at(transform(array(split(text, ' ')), ws -> named_struct(
              |  'n_words', cast(size(ws) AS bigint),
              |  'sum_wlen', cast(aggregate(ws, 0, (a, w) -> a + length(w)) AS bigint),
              |  'n_stop', cast(size(filter(ws,
              |     w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS bigint),
              |  'n_distinct', cast(size(array_distinct(ws)) AS bigint))), 1)""".stripMargin))
          .withColumn("n_digits",
            expr("cast(length(regexp_replace(text, '[^0-9]', '')) AS bigint)"))
          .withColumn("reasons",
            when($"f.n_words" < 50 || $"f.n_words" > 100000, lit(1L)).otherwise(lit(0L)) +
            when($"f.sum_wlen".cast("double") / $"f.n_words" < 3.0 ||
                 $"f.sum_wlen".cast("double") / $"f.n_words" > 10.0, lit(2L)).otherwise(lit(0L)) +
            when($"f.n_stop".cast("double") / $"f.n_words" < 0.02, lit(4L)).otherwise(lit(0L)) +
            when($"f.n_distinct".cast("double") / $"f.n_words" < 0.5, lit(8L)).otherwise(lit(0L)) +
            when($"n_digits".cast("double") / length($"text") > 0.2, lit(16L)).otherwise(lit(0L)))
          .select($"doc_id", $"f.n_words".as("n_words"), $"reasons",
            ($"reasons" === 0L).as("keep"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH f AS (SELECT doc_id, text,
                          string_split(text, ' ') AS ws,
                          CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits
                   FROM documents),
        m AS (SELECT doc_id, text, n_digits,
                     CAST(len(ws) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_wlen,
                     CAST(len(list_filter(ws,
                       w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS n_stop,
                     CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
              FROM f)
        SELECT doc_id, n_words, reasons, reasons = 0 AS keep FROM (
          SELECT doc_id, n_words,
                 (CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END
                + CASE WHEN CAST(sum_wlen AS DOUBLE) / n_words < 3.0
                         OR CAST(sum_wlen AS DOUBLE) / n_words > 10.0 THEN 2 ELSE 0 END
                + CASE WHEN CAST(n_stop AS DOUBLE) / n_words < 0.02 THEN 4 ELSE 0 END
                + CASE WHEN CAST(n_distinct AS DOUBLE) / n_words < 0.5 THEN 8 ELSE 0 END
                + CASE WHEN CAST(n_digits AS DOUBLE) / length(text) > 0.2 THEN 16 ELSE 0 END
                 )::BIGINT AS reasons
          FROM m)
        ORDER BY doc_id""")),

    QueryDef(
      "t07_pii_redact",
      (s, dir) => {
        import s.implicits._
        val email = "[a-z0-9._]+@[a-z0-9.-]+"
        val phone = "\\+[0-9]{1,3}-[0-9]{6,12}"
        val aug = concat($"text", lit(" contact user"),
          $"doc_id".cast("string"), lit("@mail.example or +1-"),
          lpad(($"doc_id" * 7919 % 100000000).cast("string"), 8, "0"),
          lit(" "), expr("repeat('x@y.io ', cast(doc_id % 3 AS int))"))
        t(s, dir, "documents").withColumn("aug", aug)
          .select($"doc_id",
            size(regexp_extract_all($"aug", lit(email), lit(0)))
              .cast("long").as("n_emails"),
            size(regexp_extract_all($"aug", lit(phone), lit(0)))
              .cast("long").as("n_phones"),
            md5(regexp_replace(
              regexp_replace($"aug", email, "<EMAIL>"), phone, "<PHONE>"))
              .as("redacted_md5"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                 '@mail.example or +1-' ||
                 lpad(CAST((doc_id * 7919) % 100000000 AS VARCHAR), 8, '0') ||
                 ' ' || repeat('x@y.io ', CAST(doc_id % 3 AS INT)) AS a
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(a, '[a-z0-9._]+@[a-z0-9.-]+')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(a, '\+[0-9]{1,3}-[0-9]{6,12}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(
                 regexp_replace(a, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                 '\+[0-9]{1,3}-[0-9]{6,12}', '<PHONE>', 'g')) AS redacted_md5
        FROM aug ORDER BY doc_id""")),

    // ---------------------------------------------------------------- t06
    // Repetition-ratio quality signals (the Gopher-style repetition
    // filters real pretraining pipelines gate on): most-frequent-word
    // share and duplicate-bigram fraction per document, plus the filter
    // verdict. Distributed shape: explode → two-level aggregation, one
    // shuffle per n-gram order; nothing is per-document quadratic.
    QueryDef(
      "t06_repetition_stats",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", expr("split(text, ' ')").as("ws"))
        val wstats = docs
          .select($"doc_id", explode($"ws").as("w"))
          .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_words"), max($"c").as("top_c"))
        val bstats = docs
          .select($"doc_id", explode(expr(
            "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
              " (a, b) -> concat(a, ' ', b))")).as("b"))
          .groupBy($"doc_id", $"b").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_bigrams"),
               count(lit(1)).as("n_distinct_bigrams"))
        wstats.join(bstats, "doc_id")
          .withColumn("top_word_frac", $"top_c".cast("double") / $"n_words")
          .withColumn("dup_bigram_frac",
            lit(1.0) - $"n_distinct_bigrams".cast("double") / $"n_bigrams")
          .withColumn("repetitive",
            ($"top_word_frac" > 0.2) || ($"dup_bigram_frac" > 0.5))
          .select($"doc_id", $"n_words", $"top_c", $"n_bigrams",
            $"n_distinct_bigrams", $"top_word_frac", $"dup_bigram_frac",
            $"repetitive")
          .orderBy($"doc_id")
      },
      Some("""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        wc AS (SELECT doc_id, w, count(*) AS c
               FROM (SELECT doc_id, unnest(ws) AS w FROM ws) GROUP BY 1, 2),
        wstats AS (SELECT doc_id, sum(c) AS n_words, max(c) AS top_c
                   FROM wc GROUP BY doc_id),
        bg AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i + 1])) AS b
               FROM ws),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        bstats AS (SELECT doc_id, sum(c) AS n_bigrams,
                          count(*) AS n_distinct_bigrams
                   FROM bc GROUP BY doc_id)
        SELECT w.doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(top_c AS BIGINT) AS top_c,
               CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(n_distinct_bigrams AS BIGINT) AS n_distinct_bigrams,
               CAST(top_c AS DOUBLE) / n_words AS top_word_frac,
               1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_frac,
               (CAST(top_c AS DOUBLE) / n_words > 0.2)
                 OR (1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams > 0.5) AS repetitive
        FROM wstats w JOIN bstats USING (doc_id)
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- t09
    // Corpus-wide boilerplate detection: the 20 most document-frequent
    // 3-word shingles (nav bars, cookie banners, license headers — the
    // spans a curation pass strips before training). Shingles are
    // distinct within a doc, so the count IS document frequency. One
    // explode → one shuffle of (shingle, partial count) with map-side
    // combine; the top-20 is a TakeOrdered over the aggregated (tiny)
    // side — no global sort of the corpus at any scale.
    QueryDef(
      "t09_boilerplate_ngrams",
      (s, dir) => {
        import s.implicits._
        shingled(s, dir)
          .select(explode($"shingles").as("sg"), $"lang")
          .groupBy($"sg")
          .agg(count(lit(1)).as("df"), countDistinct($"lang").as("n_langs"))
          .orderBy($"df".desc, $"sg")
          .limit(20)
      },
      Some(s"""
        $DUCK_SHINGLE_CTE,
        ex AS (SELECT lang, unnest(shingles) AS sg FROM sh)
        SELECT sg, CAST(count(*) AS BIGINT) AS df,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM ex GROUP BY sg ORDER BY df DESC, sg LIMIT 20""")),

    // ---------------------------------------------------------------- t10
    // Retrieval-style chunking: slice each document's token stream into
    // fixed-width windows (W=16 whitespace tokens) advancing by a
    // stride (S=12, a 4-token overlap) — the unit a RAG/embedding
    // pipeline feeds the encoder. The window count is closed-form
    // (1 + ceil((n-W)/S) for n>W, computed in exact integer math so
    // float rounding can never drop a tail window), so the per-doc
    // index list materializes with sequence() + one explode: no
    // self-join, no per-row UDF, and the whole op is a narrow
    // projection — zero shuffles at any corpus size. Emits the chunk's
    // md5 (not its text) so the verify surface stays narrow at scale.
    QueryDef(
      "t10_chunk_overlap",
      (s, dir) => {
        import s.implicits._
        val (w, st) = (16, 12)
        t(s, dir, "documents")
          .withColumn("toks", split($"text", " "))
          .withColumn("n", size($"toks"))
          .withColumn("n_chunks", expr(
            s"1 + CASE WHEN n > $w THEN (n - $w + ${st - 1}) div $st ELSE 0 END"))
          .withColumn("chunk_idx",
            explode(expr("sequence(cast(0 AS bigint), cast(n_chunks - 1 AS bigint))")))
          .withColumn("win", expr(s"slice(toks, cast(chunk_idx * $st + 1 AS int), $w)"))
          .select($"doc_id", $"chunk_idx",
            expr("cast(size(win) AS bigint)").as("n_chunk_tokens"),
            md5(expr("array_join(win, ' ')")).as("chunk_md5"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents),
        cnt AS (
          SELECT doc_id, toks,
                 1 + CASE WHEN n > 16 THEN (n - 16 + 11) // 12 ELSE 0 END AS n_chunks
          FROM tok)
        SELECT doc_id, i AS chunk_idx,
               CAST(len(toks[i*12+1 : i*12+16]) AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(toks[i*12+1 : i*12+16], ' ')) AS chunk_md5
        FROM cnt, unnest(range(n_chunks)) AS t(i)
        ORDER BY doc_id, chunk_idx""")),

    // ---------------------------------------------------------------- d10
    // Incremental dedup: a NEW batch (doc_id % 5 == 0 stands in for the
    // nightly increment) dedups against the EXISTING corpus without
    // re-deduping the corpus itself — the production shape, where the
    // corpus side reduces to (fingerprint, survivor) pairs once and
    // only fingerprints ever shuffle. A batch doc is 'dup_vs_corpus'
    // if its content hash exists in the corpus, 'dup_in_batch' if an
    // earlier batch doc shares it, else 'new'; survivor_id names the
    // canonical copy in every case.
    QueryDef(
      "d10_dedup_incremental",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", md5(lower(trim($"text"))).as("fp"))
        val corpus = docs.filter($"doc_id" % 5 =!= 0)
          .groupBy($"fp").agg(min($"doc_id").as("corpus_id"))
        val batch = docs.filter($"doc_id" % 5 === 0)
          .withColumn("batch_min",
            min($"doc_id").over(Window.partitionBy($"fp")))
        batch.join(corpus, Seq("fp"), "left")
          .select($"doc_id",
            when($"corpus_id".isNotNull, lit("dup_vs_corpus"))
              .when($"batch_min" < $"doc_id", lit("dup_in_batch"))
              .otherwise(lit("new")).as("verdict"),
            when($"corpus_id".isNotNull, $"corpus_id")
              .when($"batch_min" < $"doc_id", $"batch_min")
              .otherwise($"doc_id").as("survivor_id"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents),
        corpus AS (SELECT fp, min(doc_id) AS corpus_id FROM d
                   WHERE doc_id % 5 <> 0 GROUP BY fp),
        batch AS (SELECT doc_id, fp,
                         min(doc_id) OVER (PARTITION BY fp) AS batch_min
                  FROM d WHERE doc_id % 5 = 0)
        SELECT b.doc_id,
               CASE WHEN corpus_id IS NOT NULL THEN 'dup_vs_corpus'
                    WHEN batch_min < b.doc_id THEN 'dup_in_batch'
                    ELSE 'new' END AS verdict,
               CASE WHEN corpus_id IS NOT NULL THEN corpus_id
                    WHEN batch_min < b.doc_id THEN batch_min
                    ELSE b.doc_id END AS survivor_id
        FROM batch b LEFT JOIN corpus USING (fp)
        ORDER BY b.doc_id""")),

    // ---------------------------------------------------------------- d11
    // d04's LSH banding with the (bands, rows) split SIZED FROM THE
    // TARGET JACCARD instead of hardcoded — [[autoMinhashBands]] picks
    // the divisor pair of the 16-lane signature whose S-curve midpoint
    // (1/b)^(1/r) is closest to t=0.7, here 4 bands x 4 rows (vs
    // d04's 4x2 at t=0.5 over 8 lanes). Same one-shuffle shape: bands
    // carry only (doc_id, band) — content never rides the band join —
    // candidates dedup before the sorted-hash verify, exact jaccard on
    // the survivors. The oracle derives the SAME (b, r) in SQL (argmin
    // over the divisor pairs of 16), so nothing is hardcoded twice.
    QueryDef(
      "d11_minhash_auto_bands",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        val (b, r) = autoMinhashBands(16, 0.7)
        // shared persisted working set (see shingleBase): one shingle
        // pass feeds the 16-lane signature branch AND the verify joins
        val sh = shingleBase(s, dir)
        // persisted: the 16-lane signature pass (4 md5/shingle) feeds
        // both self-join sides from one materialization
        val bands = sh
          .selectExpr("doc_id", s"$MINHASH16_SIGS_EXPR AS sigs")
          .select(col("doc_id"), posexplode(expr(
            s"""element_at(transform(array(sigs), sg ->
               |  transform(sequence(0, ${b - 1}),
               |    i -> concat_ws('', slice(sg, i * $r + 1, $r)))), 1)"""
              .stripMargin)))
          .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band")
          .scopedPersist()
        val cand = bands.as("a")
          .join(bands.as("b"), Seq("band_idx", "band"))
          .filter($"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
          .distinct()
        graft.functions.GraftFunctions.register(s)
        val hsets = sh.select($"doc_id", $"hsh", $"sz")
        cand
          .join(hsets.select($"doc_id".as("id_a"), $"hsh".as("h_a"), $"sz".as("sz_a")), "id_a")
          .join(hsets.select($"doc_id".as("id_b"), $"hsh".as("h_b"), $"sz".as("sz_b")), "id_b")
          .withColumn("inter", expr("sorted_intersect_count(h_a, h_b)"))
          .withColumn("jaccard", $"inter".cast("double") /
            ($"sz_a" + $"sz_b" - $"inter"))
          .select($"id_a", $"id_b", $"jaccard")
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        $DUCK_SHINGLE_CTE,
        sig AS (SELECT doc_id, shingles,
                       list_transform(range(0, 16),
                         k -> list_aggregate(list_transform(
                                list_transform(shingles,
                                  s -> md5((k // 4)::VARCHAR || '|' || s)),
                                d -> substr(d, (k % 4) * 8 + 1, 8)), 'min')) AS sigs
                FROM sh),
        choice AS (SELECT b, r
                   FROM (VALUES (1, 16), (2, 8), (4, 4), (8, 2), (16, 1)) t(b, r)
                   ORDER BY abs(pow(1.0 / b, 1.0 / r) - 0.7), b LIMIT 1),
        bands AS (SELECT doc_id, i AS band_idx,
                         array_to_string(
                           sigs[(i * (SELECT r FROM choice) + 1):
                                ((i + 1) * (SELECT r FROM choice))], '') AS band
                  FROM sig,
                       unnest(range((SELECT b FROM choice))) AS t(i)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band_idx = b.band_idx AND a.band = b.band
                  AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
               (len(x.shingles) + len(y.shingles) - len(list_intersect(x.shingles, y.shingles))) AS jaccard
        FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
        ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- d12
    // The PRODUCTION dedup job, composed end-to-end in ONE lineage:
    // d04's MinHash-LSH candidates (bands ship (doc_id, band) only,
    // dedup before any payload moves) → exact-Jaccard verification at
    // t=0.5 through the codegen'd sorted-hash merge → d07's
    // pointer-doubling connected components over the verified edges →
    // d08's quality-based survivor selection, one row per component.
    // Each stage's scale posture is inherited from its gated original;
    // what this gate pins is the COMPOSITION — label propagation over
    // LSH-derived (not all-pairs) edges, and survivor aggregation over
    // component labels. The oracle replays the same candidates, a
    // recursive reachability CTE, and the same lexicographic survivor
    // rule.
    QueryDef(
      "d12_minhash_dedup_pipeline",
      (s, dir) => CacheScope.scoped(s) {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        // shared persisted working set (see shingleBase): the candidate,
        // verify, and component stages all read the one materialization —
        // the composition amortizes the shingle pass by construction
        val sh = shingleBase(s, dir)
        // persisted band table (same plan as d04's — the suite
        // materializes it once): one signature pass, two join sides
        val bands = minhashBands(sh.select($"doc_id", $"shingles"))
          .scopedPersist()
        val cand = bands.as("a")
          .join(bands.as("b"), Seq("band_idx", "band"))
          .filter($"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
          .distinct()
        val hsets = sh.select($"doc_id", $"hsh", $"sz")
        val edges = cand
          .join(hsets.select($"doc_id".as("id_a"), $"hsh".as("h_a"), $"sz".as("sz_a")), "id_a")
          .join(hsets.select($"doc_id".as("id_b"), $"hsh".as("h_b"), $"sz".as("sz_b")), "id_b")
          .withColumn("inter", expr("sorted_intersect_count(h_a, h_b)"))
          .filter($"inter".cast("double") /
            ($"sz_a" + $"sz_b" - $"inter") >= 0.5)
          .select($"id_a".as("u"), $"id_b".as("v"))
        val (labels, _) = connectedComponents(s, edges)
        val quality = Tables.tPar(s, dir, "documents")
          .withColumn("ws", expr("split(text, ' ')"))
          .withColumn("nw", expr("cast(size(ws) AS bigint)"))
          .withColumn("quality",
            (expr("cast(size(filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS bigint)")
              .cast("double") / $"nw") * 0.5 +
            (expr("cast(size(array_distinct(ws)) AS bigint)").cast("double") / $"nw") * 0.5 -
            expr("cast(length(regexp_replace(text, '[^0-9]', '')) AS bigint)")
              .cast("double") / expr("length(text)"))
          .select($"doc_id", $"quality")
        labels.join(quality, "doc_id")
          .groupBy($"label")
          .agg(max(struct($"quality", (-$"doc_id").as("negid"))).as("m"),
               count(lit(1)).as("n_members"))
          .select($"label".as("component_id"),
            (-$"m.negid").cast("long").as("survivor_id"),
            $"m.quality".as("quality"), $"n_members")
          .orderBy($"component_id")
      },
      Some(s"""
        ${DUCK_SHINGLE_CTE.replace("WITH w", "WITH RECURSIVE w")},
        sig AS (SELECT doc_id, shingles,
                       list_transform(range(0, 8),
                         k -> list_aggregate(list_transform(
                                list_transform(shingles,
                                  s -> md5((k // 4)::VARCHAR || '|' || s)),
                                d -> substr(d, (k % 4) * 8 + 1, 8)), 'min')) AS sigs
                FROM sh),
        bands AS (SELECT doc_id, b AS band_idx,
                         sigs[2*b+1] || sigs[2*b+2] AS band
                  FROM sig, unnest([0, 1, 2, 3]) AS t(b)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band_idx = b.band_idx AND a.band = b.band
                  AND a.doc_id < b.doc_id),
        pairs AS (SELECT id_a, id_b FROM (
          SELECT id_a, id_b,
                 CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
                 (len(x.shingles) + len(y.shingles) - len(list_intersect(x.shingles, y.shingles))) AS jaccard
          FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
          WHERE jaccard >= 0.5),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        verts AS (SELECT DISTINCT u AS doc_id FROM edges),
        reach AS (
          SELECT doc_id, doc_id AS r FROM verts
          UNION
          SELECT reach.doc_id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
        lbl AS (SELECT doc_id, min(r) AS component_id FROM reach GROUP BY doc_id),
        q AS (SELECT doc_id,
                     (CAST(len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) / len(ws)) * 0.5
                   + (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) * 0.5
                   - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS quality
              FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)),
        j AS (SELECT lbl.component_id, lbl.doc_id, q.quality
              FROM lbl JOIN q USING (doc_id)),
        g AS (SELECT component_id, max(quality) AS mq, count(*) AS n_members
              FROM j GROUP BY 1)
        SELECT g.component_id, min(j.doc_id) AS survivor_id,
               any_value(g.mq) AS quality,
               any_value(g.n_members) AS n_members
        FROM j JOIN g ON j.component_id = g.component_id
                     AND j.quality = g.mq
        GROUP BY g.component_id ORDER BY g.component_id"""))
  )
}

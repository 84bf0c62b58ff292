package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Analyzer, TextFeatures}

/** Deduplication operators for training-data pipelines, each expressed as
  * a declarative Spark plan (Catalyst optimizes; only the hash math runs
  * in typed transforms).
  *
  * Scale notes per operator are inline — the common theme: candidate
  * generation is always a *bucket equi-join* (shuffle on a short key),
  * never an O(n²) cross join; exact verification runs only within
  * buckets.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id doc per identical text.
    * Plan: single hash aggregation on xxhash64(text) — at 10^12 rows this
    * is one shuffle of (hash, min_id), with map-side partial aggregation;
    * we group by the 64-bit hash, not the full text, so shuffle rows are
    * ~16 bytes (hash collisions at 64 bit over 10^12 docs: ~0.03 expected
    * — acceptable for dedup; use a 128-bit pair of hashes if not).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash + LSH near-dedup: shingle → k-minhash → band buckets →
    * bucket join → exact-Jaccard verify ≥ threshold.
    * Returns candidate duplicate pairs (id_a < id_b) with their exact
    * Jaccard. Shuffles: one explode+groupBy on band keys (rows = docs ×
    * bands, key cardinality huge → even distribution), pairs generated
    * only within buckets.
    *
    * EXACT-DUP PRE-COLLAPSE: web corpora are dup-heavy, and m byte-equal
    * copies in one band bucket would alone yield m²/2 candidate pairs.
    * So docs group by text hash FIRST; only one representative per group
    * enters banding (bucket blowup is now bounded by distinct-text
    * collisions), and pairs expand afterwards from group membership:
    * within-group pairs get Jaccard 1.0 with no verification at all, and
    * each rep-level near-dup pair expands to the groups' cross product —
    * output semantics unchanged (the expansion IS the answer), internal
    * candidate volume collapsed.
    */
  def minHashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    val base = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("txt"))
    // exact-dup groups: gid = lowest member id. All-rows shapes (no
    // collect_set — a hot group must never become one giant array row):
    // members is an equi-join of (group key, id) with the per-group min.
    // Group key = TWO independent 64-bit hashes (different seed via the
    // extra literal) + text length: a single xxhash64 has ~10^4 expected
    // birthday collisions at the 10^12-doc target (ADVICE r3), each of
    // which would emit a false jaccard-1.0 pair AND suppress the victim
    // from banding; a 128-bit+length key pushes that below 10^-13 —
    // byte-compare-grade without shipping texts through the shuffle.
    val gkey = Seq($"h1", $"h2", $"len")
    // ONE exchange by the group key — (hashes, len, id) rows only, ~28
    // bytes each — shared by the min-aggregate and the membership join
    // (ReuseExchange; guide §2.4). Texts NEVER shuffle: the old shape
    // carried txt through this exchange just so the rep rows could keep
    // it; a rep is by definition the doc whose id == gid, so reps join
    // base on the ID instead (gid side is tiny → broadcast).
    val hashed = base.select(
      xxhash64($"txt").as("h1"),
      xxhash64(lit(0x9e3779b9L), $"txt").as("h2"),
      length($"txt").as("len"),
      $"id")
      .repartition($"h1", $"h2", $"len")
    val gmin = hashed.groupBy(gkey: _*).agg(min($"id").as("gid"))
    val members = hashed.join(gmin, Seq("h1", "h2", "len")).select($"gid", $"id")
    val reps = base.join(gmin.select($"gid"), $"id" === $"gid")
      .select($"gid", $"txt")

    val sigs = reps
      .as[(Long, String)]
      .map { case (gid, text) =>
        val sh = TextFeatures.shingles(Analyzer.tokenize(text), 3)
        val sig = TextFeatures.minHash(sh, numHashes)
        (gid, sh, TextFeatures.bandKeys(sig, bands, rows))
      }
      .toDF("gid", "shingles", "bandkeys")

    // candidate pairs on BARE rep IDs (16 bytes/row through the
    // join+distinct); shingle payloads join back only for the surviving
    // distinct pairs — a pair colliding in several bands would otherwise
    // drag its two shingle arrays through the shuffle once per collision.
    val banded = sigs.select($"gid", explode($"bandkeys").as("band"))
    val a = banded.select($"band", $"gid".as("g_a"))
    val b = banded.select($"band", $"gid".as("g_b"))
    val candidates = a.join(b, Seq("band"))
      .where($"g_a" < $"g_b")
      .select($"g_a", $"g_b")
      .distinct()
    val sh = sigs.select($"gid", $"shingles")
    val repPairs = candidates
      .join(sh.select($"gid".as("g_a"), $"shingles".as("sh_a")), "g_a")
      .join(sh.select($"gid".as("g_b"), $"shingles".as("sh_b")), "g_b")
      .select($"g_a", $"g_b", $"sh_a", $"sh_b")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (ga, gb, sa, sb) => (ga, gb, TextFeatures.jaccard(sa, sb)) }
      .toDF("g_a", "g_b", "jaccard")
      .where($"jaccard" >= threshold)

    // expansion (equi-joins on group ids):
    //  - within-group: identical texts, Jaccard exactly 1.0 (threshold is
    //    ≤ 1.0 by contract so they always qualify)
    //  - cross-group: every (member of g_a) × (member of g_b), reoriented
    //    so id_a < id_b
    val within = members.as("x")
      .join(members.as("y"), "gid")
      .where($"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b"), lit(1.0).as("jaccard"))
    val cross = repPairs
      .join(members.select($"gid".as("g_a"), $"id".as("m_a")), "g_a")
      .join(members.select($"gid".as("g_b"), $"id".as("m_b")), "g_b")
      .select(
        least($"m_a", $"m_b").as("id_a"),
        greatest($"m_a", $"m_b").as("id_b"),
        $"jaccard"
      )
    within.unionByName(cross)
  }

  /** Connected components over a near-dup PAIR set → one canonical doc
    * per duplicate cluster (cluster_id = min member id) — the step a real
    * training pipeline runs after pair generation: transitive duplicates
    * (A≈B, B≈C) must collapse to ONE kept doc even when A≉C directly.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * textbook MR-CC). Each round is two equi-join + min-aggregate passes
    * over the edge set, lineage cut by localCheckpoint; convergence takes
    * O(log d) rounds instead of the d rounds of plain min-label
    * propagation, so CHAIN-shaped near-dup graphs (templated page series
    * — page-2 ≈ page-3 ≈ page-4 …) converge in ~7 rounds at diameter
    * 100, not 100. Dense dup-cluster graphs (the common case) converge in
    * 1–2 rounds either way. Errors loudly if maxIter rounds don't
    * converge.
    *
    *   - large-star: every node links each strictly-LARGER neighbor to
    *     the minimum of its closed neighborhood;
    *   - small-star: every node links its smaller-or-equal neighbors
    *     (and itself) to that minimum.
    *
    * At the fixed point the edge set is a star forest — every non-root
    * points directly at its component's minimum id, which becomes
    * `cluster_id`.
    *
    * `nodes` supplies the full id universe: pairless docs come out as
    * their own singleton clusters (the common case — most of a corpus is
    * unique). Pair endpoints are UNIONED into the universe rather than
    * trusted to be a subset of `nodes` — an endpoint missing from `nodes`
    * (a caller bug under the documented contract) still labels correctly
    * instead of silently splitting the components it bridges.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      nodes: DataFrame,
      nodeCol: String,
      maxIter: Int = 30
  ): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // edges oriented big→small (u > v), deduped — the small-star invariant.
    // Checkpointed ONCE: everything downstream (rounds AND the node-
    // universe union) reads the materialized edges, so an expensive pair
    // pipeline (LSH banding, shingle joins) never re-executes.
    val e0 = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where($"a" =!= $"b")
      .select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
      .distinct()
      .localCheckpoint()
    var e = e0

    // Exchange discipline (r6 opt round, guide §2.4): each star step
    // repartitions its input by u ONCE; the min-aggregate AND the
    // neighbor join both consume that same hash partitioning (a groupBy
    // whose keys contain the partitioning expr and an equi-join keyed on
    // it need no further exchange), so a round costs 3 exchanges — the
    // two star repartitions plus the final distinct — where the naive
    // composition paid ~6 (separate exchanges for each groupBy, join
    // side, and an intra-round distinct).

    // large-star: undirected view; for each u emit (bigger-neighbor → min
    // of closed neighborhood). Output stays big→small oriented because
    // the emitted source is strictly larger than u ≥ m. NOT deduped here:
    // small-star's min is duplicate-insensitive and the round's final
    // distinct restores the set invariant — dropping the intra-round
    // distinct removes a whole exchange, and the dup volume is bounded by
    // the (already-distinct) undirected edge count, never quadratic.
    def largeStar(ed: DataFrame): DataFrame = {
      val und = ed.select($"u", $"v").union(ed.select($"v".as("u"), $"u".as("v")))
        .repartition($"u")
      val mins = und.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      und.join(mins, "u")
        .where($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .where($"u" =!= $"v")
    }

    // small-star: edges already big→small, so min(N(u) ∪ {u}) = min(v);
    // link every smaller neighbor AND u itself to it.
    def smallStar(ed: DataFrame): DataFrame = {
      val edP = ed.repartition($"u")
      val mins = edP.groupBy($"u").agg(min($"v").as("m"))
      edP.join(mins, "u")
        .select($"v".as("n"), $"m")
        .union(mins.select($"u".as("n"), $"m"))
        .where($"n" =!= $"m")
        .select($"n".as("u"), $"m".as("v"))
        .distinct()
    }

    val ccVerbose = sys.env.contains("GRAFT_CC_VERBOSE")
    var t0 = System.nanoTime()
    @inline def lap(label: String): Unit = if (ccVerbose) {
      System.err.println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    var it = 0
    var done = e.isEmpty
    lap("init-isEmpty")
    while (!done && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      lap(s"round-$it checkpoint")
      // both sides distinct + identically oriented, so equal sets ⟺ the
      // symmetric difference is empty ⟺ no (u, v) appears in exactly one
      // side. ONE aggregation job per round (the old shape ran a count
      // job AND an except job — r6, guide §2.4: one exchange instead of
      // the except's two, and isEmpty short-circuits at the first
      // asymmetric row).
      done = next.unionByName(e).groupBy($"u", $"v").count()
        .where($"count" === 1).isEmpty
      lap(s"round-$it converge-check")
      e = next
      it += 1
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds")

    val universe = nodes.select(col(nodeCol).cast("long").as("id"))
      .union(e0.select($"u".as("id")))
      .union(e0.select($"v".as("id")))
      .distinct()
    universe
      .join(e.select($"u".as("id"), $"v".as("root")), Seq("id"), "left")
      .groupBy($"id")
      .agg(min(coalesce($"root", $"id")).as("cluster_id"))
  }

  /** SimHash near-dedup: 64-bit signature, 16-bit-chunk LSH (hamming ≤ 3
    * collides on ≥1 of 4 chunks), verify by exact hamming distance.
    */
  def simHash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val h = TextFeatures.simHash(Analyzer.tokenize(text))
        (id, h, TextFeatures.simHashChunks(h))
      }
      .toDF("id", "sim", "chunks")
    val banded = sigs.select($"id", $"sim", explode($"chunks").as("chunk"))
    val a = banded.select($"chunk", $"id".as("id_a"), $"sim".as("sim_a"))
    val b = banded.select($"chunk", $"id".as("id_b"), $"sim".as("sim_b"))
    a.join(b, Seq("chunk"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sim_a", $"sim_b")
      .distinct()
      .as[(Long, Long, Long, Long)]
      .map { case (ia, ib, sa, sb) => (ia, ib, TextFeatures.hamming(sa, sb)) }
      .toDF("id_a", "id_b", "hamming")
      .where($"hamming" <= maxHamming)
  }

  /** n-gram Jaccard over a candidate join on shared shingles — the
    * non-approximate near-dup baseline. Candidate generation shuffles
    * (shingle, id) pairs; pairs sharing ≥1 shingle get Jaccard via
    * |∩| / (|A| + |B| − |∩|) computed from the join itself (no second
    * pass over texts).
    *
    * Skew guard: shingles with df > maxShingleDf (boilerplate; a shingle
    * shared by m docs yields m² candidate pairs) are dropped BEFORE pair
    * generation, and the Jaccard is exact over the PRUNED shingle space:
    * |∩|, |A|, |B| all count only surviving shingles, so identical docs
    * score exactly 1.0 even when their boilerplate shingles were pruned
    * (sizes from the unpruned sets would silently under-score pairs that
    * share hot shingles — the web-scale regime this targets).
    *
    * The hot-shingle anti-join is a plain shuffle join — NO broadcast
    * hint: over a Common-Crawl-scale corpus the df>threshold shingle set
    * is itself huge and must never be collected to the driver. AQE may
    * still pick a broadcast when the hot side is measurably small.
    */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDf: Long = 1000
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, TextFeatures.shingles(Analyzer.tokenize(text), n))
      }
      .toDF("id", "shingles")
      .where(size($"shingles") > 0)
    // ONE explicit exchange by shingle, reused by every consumer (guide
    // §2.4): the hot-shingle aggregate, the anti-join (both sides), the
    // per-doc sizes, and the pair self-join all need clustering by `sh`,
    // and with the exchange pinned here ReuseExchange makes them share it
    // — the naive shape re-ran the tokenize+shingle+explode subtree and
    // paid a separate 5M-row exchange per consumer.
    val ex = sh.select($"id", explode($"shingles").as("sh")).repartition($"sh")
    val hot = ex.groupBy($"sh").count().where($"count" > maxShingleDf).select($"sh")
    val pruned = ex.join(hot, Seq("sh"), "left_anti")
    // per-doc sizes over the SAME pruned space the intersection counts
    val sizes = pruned.groupBy($"id").agg(count(lit(1)).as("sz"))
    val pairs = pruned.as("x")
      .join(pruned.as("y"), "sh")
      .where($"x.id" < $"y.id")
      .groupBy($"x.id".as("id_a"), $"y.id".as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", $"inter" / ($"sz_a" + $"sz_b" - $"inter"))
      .where($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** Chunk-level exact dedup (the CCNet / RefinedWeb "line-level"
    * pass, adapted to token windows): split each doc into consecutive
    * `chunkTokens`-token chunks (trailing partial kept), hash each, and
    * count per doc how many of its chunk OCCURRENCES are duplicated
    * (global hash multiplicity ≥ 2 — within-doc repeats count). Returns
    * (idCol, n_chunks, n_dup_chunks); callers threshold on the fraction
    * to drop boilerplate-heavy docs.
    *
    * Scale shape: chunking is a codegen'd map (split/slice/transform, no
    * UDF); only (id, hash64) pairs shuffle — 16 bytes per chunk, never
    * the strings; the multiplicity count is a partial-agg groupBy. A
    * 64-bit collision can only OVER-count a duplicate (the conservative
    * direction for a quality filter) — documented, not pretended away.
    */
  def chunkDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 10
  ): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be positive")
    val toks = split(col(textCol), " ")
    val nChunks = floor((size(toks) + lit(chunkTokens - 1)) / lit(chunkTokens)).cast("int")
    val chunks = transform(
      sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")
    )
    // one shared hash exchange for the multiplicity count and the join
    // back (ReuseExchange) — the unpinned shape chunked and hashed the
    // corpus twice
    val ch = docs
      .where(col(textCol) =!= "")
      .select(col(idCol), explode(chunks).as("chunk"))
      .select(col(idCol), xxhash64(col("chunk")).as("h"))
      .repartition(col("h"))
    val counts = ch.groupBy("h").agg(count(lit(1)).as("c"))
    ch.join(counts, "h")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup_chunks")
      )
  }

  // ---- exact-substring span dedup (Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better" — the ExactSubstr
  // variant, re-expressed for a cluster: the paper builds a single-node
  // suffix array; the distributed shape is sliding-window dual-hash
  // bucketing, which finds the identical duplicated-span set for spans
  // ≥ minTokens at O(tokens) map cost and ONE shuffle of 24-byte rows).

  /** Maximal duplicated token spans: every token window of `minTokens`
    * whose exact token sequence occurs ≥2 times corpus-wide (any doc,
    * any position — intra-doc repetition counts, per the paper) is a
    * duplicate window; overlapping/touching duplicate windows within a
    * doc merge into maximal spans. Returns (idCol, span_start,
    * span_end) with token offsets, end exclusive.
    *
    * Scale shape: per-doc ROLLING polynomial dual-hash (two independent
    * 64-bit streams ⇒ ~2⁻¹²⁸ pair-collision odds — same dual-hash
    * discipline as minHashLsh's verify) makes window hashing O(tokens),
    * not O(tokens·minTokens); the only exchange is (h1, h2, id, pos) —
    * 24 bytes per token. Duplicate detection streams each hash bucket
    * lazily (peek-two, then re-chain — no group materialization, so a
    * pathological hot window costs no task memory); span merging sorts
    * per doc (bounded by doc length). No driver collect anywhere.
    */
  def substringSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 50
  ): DataFrame = {
    require(minTokens >= 2, "minTokens must be ≥ 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val L = minTokens

    val windows = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = if (text.isEmpty) Array.empty[String] else text.split(' ')
        val n = toks.length
        if (n < L) Iterator.empty
        else {
          // dual rolling hash: h_{i+1} = (h_i − t_i·B^{L−1})·B + t_{i+L}
          // over 64-bit wrap-around arithmetic (B odd ⇒ invertible)
          val t1 = toks.map(tokenHash64(_, 0x51ed270b9d9aaa73L))
          val t2 = toks.map(tokenHash64(_, 0x27220a95fe1d8b81L))
          var p1 = 1L; var p2 = 1L
          var j = 0
          while (j < L - 1) { p1 *= RollB1; p2 *= RollB2; j += 1 }
          var h1 = 0L; var h2 = 0L
          j = 0
          while (j < L) { h1 = h1 * RollB1 + t1(j); h2 = h2 * RollB2 + t2(j); j += 1 }
          val out = new Array[(Long, Long, Long, Int)](n - L + 1)
          out(0) = (h1, h2, id, 0)
          var i = 1
          while (i <= n - L) {
            h1 = (h1 - t1(i - 1) * p1) * RollB1 + t1(i + L - 1)
            h2 = (h2 - t2(i - 1) * p2) * RollB2 + t2(i + L - 1)
            out(i) = (h1, h2, id, i)
            i += 1
          }
          out.iterator
        }
      }

    val dupPositions = windows
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_, rows) =>
        // emit members only when the bucket holds ≥2 occurrences, WITHOUT
        // materializing it: hot windows ("the the the…"×10⁹) stream
        val first = rows.next()
        if (!rows.hasNext) Iterator.empty
        else Iterator.single(first) ++ rows
      }
      .map(r => (r._3, r._4))

    dupPositions
      .groupByKey(_._1)
      .flatMapGroups { (id, rows) =>
        // islands: windows [a, a+L) and [b, b+L) merge iff b − a ≤ L
        // (overlap or touch) — merged span = [first, last + L)
        val starts = rows.map(_._2).toArray
        java.util.Arrays.sort(starts)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var s = starts(0); var prev = starts(0)
        var i = 1
        while (i < starts.length) {
          val p = starts(i)
          if (p != prev) { // same (id,pos) can arrive once per extra duplicate
            if (p - prev > L) { out += ((id, s.toLong, prev.toLong + L)); s = p }
            prev = p
          }
          i += 1
        }
        out += ((id, s.toLong, prev.toLong + L))
        out.iterator
      }
      .toDF(idCol, "span_start", "span_end")
  }

  /** The removal half of ExactSubstr dedup: drop every token covered by
    * a duplicated span (the paper removes one copy; removing ALL copies
    * is the conservative variant for training corpora — documented
    * deviation). Returns every input doc with (idCol, clean_text,
    * n_removed). Spans group per doc (bounded by doc length), the cut
    * is a pure map — no second pass over the corpus.
    */
  def removeSubstringSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 50
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val spans = substringSpans(docs, idCol, textCol, minTokens)
      .groupBy(col(idCol)).agg(collect_list(
        struct(col("span_start").as("_1"), col("span_end").as("_2"))).as("spans"))
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .join(spans.select(col(idCol).cast("long").as("_sid"), col("spans")),
        col(idCol) === col("_sid"), "left")
      .select(col(idCol), col(textCol), col("spans"))
      .as[(Long, String, Seq[(Long, Long)])]
      .map { case (id, text, spansOrNull) =>
        val toks = if (text.isEmpty) Array.empty[String] else text.split(' ')
        val spans = Option(spansOrNull).getOrElse(Seq.empty)
        if (spans.isEmpty) (id, text, 0L)
        else {
          val drop = new Array[Boolean](toks.length)
          spans.foreach { case (a, b) =>
            var i = a.toInt; while (i < b && i < toks.length) { drop(i) = true; i += 1 }
          }
          val kept = toks.iterator.zipWithIndex.collect { case (t, i) if !drop(i) => t }
          (id, kept.mkString(" "), drop.count(identity).toLong)
        }
      }
      .toDF(idCol, "clean_text", "n_removed")
  }

  private val RollB1 = 0x5DEECE66DL * 2 + 1 // odd ⇒ invertible mod 2^64
  private val RollB2 = 0x9E3779B97F4A7C15L | 1L

  /** FNV-1a 64 over UTF-16 code units, salted — deterministic across
    * JVMs/partitions (no String.hashCode reliance).
    */
  private def tokenHash64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold, candidate
    * generation via random-hyperplane LSH (sign sketch) so the verify
    * join is bucketed, not all-pairs. Embeddings assumed L2-comparable.
    */
  def embeddingCosine(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 16
  ): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val sk = embs
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, v, Ann.hyperplaneSketch(v, planes), Ann.norm(v))
      }
      .toDF("id", "vec", "sketch", "nrm")
    // bucket = full sketch plus each 1-bit-flipped neighbor (catches pairs
    // that straddle one hyperplane)
    val banded = sk
      .withColumn(
        "bucket",
        explode(expr(s"transform(sequence(0, $planes), i -> " +
          "CASE WHEN i = 0 THEN sketch ELSE cast(sketch as bigint) ^ shiftleft(1L, cast(i - 1 as int)) END)"))
      )
    // same bare-ID candidate discipline as minHashLsh: clustered
    // embeddings make LSH buckets hot (m rows → m² candidates), and
    // dragging two 64-float vectors per candidate through the distinct
    // was ~10× the cost of the whole operator
    val a = banded.select($"bucket", $"id".as("id_a"))
    val b = banded.select($"bucket", $"id".as("id_b"))
    val pairs = a.join(b, Seq("bucket"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()
    val vs = sk.select($"id", $"vec", $"nrm")
    pairs
      .join(vs.select($"id".as("id_a"), $"vec".as("v_a"), $"nrm".as("n_a")), "id_a")
      .join(vs.select($"id".as("id_b"), $"vec".as("v_b"), $"nrm".as("n_b")), "id_b")
      .select($"id_a", $"id_b", $"v_a", $"v_b", $"n_a", $"n_b")
      .as[(Long, Long, Array[Float], Array[Float], Double, Double)]
      .map { case (ia, ib, va, vb, na, nb) =>
        (ia, ib, Ann.dot(va, vb) / (na * nb))
      }
      .toDF("id_a", "id_b", "cosine")
      .where($"cosine" >= threshold)
  }
}

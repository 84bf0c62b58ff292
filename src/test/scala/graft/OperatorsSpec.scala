package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Analyzer, TextFeatures}
import graft.operators.{Ann, Dedup, Multimodal, TextAnalysis}

class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- TextFeatures unit behavior --------------------------------------
  test("minhash approximates jaccard; identical sets → identical signatures") {
    val a = TextFeatures.shingles(Analyzer.tokenize("the quick brown fox jumps over the lazy dog again and again"), 3)
    val b = TextFeatures.shingles(Analyzer.tokenize("the quick brown fox jumps over the lazy dog again and again"), 3)
    assert(TextFeatures.minHash(a, 64).toSeq == TextFeatures.minHash(b, 64).toSeq)
    assert(TextFeatures.jaccard(a, b) == 1.0)
    // overlapping but different sets → 0 < j < 1 and signature agreement ≈ j
    val c = TextFeatures.shingles(Analyzer.tokenize("the quick brown fox sleeps under the lazy dog again and again"), 3)
    val j = TextFeatures.jaccard(a, c)
    assert(j > 0.0 && j < 1.0)
    val sa = TextFeatures.minHash(a, 256)
    val sc = TextFeatures.minHash(c, 256)
    val agree = sa.zip(sc).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(agree - j) < 0.15, s"minhash agreement $agree vs jaccard $j")
  }

  test("simhash: identical text → hamming 0; near text → small distance; far → large") {
    val t1 = Analyzer.tokenize("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5)
    val t2 = Analyzer.tokenize("alpha beta gamma delta epsilon zeta eta theta iota lambda " * 5)
    val h1 = TextFeatures.simHash(t1)
    assert(TextFeatures.hamming(h1, TextFeatures.simHash(t1)) == 0)
    val near = TextFeatures.hamming(h1, TextFeatures.simHash(t2))
    val far = TextFeatures.hamming(h1, TextFeatures.simHash(Analyzer.tokenize("one two three four five six seven eight nine ten " * 5)))
    assert(near < far, s"near=$near far=$far")
  }

  test("langid golden cases") {
    assert(TextFeatures.langId(Analyzer.tokenize("the cat sat on the mat and it was good")) == "en")
    assert(TextFeatures.langId(Analyzer.tokenize("это не просто текст на русском языке и я его пишу")) == "ru")
    assert(TextFeatures.langId(Analyzer.tokenize("der hund ist nicht mit der katze und das ist gut")) == "de")
    assert(TextFeatures.langId(Array.empty) == "und")
    assert(TextFeatures.langId(Analyzer.tokenize("zzz qqq xxx")) == "und")
  }

  test("token counts and quality goldens") {
    assert(TextFeatures.wsTokenCount("a bb  ccc\n dddd") == 4)
    assert(TextFeatures.wsTokenCount("") == 0)
    // bpeish: runs of len 1,2,3,4 → 1 each; len 9 → 3; punct chars count 1
    assert(TextFeatures.bpeishTokenCount("a bb ccc dddd") == 4)
    assert(TextFeatures.bpeishTokenCount("abcdefghi") == 3)
    assert(TextFeatures.bpeishTokenCount("a,b") == 3)
    val q = TextFeatures.quality("the the cat 42!", Analyzer.tokenize("the the cat 42!"))
    assert(q.n_tokens == 4)
    assert(q.stopword_ratio == 0.5)
    assert(q.max_repeat_ratio == 0.5)
    assert(q.digit_ratio == 2.0 / 15)
    assert(q.punct_ratio == 1.0 / 15)
  }

  test("fingerprint is order-sensitive; simhash is order-insensitive") {
    val t1 = Analyzer.tokenize("one two three four")
    val t2 = Analyzer.tokenize("four three two one")
    assert(TextFeatures.fingerprint(t1) != TextFeatures.fingerprint(t2))
    assert(TextFeatures.simHash(t1) == TextFeatures.simHash(t2))
    assert(TextFeatures.fingerprint(t1) == TextFeatures.fingerprint(Analyzer.tokenize("one two three four")))
  }

  // ---- Dedup operators on a corpus with planted duplicates -------------
  private def dupDocs = {
    val base = (0L until 200L).map { i =>
      val text = graft.sources.PagesGen.textFor(i)
      (i, text)
    }
    // plant: 200+i duplicates doc i for i in 0..19
    val dups = (0L until 20L).map(i => (200L + i, base(i.toInt)._2))
    spark.createDataFrame(base ++ dups).toDF("doc_id", "text")
      .where(length(trim($"text")) > 0)
  }

  test("exact dedup finds planted duplicates") {
    val res = Dedup.exact(dupDocs, "doc_id", "text").where($"n_dups" > 1).collect()
    // planted dups + generator's own i%97==53 copies
    val keepIds = res.map(_.getAs[Long]("keep_id")).toSet
    assert((0L until 20L).filter(i => graft.sources.PagesGen.textFor(i).trim.nonEmpty)
      .forall(keepIds.contains), s"missing planted dups in $keepIds")
  }

  test("minhash LSH finds all exact duplicates (j=1 ⇒ recall 1)") {
    val pairs = Dedup.minHashLsh(dupDocs, "doc_id", "text", threshold = 1.0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    (0L until 20L).foreach { i =>
      if (graft.sources.PagesGen.textFor(i).trim.nonEmpty)
        assert(pairs.exists(p => p == (i, 200L + i) || (p._1 == i && p._2 == 200L + i) ||
          // doc i may also equal other docs via the generator's dup rule
          pairs.contains((i, 200L + i))), s"missing pair ($i, ${200 + i})")
    }
  }

  test("minhash LSH: exact-dup pre-collapse keeps hot groups out of band buckets") {
    // 200 byte-identical copies — pre-collapse, a single band bucket saw
    // all 200 and generated 19,900 candidate pairs; now exactly ONE
    // representative per text enters banding, and the 19,900 pairs come
    // from the members equi-join with Jaccard pinned at 1.0. A second
    // 2-copy group holds a NEAR-dup of the hot text: its rep-level LSH
    // collision must expand to all 200×2 cross pairs.
    val t1 = (0 until 20).map(i => s"tok$i").mkString(" ")
    val t2 = ((0 until 19).map(i => s"tok$i") :+ "changed").mkString(" ")
    val hot = (0L until 200L).map(i => (i, t1))
    val near = Seq((300L, t2), (301L, t2))
    val df = spark.createDataFrame(hot ++ near).toDF("doc_id", "text")
    val res = Dedup.minHashLsh(df, "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    val within1 = res.filter(r => r._1 < 200 && r._2 < 200)
    assert(within1.length == 199 * 200 / 2, s"hot-group pairs: ${within1.length}")
    assert(within1.forall(_._3 == 1.0))
    assert(res.exists(r => r._1 == 300L && r._2 == 301L && r._3 == 1.0), "2-copy group pair missing")
    val cross = res.filter(r => r._1 < 200 && r._2 >= 300)
    assert(cross.length == 400, s"cross-group expansion: ${cross.length} (rep pair must collide and expand)")
    assert(cross.forall(r => r._3 >= 0.8 && r._3 < 1.0))
  }

  test("simhash dedup finds exact duplicates at hamming 0") {
    val pairs = Dedup.simHash(dupDocs, "doc_id", "text", maxHamming = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert((0L until 20L).filter(i => graft.sources.PagesGen.textFor(i).trim.nonEmpty)
      .forall(i => pairs.contains((i, 200L + i))))
  }

  test("ngram jaccard is exact over the pruned shingle space; no broadcast dependence") {
    // every doc shares a hot boilerplate prefix whose shingles exceed
    // maxShingleDf and get pruned; the planted identical pair must STILL
    // score exactly 1.0 (sizes counted over the same pruned space as the
    // intersection — unpruned sizes would under-score it). Broadcast joins
    // are disabled to prove the hot-shingle anti-join works as a plain
    // shuffle join (at web scale the hot set cannot be broadcast).
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (0L until 40L).map(i => (i, s"$boiler unique$i content$i token$i extra$i"))
    val planted = Seq(
      (100L, s"$boiler special one two three four"),
      (101L, s"$boiler special one two three four")
    )
    val df = spark.createDataFrame(filler ++ planted).toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = Dedup.ngramJaccard(df, "doc_id", "text", n = 3, threshold = 0.99, maxShingleDf = 10)
        .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
      assert(res.exists(r => r._1 == 100L && r._2 == 101L && r._3 == 1.0),
        s"planted pair missing or under-scored after pruning: ${res.toSeq}")
      // no filler doc pairs: their surviving shingles are all doc-unique
      assert(res.forall(r => r._1 >= 100L), s"unexpected filler pair: ${res.toSeq}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ngram jaccard: planted dup pairs score 1.0") {
    val res = Dedup.ngramJaccard(dupDocs, "doc_id", "text", threshold = 0.99)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    val m = res.map(r => (r._1, r._2) -> r._3).toMap
    (0L until 20L).foreach { i =>
      if (graft.sources.PagesGen.textFor(i).trim.nonEmpty)
        assert(m.get((i, 200L + i)).contains(1.0), s"pair ($i,${200 + i}): ${m.get((i, 200L + i))}")
    }
  }

  // ---- ANN ---------------------------------------------------------------
  private def synthEmbeddings(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val v = Array.tabulate(dim) { d =>
        ((TextFeatures.mix64(i.toLong * 31 + d) >>> 11).toDouble / (1L << 53) - 0.5).toFloat
      }
      (i.toLong, v)
    }

  test("connected components: transitive chains collapse, singletons stand alone") {
    import graft.operators.Dedup
    // chain 1-2-3-4 (no direct 1-4 edge), pair {10,11}, singleton 20,
    // plus a cycle 30-31-32-30
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (30L, 31L), (31L, 32L), (32L, 30L))
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 30L, 31L, 32L))
    val got = Dedup.connectedComponents(
      spark.createDataFrame(pairs).toDF("id_a", "id_b"), "id_a", "id_b",
      spark.createDataFrame(nodes.map(Tuple1(_))).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L), got.toString)
    // long path exercises multi-round convergence (diameter > 2)
    val path = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got2 = Dedup.connectedComponents(
      spark.createDataFrame(path).toDF("a", "b"), "a", "b",
      spark.createDataFrame((0L until 12L).map(Tuple1(_))).toDF("id"), "id")
      .collect().map(r => r.getLong(1)).distinct
    assert(got2.toSeq == Seq(0L), s"path graph should be one component: ${got2.toSeq}")
  }

  test("connected components: 150-node path graph converges in O(log d) rounds; " +
    "endpoints missing from the node universe still label correctly") {
    import graft.operators.Dedup
    // a chain-shaped near-dup graph (templated page series): diameter 149.
    // Plain min-label propagation needs 149 rounds; large-star/small-star
    // must finish inside the default 30-round budget (expected ~8).
    val n = 150L
    val path = (0L until n).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Dedup.connectedComponents(
      spark.createDataFrame(path).toDF("a", "b"), "a", "b",
      spark.createDataFrame((0L until n).map(Tuple1(_))).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "path graph should be one component rooted at 0")

    // ADVICE r4: an edge endpoint absent from `nodes` must neither drop
    // the components it bridges nor emit rows outside the universe —
    // endpoints are unioned into the universe.
    val pairs2 = Seq((1L, 99L), (99L, 2L)) // 99 missing from nodes
    val got2 = Dedup.connectedComponents(
      spark.createDataFrame(pairs2).toDF("a", "b"), "a", "b",
      spark.createDataFrame(Seq(1L, 2L, 3L).map(Tuple1(_))).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 99L -> 1L, 3L -> 3L), got2.toString)
  }

  test("substringSpans: planted shared runs found, islands merged, intra-doc repeats count") {
    // L=3. doc0/doc1 share tokens a b c d e (positions 0..4 / 2..6):
    // windows abc/bcd/cde dup in both → one merged span each.
    // doc2 repeats x y z x y z → window "x y z" occurs twice IN ONE doc.
    // doc3 has no ≥3-token repeat anywhere.
    val docsS = Seq(
      (0L, "a b c d e q r s t"),
      (1L, "p q a b c d e u v"),
      (2L, "x y z x y z"),
      (3L, "m n o p2 q2 r2 s2")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docsS, "doc_id", "text", minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((0L, 0L, 5L), (1L, 2L, 7L), (2L, 0L, 6L)), s"spans: $spans")

    val cleaned = Dedup.removeSubstringSpans(docsS, "doc_id", "text", minTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(cleaned(0L) == (("q r s t", 5L)))
    assert(cleaned(1L) == (("p q u v", 5L)))
    assert(cleaned(2L) == (("", 6L)))
    assert(cleaned(3L) == (("m n o p2 q2 r2 s2", 0L)))
  }

  test("substringSpans: touching-but-distinct windows merge; gap > L stays split") {
    // shared run1 at doc4[0..3) and doc5[0..3); shared run2 at doc4[10..13)
    // and doc5[5..8) — far apart in doc4 ⇒ two spans there
    val docsS = Seq(
      (4L, "k1 k2 k3 f1 f2 f3 f4 f5 f6 f7 g1 g2 g3"),
      (5L, "k1 k2 k3 h1 h2 g1 g2 g3 h3 h4")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docsS, "doc_id", "text", minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((4L, 0L, 3L), (4L, 10L, 13L), (5L, 0L, 3L), (5L, 5L, 8L)), s"spans: $spans")
  }

  test("brute-force ANN matches exhaustive cosine top-k") {
    val data = synthEmbeddings(300, 16)
    val corpus = spark.createDataFrame(data).toDF("id", "vec")
    val queries = spark.createDataFrame(data.take(3)).toDF("qid", "qvec")
    val got = Ann.bruteForceTopK(queries, corpus, "qid", "qvec", "id", "vec", 5)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    data.take(3).foreach { case (qid, qv) =>
      val expected = data
        .map { case (id, v) => (id, Ann.cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5).map(_._1)
      assert(got(qid) == expected, s"query $qid")
    }
  }

  test("int8 quantization: tight round trip; quantized search + exact rerank recalls brute force") {
    import graft.operators.Quantize
    val data = synthEmbeddings(300, 16)
    val corpus = spark.createDataFrame(data).toDF("id", "vec")
    val p = Quantize.fit(corpus, "vec")
    // round-trip error bounded by half a quantization step per dimension
    val errs = Quantize.roundTripError(corpus, "id", "vec")
      .select($"err_e4").as[Long].collect()
    val maxStepE4 = p.lo.indices
      .map(i => (p.hi(i).toDouble - p.lo(i).toDouble) / 255.0 / 2.0 * 10000.0).max
    assert(errs.max <= math.ceil(maxStepE4).toLong + 1, s"err ${errs.max} vs step $maxStepE4")
    // decode(encode(v)) ≈ v element-wise for a sample row
    val q = Quantize.encode(corpus, "id", "vec", p)
    val sample = q.where($"id" === 7L).select($"codes").as[Array[Byte]].head()
    val recon = Quantize.decodeVec(sample, p)
    val orig = data(7)._2
    recon.zip(orig).zipWithIndex.foreach { case ((r, o), i) =>
      assert(math.abs(r - o) <= (p.hi(i) - p.lo(i)) / 255.0 / 2.0 + 1e-6, s"dim $i")
    }
    // quantized-space search + exact rerank: recall vs exact brute force
    val queries = spark.createDataFrame(data.take(4)).toDF("qid", "qvec")
    val exact = Ann.bruteForceTopK(queries, corpus, "qid", "qvec", "id", "vec", 10)
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gotQ = Quantize.bruteForceTopKQuantized(
      queries, q, p, corpus, "qid", "qvec", "id", "vec", 10, rerankFactor = 4)
      .select($"qid", $"id", $"cosine", $"rank")
      .as[(Long, Long, Double, Long)].collect()
    val byQ = gotQ.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    data.take(4).foreach { case (qid, qv) =>
      val hits = byQ(qid)
      val recall = hits.map(_._2).count(exact(qid).contains) / 10.0
      assert(recall >= 0.9, s"query $qid recall $recall")
      // reranked cosines are EXACT (full-vector math, not quantized)
      hits.foreach { case (_, id, c, _) =>
        val ev = Ann.cosine(qv, data(id.toInt)._2)
        assert(math.abs(c - ev) < 1e-12, s"rerank cosine of $id")
      }
    }
  }

  test("quantize encode saturates out-of-range components (no byte wraparound)") {
    import graft.operators.Quantize
    val p = Quantize.Params(Array(0f, -1f), Array(10f, 1f))
    // in-range unchanged
    val in = Quantize.encodeVec(Array(5f, 0f), p).map(_ & 0xff)
    assert(in(0) == 128 && in(1) == 128, in.toSeq.toString) // round(127.5)=128
    // out-of-range clamps to 0/255 — streaming data beyond the trained
    // (lo, hi) must saturate like FAISS/ES SQ8, never wrap via & 0xff
    val out = Quantize.encodeVec(Array(-50f, 99f), p).map(_ & 0xff)
    assert(out(0) == 0 && out(1) == 255, out.toSeq.toString)
    val far = Quantize.encodeVec(Array(1e9f, -1e9f), p).map(_ & 0xff)
    assert(far(0) == 255 && far(1) == 0, far.toSeq.toString)
  }

  test("quantized IVF: full probe + wide rerank reproduces brute force; codes are int8") {
    import graft.operators.Quantize
    val data = synthEmbeddings(400, 16)
    val corpus = spark.createDataFrame(data).toDF("id", "vec")
    val queries = spark.createDataFrame(data.take(5)).toDF("qid", "qvec")
    val bfRanked = Ann.bruteForceTopK(queries, corpus, "qid", "qvec", "id", "vec", 10)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfq-spec").toString
    val p = Ann.ivfBuildQuantized(corpus, "id", "vec", idxDir, nLists = 8)
    assert(p.dims == 16)
    // stored lists carry 16-byte codes, not float vectors
    val row = spark.read.parquet(s"$idxDir/lists").select($"codes").head()
    assert(row.getAs[Array[Byte]](0).length == 16)
    // full probe + exact rerank of a 4×-widened candidate set must equal
    // exact brute force: quantization error only reorders the candidate
    // pool, the rerank is full-vector math
    val full = Ann.ivfSearchQuantized(spark, idxDir, queries, corpus,
      "qid", "qvec", "id", "vec", 10, nProbe = 8, rerankFactor = 4)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
    assert(full.toSet == bfRanked.toSet, "full-probe quantized IVF != brute force")
    // pruned probe keeps useful recall (same bar as the float IVF test)
    val pruned = Ann.ivfSearchQuantized(spark, idxDir, queries, corpus,
      "qid", "qvec", "id", "vec", 10, nProbe = 3, rerankFactor = 4)
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bf = bfRanked.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    data.take(5).foreach { case (qid, _) =>
      val recall = pruned(qid).intersect(bf(qid)).size / 10.0
      assert(recall >= 0.6, s"recall $recall for query $qid")
    }
  }

  test("IVF ANN: self is rank 1, recall@10 ≥ 0.6 vs brute force; full probe is exact") {
    val data = synthEmbeddings(400, 16)
    val corpus = spark.createDataFrame(data).toDF("id", "vec")
    val queries = spark.createDataFrame(data.take(5)).toDF("qid", "qvec")
    val bfRanked = Ann.bruteForceTopK(queries, corpus, "qid", "qvec", "id", "vec", 10)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
    val bf = bfRanked.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // build once, probe twice at different widths (the production shape)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    Ann.ivfBuild(corpus, "id", "vec", idxDir, nLists = 8)
    val ivf = Ann.ivfSearch(spark, idxDir, queries, "qid", "qvec", 10, nProbe = 3)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
    val byQ = ivf.groupBy(_._1)
    data.take(5).foreach { case (qid, _) =>
      val hits = byQ(qid)
      assert(hits.minBy(_._3)._2 == qid, s"self not rank-1 for $qid") // self in probed list
      val recall = hits.map(_._2).toSet.intersect(bf(qid)).size / 10.0
      assert(recall >= 0.6, s"recall $recall for query $qid")
    }
    // probing every list must reproduce brute force exactly (ranks + ids)
    val full = Ann.ivfSearch(spark, idxDir, queries, "qid", "qvec", 10, nProbe = 8)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
    assert(full.toSet == bfRanked.toSet, "full-probe IVF != brute force")
  }

  // ---- multimodal plumbing ------------------------------------------------
  test("media synthesize/decode round-trip and resize plan") {
    (0L until 50L).foreach { id =>
      val m = Multimodal.decodeStub(id, Multimodal.synthesize(id))
      assert(m.isDefined, s"id $id")
      val meta = m.get
      assert(Set("image", "audio", "video").contains(meta.kind))
      assert(meta.width >= 16 && meta.height >= 16)
      assert(meta.payload_bytes >= 64)
    }
    assert(Multimodal.decodeStub(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeStub(1L, null).isEmpty)

    val media = spark.createDataFrame(
      (0L until 50L).map(id => (id, Multimodal.synthesize(id)))
    ).toDF("id", "media")
    val meta = Multimodal.extractMeta(media, "id", "media")
    assert(meta.count() == 50)
    val resized = Multimodal.resizePlan(meta, 256).collect()
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(math.max(ow, oh) <= 256)
      if (w <= 256 && h <= 256) assert(ow == w && oh == h)
    }
    val frames = Multimodal.sampleFrames(meta, everyNth = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_idx") % 4 == 0))
  }

  test("real PNG/JPEG header codecs: synthesized valid headers parse byte-exactly; " +
    "malformed blobs are rejected; decode() dispatches on magic") {
    (0L until 120L by 6L).foreach { id =>
      val png = Multimodal.synthesizePng(id)
      val m = Multimodal.decodePngHeader(id, png)
      assert(m.isDefined, s"png $id")
      assert(m.get.width == 16 + (id * 7919 % 1024).toInt, s"png width $id")
      assert(m.get.height == 16 + (id * 104729 % 1024).toInt, s"png height $id")
      assert(Set(1, 3, 4).contains(m.get.channels))
      assert(m.get.kind == "image" && m.get.payload_bytes == png.length)
      // decode() must route by signature to the same result
      assert(Multimodal.decode(id, png) == m)
    }
    (3L until 120L by 6L).foreach { id =>
      val jpg = Multimodal.synthesizeJpeg(id)
      val m = Multimodal.decodeJpegHeader(id, jpg)
      assert(m.isDefined, s"jpeg $id")
      assert(m.get.width == 16 + (id * 7919 % 1024).toInt, s"jpeg width $id")
      assert(m.get.height == 16 + (id * 104729 % 1024).toInt, s"jpeg height $id")
      assert(Set(1, 3).contains(m.get.channels))
      assert(Multimodal.decode(id, jpg) == m)
    }
    // malformed: truncated signature, bad IHDR, SOS-before-SOF, garbage
    assert(Multimodal.decodePngHeader(0L, Multimodal.synthesizePng(0L).take(20)).isEmpty)
    val badIhdr = Multimodal.synthesizePng(6L).clone()
    badIhdr(12) = 'X'.toByte // corrupt the IHDR chunk type
    assert(Multimodal.decodePngHeader(6L, badIhdr).isEmpty)
    assert(Multimodal.decodeJpegHeader(0L, Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01)).isEmpty)
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte, 0x00, 0x04, 0, 0)
    assert(Multimodal.decodeJpegHeader(0L, noSof).isEmpty, "SOS before SOF must reject")
    // GRFT blobs still route to the stub through decode()
    assert(Multimodal.decode(7L, Multimodal.synthesize(7L)).exists(_.kind == "audio"))
    assert(Multimodal.decode(1L, Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("TextAnalysis one-pass features are consistent") {
    val df = spark.createDataFrame(Seq(
      (1L, "the cat sat on the mat"),
      (2L, ""),
      (3L, "это текст на русском языке и я")
    )).toDF("doc_id", "text")
    val res = TextAnalysis.analyze(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(res(1L).getAs[String]("lang_pred") == "en")
    assert(res(1L).getAs[Long]("n_tokens") == 6)
    assert(res(2L).getAs[Long]("n_tokens") == 0)
    assert(res(2L).getAs[String]("lang_pred") == "und")
    assert(res(3L).getAs[String]("lang_pred") == "ru")
  }

  // ---- Deterministic sampling ------------------------------------------
  test("sampling: md5-bucket membership matches an independent recompute; nested and stable") {
    import graft.operators.Sampling
    val df = spark.range(0L, 2000L).toDF("doc_id")
    // independent oracle: java MessageDigest on the same (id ∥ salt)
    def bucket(id: Long, salt: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id$salt".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % Sampling.Buckets
    }
    val expIds = (0L until 2000L).filter(bucket(_, "t1") < 1000).toSet // rate 0.1
    val gotIds = Sampling.sample(df, "doc_id", 0.1, "t1")
      .collect().map(_.getLong(0)).toSet
    assert(gotIds == expIds, "membership ≡ independent md5 recompute")
    // deterministic: same call → same rows
    assert(Sampling.sample(df, "doc_id", 0.1, "t1")
      .collect().map(_.getLong(0)).toSet == gotIds)
    // nested: 10% ⊂ 20% at the same salt; different salt decorrelates
    val got20 = Sampling.sample(df, "doc_id", 0.2, "t1").collect().map(_.getLong(0)).toSet
    assert(gotIds.subsetOf(got20), "samples nest by rate")
    val other = Sampling.sample(df, "doc_id", 0.1, "t2").collect().map(_.getLong(0)).toSet
    assert((gotIds intersect other).size < gotIds.size / 2, "salts decorrelate")
    // rate sanity: ~10% ± a loose band
    assert(gotIds.size > 120 && gotIds.size < 280, s"rate off: ${gotIds.size}")
  }

  test("sampling: split is disjoint, covering (when fractions sum to 1), growth-stable") {
    import graft.operators.Sampling
    val df = spark.range(0L, 1000L).toDF("doc_id")
    val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = Sampling.split(df, "doc_id", fr, "sA")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 1000, "fractions sum to 1 → every row assigned")
    val byName = got.groupBy(_._2).map { case (k, v) => k -> v.size }
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > 700 && byName("val") > 50 && byName("test") > 50,
      s"split sizes: $byName")
    // growth stability: the assignment of existing ids is unchanged when
    // the table doubles (the test→train contamination guard)
    val bigger = spark.range(0L, 2000L).toDF("doc_id")
    val got2 = Sampling.split(bigger, "doc_id", fr, "sA")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 1000L).forall(id => got2(id) == got(id)), "assignments stable under growth")
    // partial fractions drop the remainder
    val part = Sampling.split(df, "doc_id", Seq(("sub", 0.3)), "sA").count()
    assert(part < 400 && part > 200, s"partial split kept $part")
  }

  test("sampling: stratified rates apply per stratum (codegen CASE, no join)") {
    import graft.operators.Sampling
    val df = spark.range(0L, 3000L)
      .select($"id".as("doc_id"),
        when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "de").otherwise("fr").as("lang"))
    val got = Sampling.stratifiedSample(df, "doc_id", "lang",
      rates = Map("en" -> 0.1, "de" -> 1.0), defaultRate = 0.5, salt = "sS")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("de") == 1000L, "rate 1.0 keeps the whole stratum")
    assert(got("en") < 200L, s"rate 0.1 stratum: ${got("en")}")
    assert(got("fr") > 350L && got("fr") < 650L, s"default rate stratum: ${got("fr")}")
    // pure map: no exchange in the plan
    val plan = Sampling.stratifiedSample(df, "doc_id", "lang",
      rates = Map("en" -> 0.1), defaultRate = 0.5, salt = "sS")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "stratified sample must not shuffle")
  }

  // ---- Full PNG pixel codec --------------------------------------------
  test("PNG pixel codec: encode→decode round trip for every supported color type") {
    import graft.operators.Multimodal
    Seq(1, 2, 3, 4).foreach { ch =>
      val (w, h) = (23, 17)
      val px = Array.tabulate(w * h * ch)(i => ((i * 31 + ch * 7) % 256).toByte)
      val png = Multimodal.encodePng(w, h, ch, px)
      val Some((m, out)) = Multimodal.decodePngPixels(42L, png)
      assert((m.width, m.height, m.channels) == ((w, h, ch)), s"ch=$ch dims")
      assert(out.toSeq == px.toSeq, s"ch=$ch pixels")
    }
  }

  test("PNG pixel codec: interchange with javax.imageio both directions (all 5 filters)") {
    import graft.operators.Multimodal
    // our encoder's output is a real PNG: ImageIO reads it back pixel-exact
    val (w, h) = (31, 19)
    val gray = Array.tabulate(w * h)(i => ((i * 13) % 256).toByte)
    val ours = Multimodal.encodePng(w, h, 1, gray)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(img != null, "ImageIO must accept our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    val back = new Array[Byte](w * h)
    img.getRaster.getDataElements(0, 0, w, h, back)
    assert(back.toSeq == gray.toSeq, "ImageIO round trip")
    // ImageIO's own writer (adaptive row filters — exercises Sub/Up/
    // Average/Paeth reconstruction, not just filter 0) → our decoder
    val rgb = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      rgb.setRGB(x, y, ((x * 37 + y) % 256 << 16) | ((y * 91 + x) % 256 << 8) | ((x * y + 7) % 256))
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    val Some((m2, out2)) = Multimodal.decodePngPixels(7L, bos.toByteArray)
    assert((m2.width, m2.height, m2.channels) == ((w, h, 3)), "ImageIO PNG dims")
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val argb = rgb.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((out2(base) & 0xff) == ((argb >> 16) & 0xff), s"R($x,$y)")
      assert((out2(base + 1) & 0xff) == ((argb >> 8) & 0xff), s"G($x,$y)")
      assert((out2(base + 2) & 0xff) == (argb & 0xff), s"B($x,$y)")
    })
  }

  test("PNG pixel codec: corrupt input returns None, never throws") {
    import graft.operators.Multimodal
    val good = Multimodal.synthesizePngImage(5L)
    assert(Multimodal.decodePngPixels(5L, good).isDefined)
    // truncated IDAT
    assert(Multimodal.decodePngPixels(5L, good.take(good.length - 20)).isEmpty)
    // flipped payload byte breaks the chunk CRC
    val bad = good.clone(); bad(50) = (bad(50) ^ 0x5a).toByte
    assert(Multimodal.decodePngPixels(5L, bad).isEmpty)
    // not a PNG at all
    assert(Multimodal.decodePngPixels(5L, Array.fill[Byte](64)(7)).isEmpty)
    // header-only synth (no IDAT) doesn't decode pixels but still header-parses
    val headerOnly = Multimodal.synthesizePng(6L)
    assert(Multimodal.decodePngPixels(6L, headerOnly).isEmpty)
    assert(Multimodal.decodePngHeader(6L, headerOnly).isDefined)
  }

  test("pixelStats matches the generator formula (the q_media_pixels contract)") {
    import graft.operators.Multimodal
    val df = (0L until 60L).map(id => (id, Multimodal.synthesizePngImage(id))).toDF("id", "media")
    val got = Multimodal.pixelStats(df, "id", "media").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    (0L until 60L).foreach { id =>
      val w = 4 + (id * 7919 % 16).toInt
      val h = 4 + (id * 104729 % 16).toInt
      val ch = Array(1, 3, 4)((id % 3).toInt)
      var s = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) s += (id + 3 * x + 7 * y + 11 * c) % 256
      assert(got(id) == ((w, h, ch, (w * h * ch).toLong, s)), s"id $id")
    }
  }

  // ---- Train/eval decontamination --------------------------------------
  test("decontamination: distinct leaked n-grams per eval doc ≡ exhaustive recompute") {
    import graft.operators.Decontaminate
    val docs = Seq(
      (1L, "a b c d e f"),       // train
      (2L, "x y z w v"),         // train
      (3L, "q r s"),             // train
      (10L, "a b c q q q"),      // eval: leaks "a b c"
      (20L, "x y z w k"),        // eval: leaks "x y z", "y z w"
      (30L, "no overlap here at all"), // eval: clean
      (40L, "ab"),               // eval: too short for 3-grams
      (50L, "")                  // eval: empty
    ).toDF("doc_id", "text")
    val train = docs.where($"doc_id" < 10)
    val eval = docs.where($"doc_id" >= 10)
    val got = Decontaminate.ngramOverlap(train, eval, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(10L -> ((1L, 4L)), 20L -> ((2L, 3L))), s"got $got")
    // duplicate n-grams in one doc count once (distinct semantics)
    val rep = Seq((100L, "a b c a b c a b c")).toDF("doc_id", "text")
    val got2 = Decontaminate.ngramOverlap(train, rep, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // distinct 3-grams of the repeat doc: "a b c","b c a","c a b" → 3;
    // only "a b c" leaks
    assert(got2 == ((1L, 3L)), s"distinct semantics: $got2")
  }

  // ---- PII redaction ------------------------------------------------------
  test("redact: fixed stage order, counts per stage, overlaps deterministic") {
    import graft.operators.Redact
    val d = Seq(
      (1L, "mail a.b+c@ex.co and x@y.io, ip 192.168.0.1, call +49-030-123456"),
      (2L, "no pii here"),
      (3L, "ip inside mail 1.2.3.4@host.com stays one email")
    ).toDF("doc_id", "text")
    val got = Redact.redact(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L)._1 == "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>")
    assert((got(1L)._2, got(1L)._3, got(1L)._4) == ((2L, 1L, 1L)))
    assert(got(2L) == (("no pii here", 0L, 0L, 0L)))
    // the dotted quad is consumed by the email stage → no <IP> double-count
    assert(got(3L)._1 == "ip inside mail <EMAIL> stays one email")
    assert((got(3L)._2, got(3L)._3) == ((1L, 0L)))
  }

  // ---- Gopher repetition signals -------------------------------------------
  test("repetition: top-bigram and dup-trigram fractions ≡ hand-computed") {
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab → top 'a b'=3/5; trigrams: aba bab aba bab → dist 2 of 4
      (2L, "x y z w"),       // all distinct: top bigram 1/3, dup trigrams 0/2
      (3L, "p q"),           // <3 tokens → dropped
      (4L, "")               // empty → dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((math.round(3 * 1e6 / 5), math.round(2 * 1e6 / 4))))
    assert(got(2L) == ((math.round(1 * 1e6 / 3), 0L)))
  }

  // ---- chunk-level dedup ----------------------------------------------------
  test("chunkDedup: occurrence-level duplicate counts, partial tail chunk") {
    import graft.operators.Dedup
    // chunk size 2: doc1 = [a b][c d][e]; doc2 shares [a b] and [e]-tail;
    // doc3 repeats [q q] twice within itself
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "a b z z e"),
      (3L, "q q q q")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(d, "doc_id", "text", chunkTokens = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: chunks "a b","c d","e" → dup: "a b" (with doc2), "e" (with doc2 tail)
    assert(got(1L) == ((3L, 2L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((3L, 2L)), s"doc2: ${got(2L)}")
    // doc3: "q q","q q" → both occurrences duplicated
    assert(got(3L) == ((2L, 2L)), s"doc3: ${got(3L)}")
  }

  // ---- Hybrid RRF fusion ------------------------------------------------
  test("rrf: reciprocal-rank fusion ≡ hand-computed; per-qid batched variant") {
    import graft.query.Hybrid
    // list A ranks: d1=1 d2=2 d3=3; list B ranks: d3=1 d2=2 d4=3
    val a = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "score")
    val b = Seq((3L, 0.9), (2L, 0.5), (4L, 0.1)).toDF("doc_id", "score")
    def r(ranks: Int*) = ranks.map(x => 1.0 / (60 + x)).sum
    val exp = Map(1L -> r(1), 2L -> r(2, 2), 3L -> r(3, 1), 4L -> r(3))
    val got = Hybrid.rrf(Seq(a, b), 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, e) => assert(math.abs(got(id) - e) < 1e-12, s"doc $id") }
    // ordering: d2 and d3 tie exactly (r(2,2)=r(3,1)? no: 1/62+1/62 vs 1/63+1/61)
    val order = Hybrid.rrf(Seq(a, b), 10).collect().map(_.getLong(0)).toSeq
    assert(order == exp.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1))
    // score-tie breaks by doc_id: two lists each ranking one distinct doc first
    val t1 = Seq((7L, 1.0)).toDF("doc_id", "score")
    val t2 = Seq((5L, 1.0)).toDF("doc_id", "score")
    assert(Hybrid.rrf(Seq(t1, t2), 10).collect().map(_.getLong(0)).toSeq == Seq(5L, 7L))
    // batched: qids fuse independently
    val qa = Seq((0L, 1L, 9.0), (0L, 2L, 5.0), (1L, 9L, 3.0)).toDF("qid", "doc_id", "score")
    val qb = Seq((0L, 2L, 0.9), (1L, 8L, 0.8)).toDF("qid", "doc_id", "score")
    val byQ = Hybrid.rrfByQuery(Seq(qa, qb), 10).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(math.abs(byQ((0L, 1L)) - r(1)) < 1e-12)
    assert(math.abs(byQ((0L, 2L)) - r(2, 1)) < 1e-12)
    assert(math.abs(byQ((1L, 9L)) - r(1)) < 1e-12)
    assert(math.abs(byQ((1L, 8L)) - r(1)) < 1e-12)
  }

  // ---- corpus curation pipeline ------------------------------------------------
  test("corpus pipeline: each stage drops its targets, counts tell the story") {
    import graft.operators.CorpusPipeline
    val good1 = "the quick brown fox jumps over a lazy dog and runs far into the green woods of tall trees near a cold river bank where birds sing songs to the bright morning sun in calm wind alpha"
    val good2 = good1.replace("alpha", "omega") // near-dup of good1 (1 of 40 tokens)
    val good3 = "completely different content about the engine and its query planner with many unique tokens describing joins filters sorts windows in a spark native design of distributed systems"
    val leaky = "the secret answer key of this benchmark question set must never appear in training data and this sentence leaks it entirely"
    val docs = Seq(
      (1L, good1),
      (2L, good1),                      // exact dup of 1 → dropped at exact_dedup
      (3L, good2),                      // near dup of 1 → dropped at near_dedup
      (4L, good3),
      (5L, "привет мир привет мир привет и мир снова тут"), // ru → lang stage
      (6L, "the of and"),               // 3 tokens < minTokens → lang_quality
      (7L, "the the the the the the the the"), // stopword ratio 1.0 → lang_quality
      (8L, "the cat and the cat and the cat and the cat"), // top bigram → repetition
      (9L, leaky)                       // shares >50% 3-grams with the eval doc
    ).toDF("doc_id", "text")
    val eval = Seq((100L, leaky + " plus a little extra tail")).toDF("doc_id", "text")
    val (out, counts) = CorpusPipeline.clean(docs, "doc_id", "text",
      CorpusPipeline.Config(minhashThreshold = 0.8), Some(eval))
    val ids = out.collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L), s"survivors: $ids")
    val byStage = counts.toMap
    assert(byStage("input") == 9)
    assert(byStage("lang_quality") == 6, s"counts: $counts")   // -5, -6, -7
    assert(byStage("repetition") == 5)                          // -8
    assert(byStage("exact_dedup") == 4)                         // -2
    assert(byStage("near_dedup") == 3)                          // -3
    assert(byStage("decontaminate") == 2)                       // -9
    // production mode: no counts, same survivors
    val (out2, none) = CorpusPipeline.clean(docs, "doc_id", "text",
      CorpusPipeline.Config(minhashThreshold = 0.8), Some(eval), withCounts = false)
    assert(none.isEmpty && out2.collect().map(_.getLong(0)).toSet == ids)
  }

  // ---- URL canonicalization ---------------------------------------------------
  test("url canonicalize: case, fragments, tracking params, param order") {
    import graft.operators.UrlOps
    val d = Seq(
      (1L, "HTTP://WWW.Example.COM/Path/A?b=2&utm_source=x&a=1#frag"),
      (2L, "http://www.example.com/Path/A?a=1&b=2"),
      (3L, "http://www.example.com/path/a?a=1&b=2"), // path case differs → distinct
      (4L, "https://ex.com/p"),                       // no query
      (5L, "https://ex.com/p?gclid=1&fbclid=2&ref=3") // all tracking → bare
    ).toDF("doc_id", "url")
    val got = d.select($"doc_id", UrlOps.canonicalize($"url").as("c")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "http://www.example.com/Path/A?a=1&b=2")
    assert(got(1L) == got(2L), "case+tracking+order collapse")
    assert(got(3L) == "http://www.example.com/path/a?a=1&b=2" && got(3L) != got(2L))
    assert(got(4L) == "https://ex.com/p" && got(5L) == "https://ex.com/p")
    val dd = UrlOps.dedupByUrl(d, "doc_id", "url").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dd(got(1L)) == ((1L, 2L)) && dd(got(4L)) == ((4L, 2L)) && dd(got(3L)) == ((3L, 1L)))
  }

  // ---- LM quality scoring ---------------------------------------------------
  test("lm score: bigram Laplace log-prob ≡ hand-computed; short docs dropped") {
    import graft.operators.LmScore
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // unigrams: a=3, b=2, c=1 → V=3; bigrams: (a,b)=2, (b,a)=1, (a,c)=1
    val m = LmScore.train(train, "text")
    assert(m.vocab == 3 && m.unigrams("a") == 3L && m.bigrams(("a", "b")) == 2L)
    def lp(c12: Long, c1: Long) = math.round(math.log((c12 + 1).toDouble / (c1 + 3)) * 1e6)
    val eval = Seq((10L, "a b c"), (20L, "x"), (30L, "")).toDF("doc_id", "text")
    val got = LmScore.score(eval, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 10 bigrams: (a,b) c12=2 c1=3; (b,c) c12=0 c1=2
    assert(got == Map(10L -> ((2L, lp(2, 3) + lp(0, 2)))), s"got $got")
  }

  // ---- percolation (reverse search) ---------------------------------------
  test("percolate: and/or/msm matching, early exit, loud validation") {
    import graft.operators.Percolate
    import graft.operators.Percolate.Query
    val d = Seq(
      (1L, "a b c"), (2L, "a x y"), (3L, "b c d"), (4L, ""), (5L, "x y z")
    ).toDF("doc_id", "text")
    val qs = Seq(
      Query(10L, Seq("a", "b"), "and", 1), // docs with both a and b → 1
      Query(20L, Seq("a", "b", "c"), "or", 2), // ≥2 of {a,b,c} → 1, 3
      Query(30L, Seq("z"), "or", 1) // 5
    )
    val got = Percolate.percolate(d, "doc_id", "text", qs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 20L), (3L, 20L), (5L, 30L)), s"got $got")
    intercept[IllegalArgumentException](
      Percolate.percolate(d, "doc_id", "text", Seq(Query(1L, Seq("a"), "xor", 1))))
    intercept[IllegalArgumentException](
      Percolate.percolate(d, "doc_id", "text", Seq(Query(1L, Seq("a"), "or", 2))))
  }

  // ---- linear (min-max) fusion ------------------------------------------
  test("linear fusion: weighted min-max normalization, constant list → 1.0") {
    import graft.query.Hybrid
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 0.0)).toDF("doc_id", "score")
    val b = Seq((3L, 7.0), (2L, 7.0)).toDF("doc_id", "score") // constant list
    val got = Hybrid.linear(Seq((a, 0.7), (b, 0.3)), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a normalizes to 1.0/0.5/0.0; b is constant → every member gets 1.0
    assert(math.abs(got(1L) - 0.7) < 1e-12)
    assert(math.abs(got(2L) - (0.7 * 0.5 + 0.3)) < 1e-12)
    assert(math.abs(got(3L) - 0.3) < 1e-12)
  }

  // ---- Token-budget shard packing --------------------------------------
  test("packing: contiguous prefix-sum shards, layout-independent, bounded overflow") {
    import graft.operators.Packing
    // deterministic ragged token counts
    val rows = (0L until 500L).map(i => (i, 1L + (i * 37 % 113)))
    val df = rows.toDF("doc_id", "n_tokens")
    val budget = 1000L
    // in-test oracle: running total BEFORE each doc, floor-divided
    var acc = 0L
    val exp = rows.map { case (id, t) =>
      val s = acc / budget; acc += t; id -> s
    }.toMap
    val got = Packing.assignShards(df, "doc_id", "n_tokens", budget, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == exp, "greedy contiguous rule")
    // parallelism independence: different partition counts, same shards
    val got7 = Packing.assignShards(df.repartition(13), "doc_id", "n_tokens", budget,
      numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got7 == exp, "layout-independent")
    // every full shard holds >= budget - (maxTok - 1) and < budget + maxTok
    val maxTok = rows.map(_._2).max
    val byShard = rows.map { case (id, t) => (exp(id), t) }.groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val lastShard = byShard.keys.max
    byShard.foreach { case (s, tot) =>
      if (s != lastShard)
        assert(tot >= budget - (maxTok - 1) && tot < budget + maxTok, s"shard $s total $tot")
    }
    // shards are contiguous in doc order
    val ordered = rows.map { case (id, _) => exp(id) }
    assert(ordered == ordered.sorted, "contiguity")
  }
}

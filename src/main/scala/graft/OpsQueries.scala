package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, Multimodal, TextAnalysis}

/** Gate queries for the training-data pipeline operators (dedup families,
  * ANN, text analysis, multimodal plumbing) — merged into
  * `SparkEntry.queries`.
  */
object OpsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents ∪ shifted copy — a corpus where every doc has one exact
    * duplicate (dedup-operator fixtures).
    */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** documents ∪ PREFIX clones (first 25 tokens + unique tail) of every
    * third doc — the exact-substring fixture: shared 25-token prefixes
    * are duplicated SPANS (not duplicated docs), so span detection and
    * island merging both discriminate.
    */
  private def prefixCloneCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text")).where(col("text") =!= "")
    val clones = d.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(array_join(slice(split(col("text"), " "), 1, 25), " "),
          lit(" zzuniq"), col("doc_id").cast("string")).as("text"))
    d.unionByName(clones)
  }

  /** Build-once persisted IVF index per sf dir (≙ SparkEntry.indexFor). */
  private val ivfDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ivfIndexFor(s: SparkSession, dir: String): String =
    ivfDirs.getOrElseUpdate(dir, {
      val name = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = s"/tmp/graft-ivf/$name"
      // format-stamped cache: a stale index (older training/layout) is
      // rebuilt, never silently probed
      val stale = Ann.ivfFormatVersion(out) != Ann.IvfFormatVersion
      if (stale) org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      if (stale || !new java.io.File(s"$out/centroids").exists())
        Ann.ivfBuild(embs(s, dir), "vec_id", "embedding", out, nLists = 16)
      out
    })

  /** Build-once persisted QUANTIZED IVF index (int8 codes in the lists,
    * trained scalar-quant params alongside — the FAISS IVF,SQ8 shape).
    */
  private val ivfqDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ivfqIndexFor(s: SparkSession, dir: String): String =
    ivfqDirs.getOrElseUpdate(dir, {
      val name = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = s"/tmp/graft-ivfq/$name"
      val stale = Ann.ivfFormatVersion(out) != Ann.IvfFormatVersion
      if (stale) org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      if (stale || !new java.io.File(s"$out/quant").exists())
        Ann.ivfBuildQuantized(embs(s, dir), "vec_id", "embedding", out, nLists = 16)
      out
    })

  /** Pre-build the persisted fixtures (bench calls this so gate timings
    * measure queries, not first-use index builds).
    */
  def warmFixtures(s: SparkSession, dir: String): Unit = {
    ivfIndexFor(s, dir)
    ivfqIndexFor(s, dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII redaction (email → ipv4 → phone, fixed stage order): the corpus
    // text is wrapped with deterministic synthesized PII so the scrub has
    // real matches; output = per-doc redacted-text digest + stage counts
    "q_pii_redact" -> { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir).select(
        $"doc_id",
        concat(
          lit("contact u"), $"doc_id".cast("string"), lit("@example.com or +1-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" ip 10.0."), ($"doc_id" % 256).cast("string"), lit(".7 "),
          $"text").as("text"))
      graft.operators.Redact.redact(d, "doc_id", "text")
        .select($"doc_id", md5($"redacted").as("red_md5"),
          $"n_email", $"n_ip", $"n_phone")
    },
    // Gopher repetition quality signals: top-bigram fraction + duplicate-
    // trigram fraction per doc (≥3-token docs)
    "q_quality_repetition" -> { (s, dir) =>
      TextAnalysis.repetition(docs(s, dir), "doc_id", "text")
    },
    // CCNet-style chunk-level dedup over the dup'd corpus: every chunk
    // occurs ≥2× by construction plus any organic intra-corpus repeats
    "q_dedup_chunks" -> { (s, dir) =>
      Dedup.chunkDedup(dupCorpus(s, dir), "doc_id", "text", chunkTokens = 10)
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"))
    },
    // ExactSubstr span dedup (Lee et al. 2022): maximal ≥20-token spans
    // duplicated anywhere in the corpus, rolling dual-hash buckets +
    // per-doc island merge — spans, not whole-doc verdicts
    "q_dedup_spans" -> { (s, dir) =>
      Dedup.substringSpans(prefixCloneCorpus(s, dir), "doc_id", "text", minTokens = 20)
        .select(col("doc_id"), col("span_start"), col("span_end"))
    },
    // the removal half: duplicated-span tokens cut from every doc
    "q_dedup_spans_clean" -> { (s, dir) =>
      Dedup.removeSubstringSpans(prefixCloneCorpus(s, dir), "doc_id", "text", minTokens = 20)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"), col("n_removed"))
    },
    // ES percolator (reverse search / alerting): registered queries
    // broadcast, docs stream through map-side — which alerts fire per doc
    "q_percolate" -> { (s, dir) =>
      import graft.operators.Percolate
      val qs = Seq(
        Percolate.Query(1L, Seq("spark", "merge"), "and", 1),
        Percolate.Query(2L, Seq("window", "batch", "stream"), "or", 2),
        Percolate.Query(3L, Seq("vector"), "or", 1))
      Percolate.percolate(docs(s, dir), "doc_id", "text", qs)
    },
    // CCNet-style LM quality scoring: bigram LM trained on the train
    // split (doc_id%10≠0, the curated-reference stand-in), eval split
    // scored by e6 fixed-point log-probability (order-free integer sums)
    "q_lm_score" -> { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir)
      val model = graft.operators.LmScore.train(d.where($"doc_id" % 10 =!= 0), "text")
      graft.operators.LmScore.score(d.where($"doc_id" % 10 === 0), "doc_id", "text", model)
        .select($"doc_id", $"n_bigrams", $"logp_e6")
    },
    // URL canonicalization + URL-level dedup (the first pass of every
    // crawl pipeline): synthesized url shapes — mixed-case scheme/host,
    // tracking params, unordered params, fragments — must collapse
    "q_url_dedup" -> { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir).select(
        $"doc_id",
        concat(
          when($"doc_id" % 2 === 0, lit("HTTP://Site")).otherwise(lit("http://site")),
          ($"doc_id" % 7).cast("string"), lit(".Example.COM/p/"),
          ($"doc_id" % 50).cast("string"),
          when($"doc_id" % 3 === 0, lit("?utm_source=x&b=2&a=1#frag"))
            .when($"doc_id" % 3 === 1, lit("?a=1&b=2&fbclid=zz"))
            .otherwise(lit("?b=2&a=1"))).as("url"))
      graft.operators.UrlOps.dedupByUrl(d, "doc_id", "url")
        .select($"canon_url", $"keep_id", $"n_dups")
    },
    // exact dedup: hash-groupBy, keep lowest id
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exact(dupCorpus(s, dir), "doc_id", "text")
        .select(col("keep_id"), col("n_dups"))
    },
    // MinHash+LSH at threshold 1.0 over the dup'd corpus: must find
    // exactly the identical-text pairs (identical shingle set ⇒ identical
    // signature ⇒ guaranteed band collision — recall 1.0 at j=1)
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minHashLsh(dupCorpus(s, dir), "doc_id", "text", threshold = 1.0)
        .select(
          col("id_a"), col("id_b"),
          round(col("jaccard") * 10000).cast("long").as("jaccard_e4")
        )
    },
    // exact n-gram Jaccard near-dup pairs (threshold 0.8 on 3-gram sets)
    "q_dedup_ngram" -> { (s, dir) =>
      Dedup.ngramJaccard(dupCorpus(s, dir), "doc_id", "text", n = 3, threshold = 0.8)
        .select(
          col("id_a"), col("id_b"),
          round(col("jaccard") * 10000).cast("long").as("jaccard_e4")
        )
    },
    // near-dup CLUSTERS: connected components over the (oracled) ngram
    // pair set — transitive duplicates collapse to one canonical id;
    // pairless docs are their own singletons. The oracle recomputes the
    // same pair set in SQL and closes it with a recursive CTE.
    "q_dedup_components" -> { (s, dir) =>
      val corpus = dupCorpus(s, dir)
      val pairs = Dedup.ngramJaccard(corpus, "doc_id", "text", n = 3, threshold = 0.8)
      Dedup.connectedComponents(pairs, "id_a", "id_b", corpus, "doc_id")
        .select(col("id"), col("cluster_id"))
    },
    // SimHash near-dup, oracled as a recall check: hamming-0 pairs
    // restricted to exact text equality must equal ALL exact-dup pairs
    // (identical text ⇒ identical simhash ⇒ same chunk buckets ⇒ found);
    // distinct-text hamming-0 collisions are legitimate LSH behavior and
    // are filtered out so DuckDB can independently recompute the set.
    // A broken simhash/banding that MISSES a dup pair fails the row match.
    "q_dedup_simhash" -> { (s, dir) =>
      val corpus = dupCorpus(s, dir)
      val pairs = Dedup.simHash(corpus, "doc_id", "text", maxHamming = 0)
        .select(col("id_a"), col("id_b"))
      val t = corpus.select(col("doc_id"), col("text"))
      pairs
        .join(t.select(col("doc_id").as("id_a"), col("text").as("t_a")), "id_a")
        .join(t.select(col("doc_id").as("id_b"), col("text").as("t_b")), "id_b")
        .where(col("t_a") === col("t_b"))
        .select(col("id_a"), col("id_b"))
    },
    // embedding-cosine near-dup via hyperplane-LSH buckets, oracled against
    // the EXHAUSTIVE pair set ≥ threshold (DuckDB recomputes all-pairs
    // cosine — feasible at gate scale). Exactness holds because identical
    // vectors share every hyperplane sign (guaranteed same bucket ⇒ recall
    // 1.0) and the measured max distinct-pair cosine in this table is 0.51
    // — far below the 0.9999 threshold, so the exhaustive set IS the
    // planted identical pairs.
    "q_dedup_embed" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val dup = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      )
      Dedup.embeddingCosine(dup, "vec_id", "embedding", threshold = 0.9999)
        .select(col("id_a"), col("id_b"))
    },
    // scalar int8 quantization round trip (FAISS SQ8 / ES int8 analog):
    // per-dim (lo, hi) fit + encode/decode in fixed double arithmetic —
    // the DuckDB oracle recomputes the whole pipeline and the per-vector
    // max abs error must hash-match at e4 scale
    "q_quantize_roundtrip" -> { (s, dir) =>
      graft.operators.Quantize.roundTripError(embs(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("err_e4"))
    },
    // brute-force cosine top-10 for query vectors 0..4 (exact baseline)
    "q_ann_bruteforce" -> { (s, dir) =>
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.bruteForceTopK(q, e, "qid", "qvec", "vec_id", "embedding", 10)
        .select(
          col("qid"), col("id"),
          round(col("cosine") * 10000).cast("long").as("cosine_e4")
        )
    },
    // IVF over the build-once persisted, list-partitioned index, probed at
    // FULL width (nProbe = nLists) where IVF is provably exact — the gate
    // oracle is the brute-force top-k SQL, so the whole path (centroid
    // train, list assignment, partition-pruned probe scan, per-list heaps,
    // global merge) is verified end-to-end. Pruned-probe recall and the
    // PartitionFilters plan shape are pinned in OperatorsSpec/PlanSpec.
    "q_ann_ivf" -> { (s, dir) =>
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val idx = ivfIndexFor(s, dir)
      Ann.ivfSearch(s, idx, q, "qid", "qvec", 10, nProbe = 16)
        .select(col("qid"), col("id"), round(col("cosine") * 10000).cast("long").as("cosine_e4"))
    },
    // IVF at PRUNED probes (nProbe 12 of 16 lists), driver-gated as recall
    // containment: per query, ≥8 of the exact brute-force top-10 (itself
    // oracled by q_ann_bruteforce) must survive the pruning — the oracle
    // recomputes the expected verdict (all true) independently, so a
    // centroid/assignment/pruning regression that drops recall fails the
    // hash match. Probe width note: this table is RANDOM 64-dim vectors,
    // where IVF recall ≈ nProbe/nLists by construction (neighbors scatter
    // uniformly across lists — measured hits at nProbe=4 were 2-8/10);
    // real embedding corpora cluster, which is what makes narrow probes
    // usable. 12/16 is the widest setting that still proves partition
    // pruning while clearing the bound deterministically (measured ≥9 at
    // sf0.01 and sf0.1; training is fully deterministic).
    "q_ann_ivf_pruned" -> { (s, dir) =>
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val idx = ivfIndexFor(s, dir)
      val pruned = Ann.ivfSearch(s, idx, q, "qid", "qvec", 10, nProbe = 12)
        .select(col("qid"), col("id"), lit(1L).as("hit"))
      val bf = Ann.bruteForceTopK(q, e, "qid", "qvec", "vec_id", "embedding", 10)
        .select(col("qid"), col("id"))
      bf.join(pruned, Seq("qid", "id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("qid"), (col("hits") >= 8).as("recall_ok"))
    },
    // QUANTIZED IVF (codes in the lists, exact rerank of a 4×-widened
    // candidate set — the FAISS IVF,SQ8 / ES int8_hnsw composition),
    // driver-gated as recall containment exactly like q_ann_ivf_pruned:
    // per query ≥8 of the exact brute-force top-10 must survive
    // quantization + pruning (nProbe 12 of 16). Deterministic: training,
    // quantization, and rerank are all fixed arithmetic.
    "q_ann_ivf_quantized" -> { (s, dir) =>
      val e = embs(s, dir)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val idx = ivfqIndexFor(s, dir)
      val quant = Ann.ivfSearchQuantized(s, idx, q,
        e.select(col("vec_id"), col("embedding")),
        "qid", "qvec", "vec_id", "embedding", 10, nProbe = 12, rerankFactor = 4)
        .select(col("qid"), col("id"), lit(1L).as("hit"))
      val bf = Ann.bruteForceTopK(q, e, "qid", "qvec", "vec_id", "embedding", 10)
        .select(col("qid"), col("id"))
      bf.join(quant, Seq("qid", "id"), "left")
        .groupBy(col("qid"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("qid"), (col("hits") >= 8).as("recall_ok"))
    },
    // language-ID heuristic per doc
    "q_lang_id" -> { (s, dir) =>
      TextAnalysis.analyze(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang_pred"))
    },
    // quality + token-count features
    "q_text_quality" -> { (s, dir) =>
      TextAnalysis.analyze(docs(s, dir), "doc_id", "text")
        .select(
          col("doc_id"), col("n_tokens"), col("n_ws_tokens"),
          col("n_bpeish_tokens"), col("mean_token_len_e6"),
          col("stopword_ratio_e6"), col("max_repeat_ratio_e6")
        )
    },
    // order-sensitive rolling-hash fingerprint: dup'd corpus must yield
    // exactly 500 distinct fingerprints over 1000 docs (rows-only + the
    // count is what the oracle checks)
    "q_fingerprint" -> { (s, dir) =>
      TextAnalysis.analyze(dupCorpus(s, dir), "doc_id", "text")
        .groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
    },
    // native codegen Expression (graft_cosine) through the SQL registry
    "q_cosine_expr" -> { (s, dir) =>
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val e = embs(s, dir)
      val q = e.where($"vec_id" === 0).select($"embedding".as("qvec"))
      e.crossJoin(broadcast(q))
        .select(
          $"vec_id",
          round(graft.plans.GraftFunctions.cosineSim($"embedding", $"qvec") * 10000)
            .cast("long").as("cosine_e4")
        )
    },
    // P9: recursive variant→string render (genuine UDF, ≙ LgpReader.cs:178-220)
    "q_variant_render" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.VariantRenderer._
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"), col("user_id"))
        .as[(Long, String, Double, Long)]
        .map { case (id, et, v, uid) =>
          val tree = P(Seq(S(et), B(v > 50), P(Seq(R(s"u$uid"), U))))
          (id, render(tree))
        }
        .toDF("event_id", "rendered")
    },
    // P4: epoch-seconds→timestamp with 0 ⇒ epoch sentinel (≙ LgpReader.cs:133-136).
    // Emits the decoded instant FORMATTED so the oracle recomputes the
    // epoch→timestamp conversion independently (not a round-trip identity).
    "q_epoch_decode" -> { (s, dir) =>
      import s.implicits._
      s.read.parquet(s"$dir/events.parquet")
        .select(
          $"event_id",
          when(floor($"value").cast("long") === 0L, lit(0L))
            .otherwise(unix_seconds(timestamp_seconds(floor($"value").cast("long"))))
            .as("decoded_epoch"),
          date_format(timestamp_seconds(floor($"value").cast("long")), "yyyy-MM-dd HH:mm:ss")
            .as("decoded_ts")
        )
    },
    // P13: [IBNAME] template expansion over mask-matched names
    // (≙ ClstWatcher.cs:64-71)
    "q_template_expand" -> { (s, dir) =>
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select($"source").distinct()
        .where($"source".rlike("^src[0-9]+$"))
        .select(
          $"source",
          regexp_replace(lit("idx-[IBNAME]-prod"), lit("\\[IBNAME\\]"), $"source").as("index_name")
        )
    },
    // multimodal: image rows carry REAL format bytes — valid PNG
    // (signature + IHDR + CRC) for id%6=0, valid JPEG (SOI + JFIF APP0 +
    // SOF0) for id%6=3 — decoded by the actual byte-level header parsers;
    // audio/video stay on the marked "GRFT" stub (no media libs in this
    // container). Oracled: dims/channels derive from doc_id via
    // SQL-recomputable arithmetic, so DuckDB independently re-derives
    // kind/width/height/channels and the resize result — a wrong PNG CRC
    // layout, IHDR offset, or JPEG marker walk fails the hash match.
    "q_media_meta" -> { (s, dir) =>
      import s.implicits._
      val media = docs(s, dir)
        .select(col("doc_id").cast("long"))
        .as[Long]
        .map { id =>
          val blob =
            if (id % 6 == 0) Multimodal.synthesizePng(id)
            else if (id % 6 == 3) Multimodal.synthesizeJpeg(id)
            else Multimodal.synthesize(id)
          (id, blob)
        }
        .toDF("id", "media")
      val meta = Multimodal.extractMeta(media, "id", "media")
      Multimodal.resizePlan(meta, maxSide = 256)
        .join(meta.toDF().select(col("id"), col("channels")), "id")
        .select(
          col("id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("out_w").cast("long").as("out_w"),
          col("out_h").cast("long").as("out_h")
        )
    },
    // REAL PNG pixel path end-to-end: encode deterministic small images
    // (real zlib IDAT, CRC'd chunks) → decode (inflate + defilter) →
    // integer pixel aggregates. DuckDB expands the pixel generator
    // formula independently, so a wrong filter reconstruction, stride,
    // or inflate boundary fails the hash — the codec is gated on its
    // PIXELS, not just its header
    "q_media_pixels" -> { (s, dir) =>
      import s.implicits._
      val media = docs(s, dir)
        .select(col("doc_id").cast("long"))
        .as[Long]
        .map(id => (id, Multimodal.synthesizePngImage(id)))
        .toDF("id", "media")
      Multimodal.pixelStats(media, "id", "media")
        .select(col("id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("n_samples"), col("pixel_sum"),
          col("min_v").cast("long").as("min_v"),
          col("max_v").cast("long").as("max_v"))
    },
    // multimodal frame sampling: every-4th frame index per video blob —
    // frame count derives from the fake payload length, so DuckDB
    // recomputes the expected (id, frame_idx) set independently
    "q_media_frames" -> { (s, dir) =>
      import s.implicits._
      val media = docs(s, dir)
        .select(col("doc_id").cast("long"))
        .as[Long]
        .map(id => (id, Multimodal.synthesize(id)))
        .toDF("id", "media")
      val meta = Multimodal.extractMeta(media, "id", "media")
      Multimodal.sampleFrames(meta, everyNth = 4)
        .select(
          col("id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("fps").cast("long").as("fps")
        )
    }
  )

  private val enSw = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "a")

  def oracleSql: Map[String, String] = Map(
    "q_pii_redact" -> {
      val em = graft.operators.Redact.EmailRe
      val ip = graft.operators.Redact.Ipv4Re
      val ph = graft.operators.Redact.PhoneRe
      s"""WITH aug AS (
  SELECT doc_id,
         'contact u' || doc_id || '@example.com or +1-555-' ||
         lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
         ' ip 10.0.' || (doc_id % 256)::VARCHAR || '.7 ' || text AS text
  FROM documents
), st AS (
  SELECT doc_id, text AS t0,
         regexp_replace(text, '$em', '<EMAIL>', 'g') AS t1
  FROM aug
), st2 AS (
  SELECT doc_id, t0, t1, regexp_replace(t1, '$ip', '<IP>', 'g') AS t2 FROM st
)
SELECT doc_id,
       md5(regexp_replace(t2, '$ph', '<PHONE>', 'g')) AS red_md5,
       len(regexp_extract_all(t0, '$em'))::BIGINT AS n_email,
       len(regexp_extract_all(t1, '$ip'))::BIGINT AS n_ip,
       len(regexp_extract_all(t2, '$ph'))::BIGINT AS n_phone
FROM st2"""
    },
    "q_quality_repetition" ->
      """WITH tl AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE text <> '' AND len(string_split(text, ' ')) >= 3
), big AS (
  SELECT doc_id, l[i] || ' ' || l[i + 1] AS g
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM tl)
), bstat AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS tot
  FROM (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2) GROUP BY 1
), tri AS (
  SELECT doc_id, l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS g
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM tl)
), tstat AS (
  SELECT doc_id, count(DISTINCT g) AS dist, count(*) AS tot FROM tri GROUP BY 1
)
SELECT b.doc_id,
       round(b.mx * 1e6 / b.tot)::BIGINT AS top_bigram_e6,
       round((t.tot - t.dist) * 1e6 / t.tot)::BIGINT AS dup_trigram_e6
FROM bstat b JOIN tstat t USING (doc_id)""",
    "q_dedup_spans" ->
      """WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text <> ''
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string(string_split(text, ' ')[1:25], ' ') || ' zzuniq' || doc_id AS text
  FROM documents WHERE text <> '' AND doc_id % 3 = 0
), tl AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM corpus
), w AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(l[i:i+19], ' ') AS win
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 19)) AS i FROM tl WHERE len(l) >= 20)
), dup AS (
  SELECT win FROM w GROUP BY 1 HAVING count(*) >= 2
), d AS (
  SELECT w.doc_id, w.pos FROM w JOIN dup USING (win)
), g AS (
  SELECT doc_id, pos,
         sum(CASE WHEN pos - prev > 20 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM (SELECT doc_id, pos,
               coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos) AS prev
        FROM d)
)
SELECT doc_id, min(pos)::BIGINT AS span_start, (max(pos) + 20)::BIGINT AS span_end
FROM g GROUP BY doc_id, grp ORDER BY 1, 2""",
    "q_dedup_spans_clean" ->
      """WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text <> ''
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string(string_split(text, ' ')[1:25], ' ') || ' zzuniq' || doc_id AS text
  FROM documents WHERE text <> '' AND doc_id % 3 = 0
), tl AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM corpus
), w AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(l[i:i+19], ' ') AS win
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 19)) AS i FROM tl WHERE len(l) >= 20)
), dup AS (
  SELECT win FROM w GROUP BY 1 HAVING count(*) >= 2
), d AS (
  SELECT w.doc_id, w.pos FROM w JOIN dup USING (win)
), g AS (
  SELECT doc_id, pos,
         sum(CASE WHEN pos - prev > 20 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM (SELECT doc_id, pos,
               coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos) AS prev
        FROM d)
), spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + 20 AS span_end
  FROM g GROUP BY doc_id, grp
), tok AS (
  SELECT doc_id, l[i] AS tok, i - 1 AS idx
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM tl)
), kept AS (
  SELECT t.doc_id, t.tok, t.idx FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM spans sp
                    WHERE sp.doc_id = t.doc_id
                      AND t.idx >= sp.span_start AND t.idx < sp.span_end)
), keptagg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text, count(*) AS n_kept
  FROM kept GROUP BY 1
), total AS (
  SELECT doc_id, len(l) AS n_tok FROM tl
)
SELECT c.doc_id, md5(coalesce(k.clean_text, '')) AS clean_md5,
       (t.n_tok - coalesce(k.n_kept, 0))::BIGINT AS n_removed
FROM corpus c JOIN total t USING (doc_id) LEFT JOIN keptagg k USING (doc_id)
ORDER BY 1""",
    "q_dedup_chunks" ->
      """WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text <> ''
  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE text <> ''
), tl AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM corpus
), ch AS (
  SELECT doc_id, array_to_string(l[(i - 1) * 10 + 1:i * 10], ' ') AS chunk
  FROM (SELECT doc_id, l, unnest(generate_series(1, (len(l) + 9) // 10)) AS i FROM tl)
), cnt AS (
  SELECT chunk, count(*) AS c FROM ch GROUP BY 1
)
SELECT ch.doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
FROM ch JOIN cnt USING (chunk) GROUP BY 1""",
    "q_url_dedup" ->
      """WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://Site' ELSE 'http://site' END)
         || (doc_id % 7)::VARCHAR || '.Example.COM/p/' || (doc_id % 50)::VARCHAR
         || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1#frag'
                  WHEN doc_id % 3 = 1 THEN '?a=1&b=2&fbclid=zz'
                  ELSE '?b=2&a=1' END) AS url
  FROM documents
), c AS (
  SELECT doc_id,
         regexp_extract(regexp_replace(url, '#.*$', ''), '^([^?]*)', 1) AS base,
         regexp_extract(regexp_replace(url, '#.*$', ''), '\?(.*)$', 1) AS q
  FROM u
), c2 AS (
  SELECT doc_id, base,
         regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1) AS sh, q
  FROM c
), canon AS (
  SELECT doc_id,
         lower(sh) || substr(base, length(sh) + 1) ||
         (CASE WHEN sorted = '' THEN '' ELSE '?' || sorted END) AS canon_url
  FROM (SELECT doc_id, base, sh,
               array_to_string(list_sort(list_filter(string_split(q, '&'),
                 p -> NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=') AND p <> '')), '&') AS sorted
        FROM c2)
)
SELECT canon_url, min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups
FROM canon GROUP BY 1""",
    "q_lm_score" ->
      """WITH tr AS (
  SELECT string_split(text, ' ') AS l FROM documents WHERE doc_id % 10 <> 0 AND text <> ''
), uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(l) AS w FROM tr) GROUP BY 1
), v AS (
  SELECT count(*)::BIGINT AS vocab FROM uni
), bi AS (
  SELECT l[i] AS w1, l[i + 1] AS w2, count(*) AS c
  FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i FROM tr) GROUP BY 1, 2
), ev AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE doc_id % 10 = 0 AND text <> '' AND len(string_split(text, ' ')) >= 2
), evb AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM ev)
)
SELECT e.doc_id, count(*)::BIGINT AS n_bigrams,
       sum(round(ln((coalesce(b.c, 0) + 1)::DOUBLE / (coalesce(u.c, 0) + v.vocab)::DOUBLE) * 1e6))::BIGINT AS logp_e6
FROM evb e
LEFT JOIN bi b ON b.w1 = e.w1 AND b.w2 = e.w2
LEFT JOIN uni u ON u.w = e.w1
CROSS JOIN v
GROUP BY 1""",
    "q_percolate" ->
      """WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text <> ''
), m1 AS (
  SELECT doc_id, 1 AS query_id FROM toks WHERE term IN ('spark', 'merge')
  GROUP BY 1 HAVING count(DISTINCT term) = 2
), m2 AS (
  SELECT doc_id, 2 AS query_id FROM toks WHERE term IN ('window', 'batch', 'stream')
  GROUP BY 1 HAVING count(DISTINCT term) >= 2
), m3 AS (
  SELECT doc_id, 3 AS query_id FROM toks WHERE term = 'vector' GROUP BY 1
)
SELECT doc_id, query_id::BIGINT AS query_id
FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)""",
    "q_dedup_exact" ->
      """WITH u AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 100000, text FROM documents)
         SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM u GROUP BY text""",
    "q_dedup_minhash" ->
      """WITH u AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 100000, text FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, 10000 AS jaccard_e4
         FROM u a JOIN u b ON a.text = b.text AND a.doc_id < b.doc_id
         WHERE a.text <> ''""",
    "q_dedup_ngram" ->
      """WITH u AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 100000, text FROM documents),
         toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM u WHERE text <> ''),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
           FROM toks a
           JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
                round((i::DOUBLE / (za.n + zb.n - i)) * 10000)::BIGINT AS jaccard_e4
         FROM inter JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
         WHERE i::DOUBLE / (za.n + zb.n - i) >= 0.8""",
    "q_dedup_components" ->
      """WITH RECURSIVE u AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 100000, text FROM documents),
         toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM u WHERE text <> ''),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
           FROM toks a
           JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
           FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
           WHERE i::DOUBLE / (za.n + zb.n - i) >= 0.8),
         und AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM und
           UNION
           SELECT r.a, d.b FROM reach r JOIN und d ON r.b = d.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
         SELECT n.doc_id AS id, coalesce(c.cluster_id, n.doc_id) AS cluster_id
         FROM (SELECT doc_id FROM u) n LEFT JOIN comp c ON c.id = n.doc_id""",
    "q_quantize_roundtrip" ->
      """WITH u AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
           FROM embeddings
         ), dims AS (
           SELECT dim, min(v) AS lo, max(v) AS hi FROM u GROUP BY 1
         ), recon AS (
           SELECT u.vec_id,
                  CASE WHEN d.hi = d.lo THEN CAST(d.lo AS DOUBLE)
                       ELSE CAST(d.lo AS DOUBLE)
                            + round((CAST(u.v AS DOUBLE) - CAST(d.lo AS DOUBLE)) * 255.0
                                    / (CAST(d.hi AS DOUBLE) - CAST(d.lo AS DOUBLE)))
                              * (CAST(d.hi AS DOUBLE) - CAST(d.lo AS DOUBLE)) / 255.0 END AS r,
                  CAST(u.v AS DOUBLE) AS v
           FROM u JOIN dims d USING (dim)
         )
         SELECT vec_id, round(max(abs(r - v)) * 10000)::BIGINT AS err_e4
         FROM recon GROUP BY 1""",
    "q_ann_bruteforce" -> {
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, e.vec_id AS id,
                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) AS c,
                  row_number() OVER (PARTITION BY q.qid
                    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) DESC,
                             e.vec_id ASC) AS rnk
           FROM embeddings e CROSS JOIN q)
         SELECT qid, id, round(c * 10000)::BIGINT AS cosine_e4
         FROM scored WHERE rnk <= 10"""
    },
    "q_lang_id" -> {
      val vals = enSw.map(w => s"('en', '$w')") ++
        Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu", "den").map(w => s"('de', '$w')") ++
        Seq("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que", "pour").map(w => s"('fr', '$w')") ++
        Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "con", "para").map(w => s"('es', '$w')")
      s"""WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE text <> ''),
         sw(lang, tok) AS (VALUES ${vals.mkString(", ")}),
         hits AS (
           SELECT t.doc_id, s.lang, count(DISTINCT s.tok) AS h
           FROM (SELECT DISTINCT doc_id, tok FROM toks) t
           JOIN sw s ON t.tok = s.tok GROUP BY 1, 2),
         best AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
           FROM hits)
         SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
         FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1"""
    },
    "q_text_quality" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE text <> ''),
         base AS (
           SELECT doc_id, count(*) AS n_tokens,
                  round(avg(len(tok)) * 1000000)::BIGINT AS mean_token_len_e6,
                  sum((len(tok) + 3) // 4)::BIGINT AS n_bpeish_tokens,
                  round(((count(*) FILTER (tok IN ('the','and','of','to','in','is','that','it','was','for','with','a')))::DOUBLE / count(*)) * 1000000)::BIGINT AS stopword_ratio_e6
           FROM toks GROUP BY doc_id),
         rep AS (
           SELECT doc_id, max(c) AS max_tf, sum(c) AS n FROM (
             SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
           GROUP BY doc_id)
         SELECT b.doc_id, b.n_tokens, b.n_tokens AS n_ws_tokens, b.n_bpeish_tokens,
                b.mean_token_len_e6, b.stopword_ratio_e6,
                round((r.max_tf::DOUBLE / r.n) * 1000000)::BIGINT AS max_repeat_ratio_e6
         FROM base b JOIN rep r USING (doc_id)""",
    "q_cosine_expr" ->
      """SELECT e.vec_id,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) * 10000)::BIGINT AS cosine_e4
         FROM embeddings e
         CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q""",
    "q_variant_render" ->
      """SELECT event_id,
                'Item 1: ' || event_type || chr(10) ||
                'Item 2: ' || CASE WHEN value > 50 THEN 'true' ELSE 'false' END || chr(10) ||
                'Item 3:   Item 1: u' || user_id || chr(10) ||
                '  Item 2:' AS rendered
         FROM events""",
    "q_epoch_decode" ->
      """SELECT event_id,
                CASE WHEN floor(value)::BIGINT = 0 THEN 0
                     ELSE floor(value)::BIGINT END AS decoded_epoch,
                strftime(epoch_ms(floor(value)::BIGINT * 1000), '%Y-%m-%d %H:%M:%S') AS decoded_ts
         FROM events""",
    "q_dedup_simhash" ->
      """WITH u AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 100000, text FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM u a JOIN u b ON a.text = b.text AND a.doc_id < b.doc_id""",
    "q_dedup_embed" ->
      """WITH u AS (SELECT vec_id, embedding FROM embeddings
                    UNION ALL SELECT vec_id + 100000, embedding FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM u a JOIN u b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.9999""",
    "q_ann_ivf" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, e.vec_id AS id,
                  list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) AS c,
                  row_number() OVER (PARTITION BY q.qid
                    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) DESC,
                             e.vec_id ASC) AS rnk
           FROM embeddings e CROSS JOIN q)
         SELECT qid, id, round(c * 10000)::BIGINT AS cosine_e4
         FROM scored WHERE rnk <= 10""",
    "q_ann_ivf_pruned" ->
      """SELECT vec_id AS qid, true AS recall_ok FROM embeddings WHERE vec_id < 5""",
    "q_ann_ivf_quantized" ->
      """SELECT vec_id AS qid, true AS recall_ok FROM embeddings WHERE vec_id < 5""",
    "q_media_meta" ->
      """WITH m AS (
           SELECT doc_id AS id,
                  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                  (16 + (doc_id * 7919) % 1024)::BIGINT AS width,
                  (16 + (doc_id * 104729) % 1024)::BIGINT AS height,
                  CASE
                    WHEN doc_id % 6 = 0 THEN  -- PNG color type {gray, RGB, RGBA}
                      (CASE ((doc_id // 6) % 3) WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)
                    WHEN doc_id % 6 = 3 THEN  -- JPEG components {YCbCr, gray}
                      (CASE ((doc_id // 6) % 2) WHEN 0 THEN 3 ELSE 1 END)
                    ELSE (1 + (doc_id * 7) % 4)  -- GRFT stub header
                  END::BIGINT AS channels
           FROM documents),
         sc AS (
           SELECT *, CASE WHEN greatest(width, height) <= 256 THEN 1.0::DOUBLE
                          ELSE 256.0::DOUBLE / greatest(width, height) END AS scale
           FROM m)
         SELECT id, kind, width, height, channels,
                ceil(width * scale)::BIGINT AS out_w,
                ceil(height * scale)::BIGINT AS out_h
         FROM sc""",
    "q_template_expand" ->
      """SELECT source, 'idx-' || source || '-prod' AS index_name
         FROM (SELECT DISTINCT source FROM documents)
         WHERE regexp_matches(source, '^src[0-9]+$')""",
    "q_media_pixels" ->
      """WITH dims AS (
           SELECT doc_id, (4 + (doc_id * 7919) % 16)::BIGINT AS w,
                  (4 + (doc_id * 104729) % 16)::BIGINT AS h,
                  (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)::BIGINT AS ch
           FROM documents),
         px AS (
           SELECT d.doc_id, d.w, d.h, d.ch,
                  ((d.doc_id + 3 * x.x + 7 * y.y + 11 * c.c) % 256) AS v
           FROM dims d
           JOIN generate_series(0, 19) AS x(x) ON x.x < d.w
           JOIN generate_series(0, 19) AS y(y) ON y.y < d.h
           JOIN generate_series(0, 3) AS c(c) ON c.c < d.ch)
         SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
                any_value(ch) AS channels, count(*)::BIGINT AS n_samples,
                sum(v)::BIGINT AS pixel_sum, min(v)::BIGINT AS min_v,
                max(v)::BIGINT AS max_v
         FROM px GROUP BY 1""",
    "q_media_frames" ->
      """WITH v AS (
           SELECT doc_id AS id, ((64 + (doc_id * 997) % 4096) // 16)::INT AS frames
           FROM documents WHERE doc_id % 3 = 2)
         SELECT id, unnest(range(0, frames, 4))::BIGINT AS frame_idx, 24::BIGINT AS fps
         FROM v""",
    "q_fingerprint" ->
      """WITH u AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 100000, text FROM documents)
         SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM u GROUP BY text"""
  )
}

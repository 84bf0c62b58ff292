package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.query.{NaiveBm25, Search}
import graft.sources.HtmlText

/** Property: WAND top-k ≡ exhaustive-scoring top-k on random corpora
  * (SURVEY.md §5.2) — random tiny vocabularies maximize ties, empty docs,
  * single-posting terms, and block-boundary cases that the fixed
  * generator corpus can't cover densely.
  */
class WandPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")

  private def corpusGen: Gen[List[String]] =
    Gen.chooseNum(5, 120).flatMap { n =>
      Gen.listOfN(
        n,
        Gen.frequency(
          9 -> Gen.chooseNum(1, 30).flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))),
          1 -> Gen.const("") // empty docs
        )
      )
    }

  private def queryGen: Gen[(List[String], String)] =
    for {
      nt <- Gen.chooseNum(1, 3)
      ts <- Gen.listOfN(nt, Gen.oneOf(vocab :+ "zz")) // zz never occurs
      mode <- Gen.oneOf("and", "or")
    } yield (ts, mode)

  test("WAND top-k ≡ naive exhaustive top-k on random corpora (20 corpora × 6 queries)") {
    (0 until 20).foreach { trial =>
      val texts = corpusGen(Gen.Parameters.default, Seed(1000L + trial)).get
      val dir = Files.createTempDirectory(s"wand-prop-$trial").toString
      val pages = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
        val url = f"p/$i%06d"
        Page(url, new java.sql.Timestamp(1609459200000L + i), HtmlText.wrap(url, t), t, "en")
      })
      // tiny blockSize forces multi-block lists; multiple slices + groups
      IndexBuilder.build(spark, pages, dir,
        BuildConfig(nPartitions = 4, nGroups = 2, nSlices = 4, blockSize = 4))
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      (0 until 6).foreach { q =>
        val (terms, mode) = queryGen(Gen.Parameters.default, Seed(5000L + trial * 31 + q)).get
        val expected = NaiveBm25.topK(corpus, terms, mode, 5)
        val got = Search.topK(spark, dir, terms, mode, 5)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(got.length == expected.length, s"trial $trial q=$terms/$mode size: got ${got.toSeq} want $expected")
        expected.zip(got).foreach { case (e, (gid, gs)) =>
          assert(gid == e.docId && math.abs(gs - e.score) < 1e-9,
            s"trial $trial q=$terms/$mode: got ${got.toSeq} want $expected")
        }
      }
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("AND block-max gate: common-term intersection skips block decodes, rank-safe") {
    // two corpus-wide terms (intersection = corpus-sized): the ungated
    // leapfrog decoded and scored every posting; with the skip gate, once
    // top-k holds the high-impact docs every uniform block's Σ bound is
    // below θ and is jumped without decoding. Pure unit shape — synthetic
    // blocks, no Spark.
    import graft.query.BlockMaxWand
    import graft.query.BlockMaxWand.{BlockRef, PostingIter}
    import graft.functions.Codec
    import graft.index.IndexBuilder.impact
    val n = 10000
    val blockSize = 128
    val avgDl = 100.0
    val special = Set(100L, 150L) // early high-impact docs → θ rises fast
    def blocksOf(): Array[BlockRef] =
      (0 until n by blockSize).map { start =>
        val ids = (start until math.min(n, start + blockSize)).map(_.toLong).toArray
        val tfs = ids.map(i => if (special(i)) 50 else 1)
        val dls = ids.map(i => if (special(i)) 10 else 100)
        val maxImp = ids.indices.map(j => impact(tfs(j), dls(j), avgDl)).max
        BlockRef(ids.head, ids.last, ids.length,
          Codec.encodeGapsFromBase(ids), Codec.encodeIntsAuto(tfs),
          Codec.encodeIntsAuto(dls), Array.empty[Byte], maxImp)
      }.toArray
    val idf = 0.5
    val nBlocks = blocksOf().length
    BlockMaxWand.blockDecodes.reset()
    val hits = BlockMaxWand.and(
      Array(new PostingIter(0, idf, blocksOf(), avgDl),
            new PostingIter(1, idf, blocksOf(), avgDl)), 2)
    val decodes = BlockMaxWand.blockDecodes.sum()
    // rank + score identity: the two special docs, exact BM25 sum
    assert(hits.map(_.docId).toSeq == Seq(100L, 150L), hits.mkString(","))
    hits.foreach(h =>
      assert(math.abs(h.score - 2 * idf * impact(50, 10, avgDl)) < 1e-12))
    // the gate must leave the overwhelming majority of the 2×79 blocks
    // undecoded (ungated this is exactly 2×79)
    assert(decodes <= 8, s"AND gate decoded $decodes of ${2 * nBlocks} blocks")
  }

  test("filtered WAND and phrase ≡ naive oracles on random corpora (8 corpora)") {
    import org.apache.spark.sql.functions.col
    (0 until 8).foreach { trial =>
      val texts = corpusGen(Gen.Parameters.default, Seed(9000L + trial)).get
      val dir = Files.createTempDirectory(s"wand-fp-$trial").toString
      val pages = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
        val url = f"p/$i%06d"
        // lang cycles 3 values — the filter dimension
        Page(url, new java.sql.Timestamp(1609459200000L + i), HtmlText.wrap(url, t), t, s"l${i % 3}")
      })
      IndexBuilder.build(spark, pages, dir,
        BuildConfig(nPartitions = 4, nGroups = 2, nSlices = 4, blockSize = 4))
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // filtered: random query, filter lang == l{trial%3}
      (0 until 3).foreach { q =>
        val (terms, mode) = queryGen(Gen.Parameters.default, Seed(7000L + trial * 17 + q)).get
        val lang = s"l${(trial + q) % 3}"
        val expected = NaiveBm25.topKFiltered(corpus, terms, mode, 5, id => id % 3 == lang.drop(1).toInt)
        val got = Search.topK(spark, dir, terms, mode, 5, docFilter = col("lang") === lang)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(got.map(_._1).toSeq == expected.map(_.docId),
          s"trial $trial filtered $terms/$mode/$lang: got ${got.toSeq} want $expected")
        expected.zip(got).foreach { case (e, (_, gs)) => assert(math.abs(gs - e.score) < 1e-9) }
        // sidecar path must agree with the allow-list path exactly
        val gotA = Search.topK(spark, dir, terms, mode, 5,
          attrFilter = graft.index.AttrPred.lang(lang))
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(gotA.toSeq == got.toSeq,
          s"trial $trial sidecar≠allow-list for $terms/$mode/$lang: ${gotA.toSeq} vs ${got.toSeq}")
      }
      // phrase: random 2-3 gram from the vocabulary (may or may not occur)
      (0 until 3).foreach { q =>
        val phrase = Gen.listOfN(2 + (trial + q) % 2, Gen.oneOf(vocab))
          .apply(Gen.Parameters.default, Seed(8000L + trial * 13 + q)).get
        val expected = NaiveBm25.phraseTopK(corpus, phrase, 5)
        val got = Search.phraseTopK(spark, dir, phrase, 5)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(got.map(_._1).toSeq == expected.map(_.docId),
          s"trial $trial phrase $phrase: got ${got.toSeq} want $expected")
        expected.zip(got).foreach { case (e, (_, gs)) => assert(math.abs(gs - e.score) < 1e-9) }
      }
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("sloppy phrase ≡ naive greedy-chain oracle on random corpora (8 corpora); slop=0 ≡ exact") {
    (0 until 8).foreach { trial =>
      val texts = corpusGen(Gen.Parameters.default, Seed(12000L + trial)).get
      val dir = Files.createTempDirectory(s"wand-slop-$trial").toString
      val pages = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
        val url = f"p/$i%06d"
        Page(url, new java.sql.Timestamp(1609459200000L + i), HtmlText.wrap(url, t), t, s"l${i % 3}")
      })
      IndexBuilder.build(spark, pages, dir,
        BuildConfig(nPartitions = 4, nGroups = 2, nSlices = 4, blockSize = 4))
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      (0 until 4).foreach { q =>
        val phrase = Gen.listOfN(2 + (trial + q) % 2, Gen.oneOf(vocab))
          .apply(Gen.Parameters.default, Seed(13000L + trial * 13 + q)).get
        val slop = (trial + q) % 4
        val expected = NaiveBm25.phraseSlopTopK(corpus, phrase, slop, 5)
        val got = Search.phraseTopK(spark, dir, phrase, 5, slop = slop)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(got.map(_._1).toSeq == expected.map(_.docId),
          s"trial $trial slop=$slop $phrase: got ${got.toSeq} want $expected")
        expected.zip(got).foreach { case (e, (_, gs)) => assert(math.abs(gs - e.score) < 1e-9) }
        if (slop == 0) {
          // the greedy chain at slop 0 IS exact adjacency — the two code
          // paths must agree bit-for-bit
          val exact = Search.phraseTopK(spark, dir, phrase, 5)
            .collect().map(r => (r.getLong(0), r.getDouble(1)))
          assert(exact.toSeq == got.toSeq,
            s"trial $trial slop0≠exact for $phrase: ${exact.toSeq} vs ${got.toSeq}")
        }
      }
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("bool surface (must_not, minimum_should_match, search_after) ≡ naive on random corpora (8 corpora)") {
    import graft.functions.Analyzer
    (0 until 8).foreach { trial =>
      val texts = corpusGen(Gen.Parameters.default, Seed(12000L + trial)).get
      val dir = Files.createTempDirectory(s"wand-bool-$trial").toString
      val pages = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
        val url = f"p/$i%06d"
        Page(url, new java.sql.Timestamp(1609459200000L + i), HtmlText.wrap(url, t), t, "en")
      })
      IndexBuilder.build(spark, pages, dir,
        BuildConfig(nPartitions = 4, nGroups = 2, nSlices = 4, blockSize = 4))
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val tokSets = corpus.map { case (_, t) => Analyzer.tokenize(t).toSet }

      // must_not: random 1-2 exclusions (may include query terms / absent terms)
      (0 until 3).foreach { q =>
        val (terms, mode) = queryGen(Gen.Parameters.default, Seed(13000L + trial * 17 + q)).get
        val mn = Gen.listOfN(1 + (trial + q) % 2, Gen.oneOf(vocab :+ "zz"))
          .apply(Gen.Parameters.default, Seed(13500L + trial * 13 + q)).get
        val expected = NaiveBm25.topKFiltered(corpus, terms, mode, 5,
          id => !mn.exists(tokSets(id.toInt).contains))
        val got = Search.topK(spark, dir, terms, mode, 5, mustNot = mn)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(got.map(_._1).toSeq == expected.map(_.docId),
          s"trial $trial $terms/$mode NOT $mn: got ${got.toSeq} want $expected")
        expected.zip(got).foreach { case (e, (_, gs)) => assert(math.abs(gs - e.score) < 1e-9) }
      }

      // minimum_should_match over 2-3 term OR queries, msm 2..terms
      (0 until 3).foreach { q =>
        val nt = 2 + (trial + q) % 2
        val ts = Gen.listOfN(nt, Gen.oneOf(vocab))
          .apply(Gen.Parameters.default, Seed(14000L + trial * 19 + q)).get.distinct
        val msm = 2.min(ts.size)
        val expected = NaiveBm25.topKFiltered(corpus, ts, "or", 5,
          id => ts.count(tokSets(id.toInt).contains) >= msm)
        val got = Search.topK(spark, dir, ts, "or", 5, minShouldMatch = msm)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(got.map(_._1).toSeq == expected.map(_.docId),
          s"trial $trial msm $ts>=$msm: got ${got.toSeq} want $expected")
        expected.zip(got).foreach { case (e, (_, gs)) => assert(math.abs(gs - e.score) < 1e-9) }
      }

      // search_after: page-3 walk over a random OR query reconstructs the
      // exhaustive ranking exactly (ties + tiny vocab stress the cursor)
      {
        val ts = Gen.listOfN(2, Gen.oneOf(vocab))
          .apply(Gen.Parameters.default, Seed(15000L + trial)).get.distinct
        val full = NaiveBm25.topK(corpus, ts, "or", corpus.size)
        val walked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        var page = Search.topK(spark, dir, ts, "or", 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        while (page.nonEmpty) {
          walked ++= page
          page = Search.topK(spark, dir, ts, "or", 3,
            searchAfter = (page.last._2, page.last._1))
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        }
        assert(walked.map(_._1).toSeq == full.map(_.docId),
          s"trial $trial paging $ts: got ${walked.map(_._1)} want ${full.map(_.docId)}")
      }

      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}

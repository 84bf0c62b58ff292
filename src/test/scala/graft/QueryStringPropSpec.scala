package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Analyzer
import graft.index.{AttrPred, IndexBuilder}
import graft.index.IndexBuilder.{BuildConfig, B, K1}
import graft.query.{NaiveBm25, QueryString}
import graft.query.QueryString._
import graft.sources.HtmlText

/** Properties over RANDOM query_string trees:
  *   1. parse(print(tree)) == tree (printer/parser round trip);
  *   2. engine evaluation ≡ an INDEPENDENT naive evaluator implementing
  *      the documented bool semantics over the raw corpus.
  * Random trees hit clause combinations (filter-should under must,
  * nested negation, boost-carrying groups…) the hand-written spec can't
  * enumerate.
  */
class QueryStringPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
  private val langs = Vector("en", "ru", "de")
  private val NDocs = 400

  private lazy val (dir, corpus, langOf): (String, Vector[(Long, String)], Map[Long, String]) = {
    val texts = Gen.listOfN(NDocs,
      Gen.frequency(
        9 -> Gen.chooseNum(1, 25).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))),
        1 -> Gen.const("")
      )).apply(Gen.Parameters.default, Seed(42L)).get.toVector
    val d = Files.createTempDirectory("qs-prop").toString
    val rows = texts.zipWithIndex.map { case (t, i) =>
      val url = f"p/$i%06d"
      Page(url, new java.sql.Timestamp(1609459200000L + i * 1000L),
        HtmlText.wrap(url, t), t, langs(i % langs.size))
    }
    import spark.implicits._
    IndexBuilder.build(spark, spark.createDataset(rows), d,
      BuildConfig(nPartitions = 4, nGroups = 2, nSlices = 4, blockSize = 16))
    val c = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val l = texts.indices.map(i => i.toLong -> langs(i % langs.size)).toMap
    (d, c, l)
  }

  // ---- independent scoring helpers (same formulas as NaiveBm25) ---------
  private lazy val analyzed: Vector[(Long, Int, Map[String, Int])] =
    corpus.map { case (id, t) => val (dl, tfs) = Analyzer.termFreqs(t); (id, dl, tfs.toMap) }
  private lazy val avgDl: Double = {
    val tot = analyzed.map(_._2.toLong).sum
    if (tot > 0) tot.toDouble / corpus.size else 1.0
  }
  private def idfOf(t: String): Double =
    NaiveBm25.idf(corpus.size.toLong, analyzed.count(_._3.contains(t)).toLong)
  private def termScore(id: Long, t: String): Double = {
    val (_, dl, tfs) = analyzed(id.toInt)
    tfs.get(t).map(tf => idfOf(t) * tf / (tf + K1 * (1 - B + B * dl / avgDl))).getOrElse(0.0)
  }
  private def phraseScore(id: Long, ts: Seq[String]): Option[Double] = {
    val toks = Analyzer.tokenize(corpus(id.toInt)._2)
    val freq = (0 to toks.length - ts.length)
      .count(i => ts.indices.forall(j => toks(i + j) == ts(j)))
    if (freq == 0) None
    else {
      val (_, dl, _) = analyzed(id.toInt)
      Some(ts.map(idfOf).sum * freq / (freq + K1 * (1 - B + B * dl / avgDl)))
    }
  }

  // ---- naive evaluator of the DOCUMENTED bool semantics ------------------
  private def matchesPred(p: AttrPred, id: Long): Boolean = p match {
    case AttrPred.KeyIn("lang", vs) => vs.contains(langOf(id))
    case AttrPred.NumRange("doc_len", lo, hi) =>
      val dl = analyzed(id.toInt)._2; dl >= lo && dl < hi
    case AttrPred.And(ps) => ps.forall(matchesPred(_, id))
    case AttrPred.Or(ps) => ps.exists(matchesPred(_, id))
    case AttrPred.Not(q) => !matchesPred(q, id)
    case other => fail(s"unexpected pred $other")
  }
  private def isPureFilter(n: Node): Boolean = n match {
    case FilterLeaf(_) => true
    case Bool(m, s, mn) => (m ++ s ++ mn).nonEmpty && (m ++ s ++ mn).forall(isPureFilter)
    case _ => false
  }
  private def predOf(n: Node): Long => Boolean = n match {
    case FilterLeaf(p) => matchesPred(p, _)
    case Bool(m, s, mn) => id =>
      m.forall(predOf(_)(id)) &&
        (s.isEmpty || s.exists(predOf(_)(id))) &&
        mn.forall(c => !predOf(c)(id))
    case other => fail(s"predOf on scoring node $other")
  }
  private val allIds: Vector[Long] = corpus.map(_._1)

  private def neval(n: Node): Map[Long, Double] = n match {
    case TermLeaf(t, b, 0, None) =>
      analyzed.collect { case (id, _, tfs) if tfs.contains(t) => id -> b * termScore(id, t) }.toMap
    case PhraseLeaf(ts, b) =>
      allIds.flatMap(id => phraseScore(id, ts).map(s => id -> b * s)).toMap
    case FilterLeaf(p) => allIds.filter(matchesPred(p, _)).map(_ -> 0.0).toMap
    case Bool(m, s, mn) =>
      val (fM, sM) = m.partition(isPureFilter)
      val (fN, sN) = mn.partition(isPureFilter)
      def filterOk(id: Long): Boolean =
        fM.forall(predOf(_)(id)) && fN.forall(c => !predOf(c)(id))
      val mustMaps = sM.map(neval)
      val shoulds = if (mustMaps.nonEmpty || fM.nonEmpty) s.filterNot(isPureFilter) else s
      val shouldMaps = shoulds.map(neval)
      val notIds = sN.map(neval).map(_.keySet).foldLeft(Set.empty[Long])(_ ++ _)
      val base: Map[Long, Double] =
        if (mustMaps.nonEmpty) {
          val ids = mustMaps.map(_.keySet).reduce(_ intersect _).filter(filterOk)
          ids.map(id => id -> mustMaps.map(_(id)).sum).toMap
        } else if (shouldMaps.nonEmpty) {
          val union = shouldMaps.flatMap(_.keySet).toSet.filter(filterOk)
          union.map(id => id -> shouldMaps.map(_.getOrElse(id, 0.0)).sum).toMap
        } else allIds.filter(filterOk).map(_ -> 0.0).toMap
      val boosted =
        if (mustMaps.nonEmpty && shouldMaps.nonEmpty)
          base.map { case (id, sc) => id -> (sc + shouldMaps.map(_.getOrElse(id, 0.0)).sum) }
        else base
      boosted -- notIds
    case other => fail(s"unexpected node $other")
  }

  // ---- random tree generator ----------------------------------------------
  private def leafGen: Gen[Node] = Gen.frequency(
    6 -> (for {
      t <- Gen.oneOf(vocab :+ "zz")
      b <- Gen.oneOf(1.0, 1.0, 2.0, 0.5)
    } yield TermLeaf(t, b)),
    2 -> (for {
      w1 <- Gen.oneOf(vocab); w2 <- Gen.oneOf(vocab)
    } yield PhraseLeaf(Seq(w1, w2))),
    1 -> Gen.oneOf(langs).map(l => FilterLeaf(AttrPred.KeyIn("lang", Set(l)))),
    1 -> (for {
      lo <- Gen.chooseNum(1, 12); w <- Gen.chooseNum(3, 15)
    } yield FilterLeaf(AttrPred.NumRange("doc_len", lo, lo + w)))
  )

  private def boolGen(depth: Int): Gen[Bool] =
    for {
      nm <- Gen.chooseNum(0, 2)
      ns <- Gen.chooseNum(if (nm == 0) 1 else 0, 2)
      nn <- Gen.chooseNum(0, 1)
      child = if (depth <= 0) leafGen else Gen.frequency(3 -> leafGen, 1 -> boolGen(depth - 1))
      m <- Gen.listOfN(nm, child)
      s <- Gen.listOfN(ns, child)
      // a generated Bool must itself satisfy the evaluator's positive-
      // clause rule everywhere; keep mustNots to leaves for simplicity
      n <- Gen.listOfN(nn, leafGen)
    } yield Bool(m, s, n)

  test("random trees: parse(print(t)) == t and engine ≡ naive evaluator") {
    val attrs = Map("lang" -> "kw", "warc_ts" -> "num", "doc_len" -> "num")
    var nonEmpty = 0
    (0 until 40).foreach { trial =>
      val tree = boolGen(2).apply(Gen.Parameters.default, Seed(9000L + trial)).get
      val q = QueryString.print(tree)
      val parsed = parse(q, attrs)
      assert(parsed == tree, s"trial $trial round trip: [$q]\nparsed $parsed\nwant   $tree")
      val exp = neval(tree).toSeq.sortBy { case (id, s) => (-s, id) }.take(15)
      val got = QueryString.topK(spark, dir, q, 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(_._1) == exp.map(_._1),
        s"trial $trial [$q] ids: got=${got.take(8)} want=${exp.take(8)}")
      got.zip(exp).foreach { case ((_, g), (_, e)) =>
        assert(math.abs(g - e) < 1e-9, s"trial $trial [$q] score $g vs $e")
      }
      if (exp.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 25, s"fixture too sparse: only $nonEmpty non-empty trees")
  }
}

package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Analyzer
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.query.{Search, Snippets}
import graft.sources.PagesGen

class SnippetsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("tokenizeWithOffsets ≡ tokenize, and offsets slice the source text") {
    val cases = Seq(
      "Hello, World! it's 3.14 and 1,000 things",
      "a_b c·d e:f 9.9.9 ...", "", "   ", "___", "ünïcödé tøkens détjà",
      "tab\tsep\nnewline  double  space", "trailing token",
      "doc://000000000042 path-like/values?q=1"
    ) ++ (0L until 50L).map(PagesGen.pageFor(_).text.take(200))
    cases.foreach { text =>
      val plain = Analyzer.tokenize(text)
      val (toks, starts, ends) = Analyzer.tokenizeWithOffsets(text)
      assert(toks.toSeq == plain.toSeq, s"token agreement on: $text")
      toks.indices.foreach { i =>
        assert(text.substring(starts(i), ends(i)).toLowerCase == toks(i),
          s"offset slice $i of: $text")
      }
    }
  }

  test("snippetOf picks the highest-idf window, leftmost on ties, wraps matches") {
    val w = Map("rare" -> 5.0, "common" -> 1.0)
    // rare term sits in the later half — window must move there
    val text = "common filler filler filler filler filler filler rare filler common"
    val s = Snippets.snippetOf(text, w, window = 3, pre = "<em>", post = "</em>")
    assert(s.contains("<em>rare</em>"), s)
    // one rare occurrence (5.0) outweighs two commons (2.0)
    assert(!s.contains("<em>common</em> filler filler filler"), s)
    // tie → leftmost: only equal-weight matches
    val t2 = "x a x x x a x"
    val s2 = Snippets.snippetOf(t2, Map("a" -> 1.0), 3, "[", "]")
    assert(s2 == "x [a] x", s2)
    // no match → leading window, unwrapped
    val s3 = Snippets.snippetOf("just some plain words here", Map("zz" -> 1.0), 3, "[", "]")
    assert(s3 == "just some plain", s3)
    // original casing/punctuation preserved inside the fragment
    val s4 = Snippets.snippetOf("Big, RARE news today", Map("rare" -> 2.0), 4, "[", "]")
    assert(s4 == "Big, [RARE] news today", s4)
  }

  test("phraseSnippetOf wraps the exact phrase as ONE unit; lone terms stay bare") {
    // golden: the phrase occurs once; 'spark' and 'merge' also occur alone
    val text = "merge alone here spark merge wins then spark alone ends"
    val s = Snippets.phraseSnippetOf(text, Seq("spark", "merge"), window = 6, "[", "]")
    assert(s.contains("[spark merge]"), s)
    assert(!s.contains("[spark]") && !s.contains("[merge]"), s"lone terms wrapped: $s")
    // window with MORE occurrences wins over an earlier sparse one
    val t2 = "a b filler filler filler filler filler filler a b x a b"
    val s2 = Snippets.phraseSnippetOf(t2, Seq("a", "b"), window = 5, "[", "]")
    assert(s2 == "[a b] x [a b]", s2)
    // original punctuation inside the occurrence is preserved in the unit
    val t3 = "noise Spark, Merge! noise noise"
    val s3 = Snippets.phraseSnippetOf(t3, Seq("spark", "merge"), window = 4, "[", "]")
    assert(s3.contains("[Spark, Merge]"), s3)
    // no occurrence → plain leading window, nothing wrapped
    val s4 = Snippets.phraseSnippetOf("just plain words here", Seq("no", "match"), 3, "[", "]")
    assert(s4 == "just plain words", s4)
    // greedy non-overlap: 'a a a' with phrase 'a a' wraps the first pair
    val s5 = Snippets.phraseSnippetOf("a a a", Seq("a", "a"), 3, "[", "]")
    assert(s5 == "[a a] a", s5)
  }

  test("highlightPhrase: phrase hits gain one-unit fragments end to end") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-snip-phrase").toString
    val texts = Seq(
      "alpha beta gamma spark merge delta",
      "spark alone and merge alone never together",
      "x spark merge y spark merge z")
    val pages = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
      val url = f"p/$i%06d"
      Page(url, new java.sql.Timestamp(1609459200000L + i), graft.sources.HtmlText.wrap(url, t), t, "en")
    })(org.apache.spark.sql.Encoders.product[Page])
    IndexBuilder.build(spark, pages, dir,
      BuildConfig(nPartitions = 2, nGroups = 1, nSlices = 2, blockSize = 8))
    val hits = Search.phraseTopK(spark, dir, Seq("spark", "merge"), 5)
    val out = Snippets.highlightPhrase(spark, dir, hits, Seq("spark", "merge"), window = 6)
      .select(col("doc_id"), col("snippet"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 2, s"phrase hits: $out") // doc 1 has no phrase
    out.values.foreach { s =>
      assert(s.contains("<em>spark merge</em>"), s)
      assert(!s.contains("<em>spark</em>"), s)
    }
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("highlight: top-k hits gain fragments quoting the stored text") {
    val dir = Files.createTempDirectory("graft-snip")
    try {
      val pages = PagesGen.pages(spark, 400L, 4)
      IndexBuilder.build(spark, pages, dir.toString,
        BuildConfig(nPartitions = 4, nGroups = 1, nSlices = 2, blockSize = 64))
      val hits = Search.topK(spark, dir.toString, Seq("w1", "w2"), "or", 5)
      val out = Snippets.highlight(spark, dir.toString, hits, Seq("w1", "w2"), window = 8)
        .collect()
      assert(out.length == 5)
      out.foreach { r =>
        val snip = r.getString(r.fieldIndex("snippet"))
        assert(snip.contains("<em>w1</em>") || snip.contains("<em>w2</em>"),
          s"fragment must mark a query term: $snip")
        // fragment quotes the stored text verbatim (modulo the markers)
        val raw = snip.replace("<em>", "").replace("</em>", "")
        val docId = r.getLong(r.fieldIndex("doc_id"))
        val text = Search.hydrate(spark, dir.toString,
          hits.where(org.apache.spark.sql.functions.col("doc_id") === docId),
          withText = true).collect().head.getAs[String]("text")
        assert(text.contains(raw), "fragment is a substring of the stored text")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }
}

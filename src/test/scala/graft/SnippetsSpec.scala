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

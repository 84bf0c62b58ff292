package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.Analyzer
import graft.sources.{HtmlText, PagesGen}

class AnalyzerHtmlSpec extends AnyFunSuite with GenCheck {

  test("tokenizer golden cases (ES standard analyzer semantics)") {
    assert(Analyzer.tokenize("Hello, World!").toSeq == Seq("hello", "world"))
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize("   \t  ").isEmpty)
    assert(Analyzer.tokenize("a-b c_d").toSeq == Seq("a", "b", "c_d"))
    assert(Analyzer.tokenize("2021 год, Привет МИР").toSeq ==
      Seq("2021", "год", "привет", "мир"))
    assert(Analyzer.tokenize("x" * 300).toSeq == Seq("x" * 300)) // max-length token
    assert(Analyzer.tokenize("one  two\nthree.four").toSeq ==
      Seq("one", "two", "three.four") ||
      Analyzer.tokenize("one  two\nthree.four").toSeq ==
      Seq("one", "two", "three", "four"))
  }

  test("termFreqs counts correctly") {
    val (dl, tfs) = Analyzer.termFreqs("a b a c a b")
    assert(dl == 6)
    assert(tfs.toMap == Map("a" -> 3, "b" -> 2, "c" -> 1))
  }

  test("tokenCount == tokenize().length (allocation-free doc_len path)") {
    val goldens = Seq(
      "", "   \t  ", "Hello, World!", "a-b c_d", "2021 год, Привет МИР",
      "three.four 3.14 o'neil 1,024", "___", "a.", ".a", "a.b.c", "1.2.3",
      "x" * 300, "a·b c:d 1;2", "😀 emoji ok", "а-б’в"
    )
    goldens.foreach { s =>
      assert(Analyzer.tokenCount(s) == Analyzer.tokenize(s).length, s"golden: '$s'")
    }
    forAllSeeded(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf(".", ",", "'", "’", ":", "·", ";", "_", "-", " ", "\n", "і", "3.14", "а б")
    ))) { parts =>
      val s = parts.mkString
      Analyzer.tokenCount(s) == Analyzer.tokenize(s).length
    }
    (0L until 500L).foreach { i =>
      val t = PagesGen.pageFor(i).text
      assert(Analyzer.tokenCount(t) == Analyzer.tokenize(t).length, s"doc $i")
    }
  }

  test("scanTokens ≡ tokenizeWithOffsets (streaming span scan, r6 fused-combine path)") {
    def viaScan(s: String): (Seq[String], Seq[Int], Seq[Int], Int) = {
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
      val n = Analyzer.scanTokens(s, new Analyzer.TokenSink {
        def token(text: String, start: Int, end: Int, index: Int, ascii: Boolean, hash: Int): Unit = {
          assert(index == toks.length, s"index stream broken at '$s'")
          val lowered = text.substring(start, end).toLowerCase(java.util.Locale.ROOT)
          // the ascii flag is a license for the trivial lowercase map —
          // when set, every span char must really be < 0x80 and the
          // passed hash must equal the lowercased span's String.hashCode
          if (ascii) {
            (start until end).foreach(i => assert(text.charAt(i) < 0x80, s"'$s'"))
            assert(hash == lowered.hashCode, s"hash mismatch for '$lowered' in '$s'")
          }
          toks += lowered
          starts += start
          ends += end
        }
      })
      (toks.toSeq, starts.toSeq, ends.toSeq, n)
    }
    val goldens = Seq(
      "", "   \t  ", "Hello, World!", "a-b c_d", "2021 год, Привет МИР",
      "three.four 3.14 o'neil 1,024", "___", "a.", ".a", "a.b.c", "1.2.3",
      "x" * 300, "a·b c:d 1;2", "😀 emoji ok", "а-б’в", "MiXeD CaSe AbC"
    )
    goldens.foreach { s =>
      val (toks, starts, ends, n) = viaScan(s)
      val (wToks, wStarts, wEnds) = Analyzer.tokenizeWithOffsets(s)
      assert(toks == wToks.toSeq, s"golden: '$s'")
      assert(starts == wStarts.toSeq && ends == wEnds.toSeq, s"golden offsets: '$s'")
      assert(n == wToks.length, s"golden count: '$s'")
    }
    forAllSeeded(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf(".", ",", "'", "’", ":", "·", ";", "_", "-", " ", "\n", "і", "3.14", "а б", "ABC")
    ))) { parts =>
      val s = parts.mkString
      val (toks, _, _, n) = viaScan(s)
      toks == Analyzer.tokenize(s).toSeq && n == toks.length
    }
  }

  test("html wrap/extract is byte-identical on generator corpus (per-row invariant)") {
    (0L until 500L).foreach { i =>
      val p = PagesGen.pageFor(i)
      assert(HtmlText.extract(p.html) == p.text, s"doc $i")
    }
  }

  test("html wrap/extract round-trips arbitrary text incl. markup chars") {
    forAllSeeded(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("<p>", "&amp;", "а б", "\n", "<", ">", "&")))) { parts =>
      val text = parts.mkString(" ")
      assert(HtmlText.extract(HtmlText.wrap("http://u", text)) == text)
    }
  }

  test("generator determinism: same index → same page") {
    val a = PagesGen.pageFor(12345L)
    val b = PagesGen.pageFor(12345L)
    assert(a.url == b.url && a.text == b.text && a.warc_ts == b.warc_ts)
    assert(a.html.toSeq == b.html.toSeq)
  }

  test("generator has hot-term skew and edge docs") {
    val texts = (0L until 2000L).map(PagesGen.textFor)
    assert(texts.exists(_.isEmpty))
    assert(texts.exists(t => t.nonEmpty && t.trim.isEmpty))
    assert(texts.exists(_.contains("привет")))
    val tokens = texts.flatMap(Analyzer.tokenize)
    val byFreq = tokens.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
    // Zipf head: most frequent term should dominate the median term
    assert(byFreq.head._2 > 50 * byFreq(byFreq.size / 2)._2)
  }
}

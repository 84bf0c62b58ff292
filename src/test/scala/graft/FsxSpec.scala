package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Fsx

/** Control-plane filesystem shim: atomic replace (ADVICE r4: readers must
  * never observe a missing manifest on local FS), journal append (O(line)
  * per commit where the store supports append; history never lost), and
  * the listing/delete helpers the engine leans on.
  */
class FsxSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft-fsx").toString

  test("writeUtf8Atomic: create, replace, content always whole") {
    val d = tmp()
    val f = s"$d/segments.json"
    Fsx.writeUtf8Atomic(f, "v1")
    assert(Fsx.readUtf8(f) == "v1")
    Fsx.writeUtf8Atomic(f, "v2-longer-content")
    assert(Fsx.readUtf8(f) == "v2-longer-content")
    // the FileContext(OVERWRITE) path must not leave the tmp file behind
    assert(!Fsx.listNames(d).exists(_.contains(".tmp")), Fsx.listNames(d).toString)
    // shrinking replace: no tail of the old content may survive
    Fsx.writeUtf8Atomic(f, "v3")
    assert(Fsx.readUtf8(f) == "v3")
  }

  test("appendLine: builds a journal line by line; first write creates the file") {
    val d = tmp()
    val f = s"$d/checkpoint.jsonl"
    (1 to 50).foreach(i => Fsx.appendLine(f, s"""{"unit":$i}"""))
    val lines = Fsx.readUtf8(f).split("\n").toSeq
    assert(lines.size == 50)
    assert(lines.head == """{"unit":1}""" && lines.last == """{"unit":50}""")
    // interleaves with atomic rewrites of OTHER files in the same dir
    Fsx.writeUtf8Atomic(s"$d/manifest.json", "m")
    Fsx.appendLine(f, "tail")
    assert(Fsx.readUtf8(f).split("\n").last == "tail")
  }

  test("delete / exists / listDirNames round trip") {
    val d = tmp()
    Fsx.mkdirs(s"$d/a/b")
    Fsx.writeUtf8(s"$d/a/x.txt", "x")
    assert(Fsx.exists(s"$d/a/b") && Fsx.exists(s"$d/a/x.txt"))
    assert(Fsx.listDirNames(s"$d/a") == Seq("b"))
    assert(Fsx.delete(s"$d/a"))
    assert(!Fsx.exists(s"$d/a"))
    assert(Fsx.delete(s"$d/a"), "deleting a missing path reports gone")
    assert(Fsx.listNames(s"$d/a").isEmpty)
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TokenizerCache

/** Train-if-missing tokenizer artifacts (pipeline/TokenizerCache): the
  * fit runs once per state, hydrates thereafter, and every stale shape —
  * changed corpus walk, changed rounds/family/split, corrupt manifest —
  * retrains instead of hydrating or throwing.
  */
class TokenizerCacheSpec extends AnyFunSuite {

  private def tmpRoot() =
    Files.createTempDirectory("graft_tokcache").toString

  test("second ensure with the same state hydrates without retraining") {
    val root = tmpRoot()
    var trains = 0
    def once() = TokenizerCache.ensure(root, "state-A") { p =>
      trains += 1; Files.writeString(p, """{"k":1}""")
    }
    val p1 = once()
    val p2 = once()
    assert(p1 == p2 && trains == 1)
    assert(Files.readString(p1) == """{"k":1}""")
  }

  test("a different state trains its own artifact") {
    val root = tmpRoot()
    var trains = 0
    TokenizerCache.ensure(root, "state-A") { p =>
      trains += 1; Files.writeString(p, "a") }
    TokenizerCache.ensure(root, "state-B") { p =>
      trains += 1; Files.writeString(p, "b") }
    assert(trains == 2)
  }

  test("a corrupt manifest counts as stale and refits") {
    val root = tmpRoot()
    var trains = 0
    val p = TokenizerCache.ensure(root, "state-A") { q =>
      trains += 1; Files.writeString(q, "a") }
    Files.writeString(p.getParent.resolve("manifest.json"), "{ truncated")
    TokenizerCache.ensure(root, "state-A") { q =>
      trains += 1; Files.writeString(q, "a2") }
    assert(trains == 2 && Files.readString(p) == "a2")
  }

  test("a missing tokenizer file refits even with a valid manifest") {
    val root = tmpRoot()
    var trains = 0
    val p = TokenizerCache.ensure(root, "state-A") { q =>
      trains += 1; Files.writeString(q, "a") }
    Files.delete(p)
    TokenizerCache.ensure(root, "state-A") { q =>
      trains += 1; Files.writeString(q, "a3") }
    assert(trains == 2)
  }

  test("state embeds family, rounds, split tag, and the corpus walk") {
    val corpus = Files.createTempDirectory("graft_tokcorpus")
    Files.writeString(corpus.resolve("part-0.parquet"), "x")
    val s1 = TokenizerCache.state("bpe", 8, "full", corpus.toString)
    assert(s1.contains("bpe") && s1.contains("rounds=8") &&
      s1.contains("train=full") && s1.contains("part-0.parquet"))
    assert(TokenizerCache.state("wordpiece", 8, "full", corpus.toString) != s1)
    assert(TokenizerCache.state("bpe", 9, "full", corpus.toString) != s1)
    assert(TokenizerCache.state("bpe", 8, "mod5", corpus.toString) != s1)
    // touching the corpus changes the walk (size change is always seen;
    // mtime_ns rides along for same-size rewrites)
    Files.writeString(corpus.resolve("part-0.parquet"), "xy")
    assert(TokenizerCache.state("bpe", 8, "full", corpus.toString) != s1)
  }
}

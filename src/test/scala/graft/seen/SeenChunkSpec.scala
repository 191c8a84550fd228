package graft.seen

import org.scalatest.funsuite.AnyFunSuite

class SeenChunkSpec extends AnyFunSuite {

  test("pack/canonical round-trips ASCII, Japanese, and empty strings") {
    val canons = Array(
      "https://www.shugiin.go.jp/kaiji204.htm",
      "https://kokkai.ndl.go.jp/api/meeting?議案=犬法案&p=1",
      "",
      "https://h0.example.jp/p0")
    val hashes = canons.map(_.hashCode.toLong)
    val ch = SeenChunk.pack(7, hashes, canons)
    assert(ch.wave == 7)
    assert(ch.size == 4)
    assert((0 until 4).map(ch.canonical) == canons.toSeq)
    assert((0 until 4).map(ch.hashes(_)) == hashes.toSeq)
  }

  test("empty chunk") {
    val ch = SeenChunk.pack(0, Array.emptyLongArray, Array.empty[String])
    assert(ch.size == 0)
    assert(ch.utf8.isEmpty && ch.offsets.toSeq == Seq(0))
  }
}

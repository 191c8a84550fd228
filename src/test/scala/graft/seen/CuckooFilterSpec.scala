package graft.seen

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class CuckooFilterSpec extends AnyFunSuite {

  test("no false negatives at high load") {
    val f = new CuckooFilter(10000)
    val rnd = new Random(42)
    val keys = Seq.fill(9500)(rnd.nextLong())
    keys.foreach(f.insert)
    assert(keys.forall(f.contains))
  }

  test("false positive rate is small") {
    val f = new CuckooFilter(10000)
    val rnd = new Random(7)
    val keys = Set.fill(9000)(rnd.nextLong())
    keys.foreach(f.insert)
    val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(keys)
    val fp = probes.count(f.contains)
    assert(fp.toDouble / probes.size < 0.01, s"fp rate ${fp.toDouble / probes.size}")
  }

  test("insert is idempotent (re-inserts do not fill the table)") {
    val f = new CuckooFilter(100)
    (1 to 10000).foreach(_ => f.insert(123456789L))
    assert(f.size == 1)
    assert(f.contains(123456789L))
  }

  test("deterministic bytes for sorted insert order") {
    def build(): Array[Byte] = {
      val f = new CuckooFilter(5000)
      (1L to 4000L).map(i => i * 0x9E3779B97F4A7C15L).sorted.foreach(f.insert)
      f.serialized
    }
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("serialization round-trip preserves membership") {
    val f = new CuckooFilter(1000)
    val keys = (1L to 900L).map(_ * 31L)
    keys.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialized)
    assert(keys.forall(g.contains))
    assert(g.size == f.size)
  }

  test("overflow beyond capacity still has no false negatives") {
    val f = new CuckooFilter(64)
    val rnd = new Random(3)
    val keys = Seq.fill(500)(rnd.nextLong())
    keys.foreach(f.insert)
    assert(keys.forall(f.contains))
  }
}

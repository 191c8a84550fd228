package graft.seen

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SeenSet128Spec extends AnyFunSuite {

  test("add/contains across growth; no false positives or negatives") {
    val rnd = new Random(42)
    val keys = Array.fill(50000)((rnd.nextLong(), rnd.nextLong()))
    val s = new SeenSet128(4) // force many growth cycles
    keys.foreach { case (a, b) => assert(s.add(a, b)) }
    assert(s.size == keys.length)
    keys.foreach { case (a, b) =>
      assert(s.contains(a, b))
      assert(!s.add(a, b)) // re-add reports present
    }
    val absent = Array.fill(50000)((rnd.nextLong(), rnd.nextLong())).toSet -- keys.toSet
    absent.foreach { case (a, b) => assert(!s.contains(a, b)) }
  }

  test("same h1, different h2 are distinct keys (the 128-bit point)") {
    val s = new SeenSet128(8)
    assert(s.add(7L, 1L))
    assert(s.add(7L, 2L)) // a 64-bit set would drop this one
    assert(s.contains(7L, 1L) && s.contains(7L, 2L) && !s.contains(7L, 3L))
    assert(s.size == 2)
  }

  test("copy is independent (copy-on-write contract)") {
    val s = new SeenSet128(8)
    s.add(1L, 1L)
    val c = s.copy()
    c.add(2L, 2L)
    assert(!s.contains(2L, 2L) && c.contains(2L, 2L))
    assert(s.size == 1 && c.size == 2)
    // growth in the copy never touches the original
    (0 until 1000).foreach(i => c.add(i.toLong + 10, i.toLong))
    assert(s.size == 1 && s.contains(1L, 1L))
  }

  test("java-serializable (checkpoint/shuffle round trip)") {
    val s = new SeenSet128(8)
    (0 until 100).foreach(i => s.add(i.toLong, -i.toLong))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(s)
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val t = in.readObject().asInstanceOf[SeenSet128]
    assert(t.size == 100)
    (0 until 100).foreach(i => assert(t.contains(i.toLong, -i.toLong)))
  }
}

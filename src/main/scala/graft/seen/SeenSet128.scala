package graft.seen

/**
 * Open-addressing hash set of 128-bit keys in primitive arrays — the
 * exact-membership half of the per-bucket URL-seen state.
 *
 * Why this exists (vs the round-1 `Map[Long, List[String]]`):
 *  - collision safety: the dedup key is the 128-bit (xxhash64 seed 42,
 *    xxhash64 seed 7919) pair of the canonical URL. At the 10^10-URL
 *    design scale the birthday bound gives ~3 expected collisions for a
 *    64-bit key but ~10^-19 for 128 bits (Scrapy's SHA1 fingerprint is
 *    the same idea at 160 bits).
 *  - GC/scan cost: the set is two primitive arrays — no per-entry nodes,
 *    no boxing, nothing for the garbage collector (or Spark's
 *    SizeEstimator, which walks cached object graphs) to traverse. The
 *    round-1 persistent map put millions of HAMT nodes + cons cells in
 *    the old generation and dominated young-GC copy time.
 *
 * Mutable by design; wave-purity is the caller's job ([[copy]] before
 * mutating a prior wave's state — an `Arrays.copyOf` of flat arrays,
 * cheap at any size that fits an executor).
 */
final class SeenSet128(expected: Int) extends Serializable {

  // 2^29 slots is the growth ceiling: the keys array is cap*2 longs, and
  // 2^30 slots would need a 2^31-element array (> Int.MaxValue)
  private val MaxCap = 1 << 29

  private var cap: Int = {
    var c = 16
    while (c < MaxCap && c.toLong < expected.toLong * 2) c <<= 1
    c
  }
  private var mask: Int = cap - 1
  private var keys: Array[Long] = new Array[Long](cap * 2)
  private var bits: Array[Long] = new Array[Long](math.max(1, cap >> 6))
  private var used: Int = 0

  def size: Int = used

  @inline private def occupied(i: Int): Boolean =
    ((bits(i >>> 6) >>> (i & 63)) & 1L) != 0L
  @inline private def setOccupied(i: Int): Unit =
    bits(i >>> 6) |= 1L << (i & 63)
  @inline private def slot(h1: Long): Int =
    ((h1 ^ (h1 >>> 33)) & mask).toInt

  def contains(h1: Long, h2: Long): Boolean = {
    var i = slot(h1)
    while (occupied(i)) {
      if (keys(2 * i) == h1 && keys(2 * i + 1) == h2) return true
      i = (i + 1) & mask
    }
    false
  }

  /** Insert; false if the key was already present. */
  def add(h1: Long, h2: Long): Boolean = {
    if ((used + 1) * 2 > cap) grow()
    // probe BEFORE the full-set check: a duplicate add of a present key is
    // always `false`, even at the growth ceiling (used < cap guarantees at
    // least one empty slot, so the probe terminates)
    var i = slot(h1)
    while (occupied(i)) {
      if (keys(2 * i) == h1 && keys(2 * i + 1) == h2) return false
      i = (i + 1) & mask
    }
    if (used + 1 >= cap) // genuinely new key at the growth ceiling
      throw new IllegalStateException("SeenSet128 full: repartition into more host buckets")
    keys(2 * i) = h1
    keys(2 * i + 1) = h2
    setOccupied(i)
    used += 1
    true
  }

  private def grow(): Unit = {
    if (cap >= MaxCap) return // beyond any per-bucket share; load factor rises instead
    val oldKeys = keys
    val oldBits = bits
    val oldCap = cap
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap * 2)
    bits = new Array[Long](math.max(1, cap >> 6))
    var i = 0
    while (i < oldCap) {
      if (((oldBits(i >>> 6) >>> (i & 63)) & 1L) != 0L) {
        val h1 = oldKeys(2 * i)
        val h2 = oldKeys(2 * i + 1)
        var j = slot(h1)
        while (occupied(j)) j = (j + 1) & mask
        keys(2 * j) = h1
        keys(2 * j + 1) = h2
        setOccupied(j)
      }
      i += 1
    }
  }

  /** Independent copy (copy-on-write for wave recompute purity). */
  def copy(): SeenSet128 = {
    val s = new SeenSet128(1)
    s.cap = cap
    s.mask = mask
    s.keys = keys.clone()
    s.bits = bits.clone()
    s.used = used
    s
  }
}

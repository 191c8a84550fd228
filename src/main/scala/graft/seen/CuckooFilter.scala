package graft.seen

/**
 * A from-scratch cuckoo filter (Fan et al., "Cuckoo Filter: Practically
 * Better Than Bloom", CoNEXT 2014 — public paper) used as the URL-seen
 * pre-filter. One filter per host bucket; keys are xxhash64 values of
 * canonical URLs (the same hash the DataFrame plane computes with
 * Spark's `xxhash64`).
 *
 * Semantics in the engine (SURVEY.md §4 "Request dedup"):
 *  - `contains == false` → URL is DEFINITELY new (no false negatives),
 *    skips the exact anti-join entirely — the common case for novel URLs.
 *  - `contains == true` → maybe seen; verified against the exact seen
 *    table. So the oracle-visible dedup is exact; the filter only prunes.
 *
 * Deterministic: kick eviction uses an LCG seeded from the key, no
 * global randomness — same inserts in the same order produce identical
 * filter bytes (needed for byte-equal checkpoint/resume tests).
 *
 * 4-way buckets, 16-bit fingerprints → ~2.1 bytes/key at 95% load,
 * <0.001 false-positive rate. At 10^10 URLs sharded over 2^14 host
 * buckets this is ~1.3 MB per bucket shard — each shard collocated with
 * its host-bucket partition, never a single giant structure.
 */
final class CuckooFilter(requestedCapacity: Int) extends Serializable {
  import CuckooFilter._

  private val numBuckets: Int = {
    val needed = math.max(1, (requestedCapacity / (BucketSize * 0.95)).toInt)
    Integer.highestOneBit(math.max(1, needed - 1)) * 2 // next power of two
  }
  private val indexMask: Int = numBuckets - 1
  private val table: Array[Short] = new Array[Short](numBuckets * BucketSize)
  private var count: Long = 0L
  /** Homeless fingerprints after an exhausted kick chain, encoded as
    * (index << 16 | fp). Bounded and tiny below ~95% load; its growth
    * signals the shard needs resizing. */
  private var stash: scala.collection.mutable.HashSet[Long] = null

  private def stashKey(i: Int, fp: Short): Long = (i.toLong << 16) | (fp & 0xFFFFL)

  def size: Long = count

  private def fingerprint(key: Long): Short = {
    val fp = ((key >>> 48) ^ (key >>> 32)).toInt & 0xFFFF
    (if (fp == 0) 1 else fp).toShort
  }
  private def index1(key: Long): Int = (key & 0xFFFFFFFFL).toInt & indexMask
  private def altIndex(i: Int, fp: Short): Int =
    (i ^ (((fp & 0xFFFF) * 0x5bd1e995) & indexMask)) & indexMask

  private def bucketHas(i: Int, fp: Short): Boolean = {
    val base = i * BucketSize
    var j = 0
    while (j < BucketSize) {
      if (table(base + j) == fp) return true
      j += 1
    }
    false
  }

  private def bucketInsert(i: Int, fp: Short): Boolean = {
    val base = i * BucketSize
    var j = 0
    while (j < BucketSize) {
      if (table(base + j) == 0) { table(base + j) = fp; return true }
      j += 1
    }
    false
  }

  def contains(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = index1(key)
    val i2 = altIndex(i1, fp)
    if (bucketHas(i1, fp) || bucketHas(i2, fp)) return true
    stash != null && (stash.contains(stashKey(i1, fp)) || stash.contains(stashKey(i2, fp)))
  }

  /** Insert; idempotent for keys already present (checked first, so a
    * re-inserted key never double-occupies slots). */
  def insert(key: Long): Unit = {
    if (contains(key)) return
    val fp = fingerprint(key)
    val i1 = index1(key)
    val i2 = altIndex(i1, fp)
    if (bucketInsert(i1, fp) || bucketInsert(i2, fp)) { count += 1; return }
    // cuckoo kick loop — deterministic slot choice via LCG on the key.
    // Each step evicts a victim, places the current fp, and re-homes the
    // victim at its alternate bucket (altIndex is an involution, so the
    // victim's alternate is always a valid home).
    var curFp = fp
    var curIdx = if ((key & 1L) == 0L) i1 else i2
    var rnd = key * 6364136223846793005L + 1442695040888963407L
    var kicks = 0
    while (kicks < MaxKicks) {
      val slot = ((rnd >>> 33) % BucketSize).toInt
      rnd = rnd * 6364136223846793005L + 1442695040888963407L
      val base = curIdx * BucketSize
      val evicted = table(base + slot)
      table(base + slot) = curFp
      curFp = evicted
      curIdx = altIndex(curIdx, curFp)
      if (bucketInsert(curIdx, curFp)) { count += 1; return }
      kicks += 1
    }
    // Kick chain exhausted: the last victim is homeless — stash it at its
    // current valid index so no false negative is possible.
    if (stash == null) stash = scala.collection.mutable.HashSet[Long]()
    stash.add(stashKey(curIdx, curFp))
    count += 1
  }

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(this)
    out.close()
    bos.toByteArray
  }
}

object CuckooFilter {
  val BucketSize = 4
  val MaxKicks = 500

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    in.readObject().asInstanceOf[CuckooFilter]
  }
}

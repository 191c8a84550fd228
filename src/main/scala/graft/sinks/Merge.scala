package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Sink semantics of the reference (SURVEY.md §2.2), re-expressed over
 * snapshot-versioned, BUCKET-PARTITIONED parquet tables:
 *
 *  - K1 `merge`: upsert by id with partial-field semantics — an update row
 *    only overwrites the fields it carries non-null (the reference MERGEs
 *    partial entities, e.g. a Bill with only id+reason:
 *    /root/reference/crawler/spiders/shugiin_spider.py:87-90). Duplicate
 *    update rows for one id are applied deterministically: per field,
 *    the last non-null value in `seqCol` order wins (the reference applies
 *    them in arrival order); without a seqCol the tiebreak is the total
 *    order on row content — deterministic either way.
 *  - K2 `mergeEdges`: distinct (from_id, to_id) accumulation
 *    (gql_client.link/bulk_link, crawler/spiders/__init__.py:34-108).
 *  - K3 `deleteThenInsert`: delete all rows matching a predicate, then
 *    insert replacements (delete_old_urls, crawler/spiders/__init__.py:110-115).
 *  - K4 `gateByExistence`: keep update rows only when a parent id exists
 *    (shugiin_minutes_spider.py:67-72 — never create Minutes from
 *    unofficial sources).
 *  - K6 `validateOrQuarantine`: required-fields check; failures go to a
 *    quarantine table instead of the sink (crawler/utils/validate.py).
 *
 * Iceberg's runtime jar is not present in this sandbox, so the table is an
 * Iceberg-like manifest tree: rows live in `data/v<N>/_bucket=<b>/` files,
 * keyed by `pmod(xxhash64(bucketCol), nBuckets)`, and each version's
 * manifest maps bucket → the list of data versions holding its current
 * rows. A MERGE rewrites ONLY the buckets its update ids touch (untouched
 * buckets keep pointing at older data files — at the 10^8-entity design
 * point a single-entity commit rewrites |table|/nBuckets rows, not the
 * table); `append` is a fast-append (new files only, no rewrite). Time
 * travel = reading an older manifest. A later swap to Iceberg `MERGE INTO`
 * is mechanical (documented deviation, SURVEY.md §4).
 */
class SnapshotTable(spark: SparkSession, root: String, nBuckets: Int = 16) {

  private final case class Manifest(
      nBuckets: Int,
      bucketCol: String,
      buckets: Map[Int, Seq[Int]]) // bucket -> data versions (read in order)

  private def currentPath = Paths.get(s"$root/CURRENT")

  def currentVersion: Int =
    if (Files.exists(currentPath)) Files.readString(currentPath).trim.toInt else 0

  def exists: Boolean = currentVersion > 0

  private def writeManifest(v: Int, m: Manifest): Unit = {
    val bs = m.buckets.toSeq.sortBy(_._1)
      .map { case (b, vs) => s""""$b":[${vs.mkString(",")}]""" }
      .mkString(",")
    Files.writeString(Paths.get(s"$root/manifest_v$v.json"),
      s"""{"n_buckets":${m.nBuckets},"bucket_col":"${m.bucketCol}","buckets":{$bs}}""")
  }

  private def readManifest(v: Int): Manifest = {
    val s = Files.readString(Paths.get(s"$root/manifest_v$v.json"))
    val nb = """"n_buckets":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val bc = """"bucket_col":"([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
    val buckets = """"(\d+)":\[([\d,]*)\]""".r.findAllMatchIn(s).map { m =>
      m.group(1).toInt ->
        m.group(2).split(",").filter(_.nonEmpty).map(_.toInt).toSeq
    }.toMap
    Manifest(nb, bc, buckets)
  }

  private def bucketOf(c: Column, n: Int): Column = pmod(xxhash64(c), lit(n))

  private def bucketPaths(m: Manifest, bs: Iterable[Int]): Seq[String] =
    (for (b <- bs.toSeq.sorted; v <- m.buckets.getOrElse(b, Nil))
      yield s"$root/data/v$v/_bucket=$b")

  private def readPaths(paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  def read(): DataFrame = readVersion(currentVersion)

  /** The rows of only those buckets any of `keys`' values hash into — the
    * membership-probe read (O(batch's buckets), never O(table)): an
    * incremental-dedup batch probes the index without scanning it. */
  def readForKeys(keys: DataFrame, keyCol: String): DataFrame = {
    require(exists, s"no snapshot under $root")
    val m = readManifest(currentVersion)
    require(m.bucketCol == keyCol,
      s"table $root is bucketed by '${m.bucketCol}', not '$keyCol'")
    val touched = keys
      .select(bucketOf(col(keyCol), m.nBuckets).as("b")).distinct()
      .collect().map(_.getLong(0).toInt)
    val paths = bucketPaths(m, touched)
    // empty probe result must still carry the TABLE's schema (payload
    // columns included) — a key-only empty frame breaks consumers that
    // aggregate payload columns of the join result
    if (paths.isEmpty) read().limit(0) else readPaths(paths)
  }

  /** Time travel: the table as of manifest version `v`. */
  def readVersion(v: Int): DataFrame = {
    require(v > 0, s"no snapshot v$v under $root")
    val m = readManifest(v)
    readPaths(bucketPaths(m, m.buckets.keys))
  }

  /** Write `df` into `data/v<next>` partitioned by bucket; returns the new
    * version and the set of buckets written. `update` folds them into the
    * previous manifest. Rows that lack the table's bucket column (legal
    * for append/deleteThenInsert payloads) hash a null key — they all
    * land in one well-defined bucket instead of failing analysis. */
  private def commit(df: DataFrame, bucketCol: String,
      update: (Map[Int, Seq[Int]], Set[Int], Int) => Map[Int, Seq[Int]],
      noopIfEmpty: Boolean = false): Int = {
    val v = currentVersion + 1
    val prev = if (exists) readManifest(currentVersion)
      else Manifest(nBuckets, bucketCol, Map.empty)
    require(prev.bucketCol == bucketCol,
      s"table $root is bucketed by '${prev.bucketCol}', not '$bucketCol'")
    val key = if (df.columns.contains(bucketCol)) col(bucketCol)
      else lit(null).cast("string")
    // cluster rows by bucket before the write: without this, every input
    // partition fans out into every touched bucket dir (tasks × buckets
    // tiny files per commit — a small-files explosion that taxes every
    // later read's footer pass and, at 10^10-row scale, the filesystem
    // itself). One extra hash shuffle of just this commit's rows buys one
    // file per touched bucket.
    df.withColumn("_bucket", bucketOf(key, prev.nBuckets))
      .repartition(prev.nBuckets, col("_bucket"))
      .write.partitionBy("_bucket").mode(SaveMode.Overwrite)
      .parquet(s"$root/data/v$v")
    val written = Option(new java.io.File(s"$root/data/v$v").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      .map(_.getName.stripPrefix("_bucket=").toInt).toSet
    // append-shaped callers (insertIfAbsent/mergeEdges) learn batch
    // emptiness from the write itself instead of paying a separate
    // isEmpty action (plus the lineage pin it needed): an empty write
    // leaves no bucket dirs, so drop the empty v-dir and keep CURRENT.
    if (noopIfEmpty && written.isEmpty) {
      deleteRecursively(new java.io.File(s"$root/data/v$v"))
      return currentVersion
    }
    writeManifest(v, prev.copy(buckets = update(prev.buckets, written, v)))
    Files.createDirectories(Paths.get(root))
    Files.writeString(currentPath, v.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    v
  }

  /** Touched buckets point only at the new version; untouched buckets keep
    * their old data files (the K1 partial-rewrite path). */
  private def replaceTouched(prev: Map[Int, Seq[Int]], written: Set[Int], v: Int) =
    prev ++ written.map(_ -> Seq(v))

  /** The new version is the whole table (full-rewrite ops). */
  private def replaceAll(prev: Map[Int, Seq[Int]], written: Set[Int], v: Int) =
    written.map(_ -> Seq(v)).toMap

  /** Fast-append: written buckets gain one more data version. */
  private def appendTouched(prev: Map[Int, Seq[Int]], written: Set[Int], v: Int) =
    prev ++ written.map(b => b -> (prev.getOrElse(b, Nil) :+ v))

  /** Deterministic collapse of duplicate update rows for one id: per
    * field, the value of the last row (in `ord` order) that carries the
    * field non-null — so two partial updates for one id MERGE their
    * fields, in arrival order when `seqCol` is given (reference
    * semantics), by row-content order otherwise. */
  private def collapse(updates: DataFrame, idCol: String, seqCol: Option[String]): DataFrame = {
    val dataCols = updates.columns.filter(c => c != idCol && !seqCol.contains(c))
    if (dataCols.isEmpty) updates.select(col(idCol)).dropDuplicates(idCol)
    else {
      val ord = seqCol.map(col).getOrElse(struct(dataCols.map(col): _*))
      val aggs = dataCols.map(f => max_by(col(f), when(col(f).isNotNull, ord)).as(f))
      updates.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** K1 — MERGE by `id`: non-null update fields overwrite, missing/null
    * update fields keep the current value; unmatched ids are inserted.
    * Schema = union of both sides' columns. Only buckets containing update
    * ids are rewritten. `seqCol` (not stored) orders duplicate updates. */
  def merge(updates: DataFrame, idCol: String = "id",
      seqCol: Option[String] = None): Int = {
    val collapsed0 = collapse(updates, idCol, seqCol)
    try {
      // first commit: the write is the collapse's ONLY consumer — no pin
      if (!exists) commit(collapsed0, idCol, replaceTouched)
      else {
        // eager localCheckpoint: read once for the touched-bucket collect,
        // again by the join and the commit write — and lineage truncation
        // keeps each of those actions from re-analyzing the full collapse
        // subtree (cache kept the data but re-planned the plan per action).
        // Fully consumed by the commit below; released in the finally.
        val collapsed = collapsed0.localCheckpoint(true)
        try {
        val m = readManifest(currentVersion)
        val touched = collapsed
          .select(bucketOf(col(idCol), m.nBuckets).as("b")).distinct()
          .collect().map(_.getLong(0).toInt)
        val paths = bucketPaths(m, touched)
        val merged =
          if (paths.isEmpty) collapsed
          else {
            val cur = readPaths(paths)
            val allCols = (cur.columns ++ collapsed.columns).distinct.filter(_ != idCol)
            def withAll(df: DataFrame): DataFrame =
              allCols.foldLeft(df)((d, c) =>
                if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
            val c = withAll(cur).as("c")
            val u = withAll(collapsed).as("u")
            c.join(u, col(s"c.$idCol") === col(s"u.$idCol"), "full_outer")
              .select(
                coalesce(col(s"u.$idCol"), col(s"c.$idCol")).as(idCol) +:
                  allCols.map(x => coalesce(col(s"u.$x"), col(s"c.$x")).as(x)): _*)
          }
        commit(merged, idCol, replaceTouched)
        } finally collapsed.unpersist(blocking = false)
      }
    } finally ()
  }

  /** Bucket column for a first-commit through a non-merge op: prefer the
    * conventional `id` column when present (so a later `merge(_, "id")`
    * finds the table bucketed as it expects), else the first column. */
  private def inferBucketCol(cols: Array[String]): String =
    if (exists) readManifest(currentVersion).bucketCol
    else cols.find(_ == "id").getOrElse(cols.head)

  /** K2 — distinct edge accumulation (bucketed by from_id), INCREMENTAL:
    * the new batch is deduped, anti-joined against the CURRENT rows of
    * only the buckets it touches, and the survivors fast-appended — a
    * commit reads/writes O(touched buckets), never the whole edge table
    * (the round-3 version read + distinct()ed + rewrote every bucket per
    * commit: O(|edges|) where K1 was already O(touched)). Per-bucket
    * distinctness is preserved: in-batch dups collapse in the distinct,
    * already-present edges die in the anti-join, and untouched buckets'
    * files are not read or rewritten. */
  def mergeEdges(edges: DataFrame): Int = {
    val fresh = edges.distinct()
    if (!exists) commit(fresh, "from_id", replaceTouched)
    else {
      val m = readManifest(currentVersion)
      val touched = fresh
        .select(bucketOf(col(m.bucketCol), m.nBuckets).as("b")).distinct()
        .collect().map(_.getLong(0).toInt)
      val paths = bucketPaths(m, touched)
      // single-consumer plan: the commit's write is the only action over
      // the anti-join, and its empty case (a replay, or fully-known
      // edges) is detected from the write output itself — no version, no
      // bucket data dir, and two fewer jobs than a localCheckpoint +
      // isEmpty probe
      val novel =
        if (paths.isEmpty) fresh
        else fresh.join(readPaths(paths), fresh.columns.toSeq, "left_anti")
      commit(novel, m.bucketCol, appendTouched, noopIfEmpty = true)
    }
  }

  /** Idempotent keyed insert — the content-addressed-store primitive: the
    * batch collapses to one row per `keyCol` (the MIN row by `ord`, which
    * must totally order rows within a key — e.g. `struct(seq, canonical)`
    * — so the winner is deterministic under any partitioning), survivors
    * anti-join ON THE KEY ONLY against the touched buckets' current rows,
    * and the novel keys fast-append. Existing rows are never rewritten and
    * their payload columns are never even read (the anti-join projects
    * just the key — parquet column pruning skips the blob bytes), so a
    * re-ingest of already-stored content is a key-plane-only no-op. The
    * groupBy's partial aggregation is the map-side combiner: duplicate
    * payloads collapse per partition before the one payload shuffle. */
  def insertIfAbsent(rows: DataFrame, keyCol: String, ord: Column): Int = {
    val payload = rows.columns.filter(_ != keyCol)
    require(payload.nonEmpty, s"insertIfAbsent needs payload columns beside '$keyCol'")
    val one0 = rows.groupBy(col(keyCol))
      .agg(min_by(struct(payload.map(col): _*), ord).as("_p"))
      .select(col(keyCol) +: payload.map(c => col(s"_p.$c").as(c)): _*)
    try {
      // first commit: the write is the batch's ONLY consumer — no pin
      if (!exists) commit(one0, keyCol, replaceTouched)
      else {
        // eagerly pinned: read by the touched-bucket collect, the
        // anti-join, and the commit — lineage truncation spares each
        // action a full re-analysis of the batch subtree. Fully consumed
        // by the commit below; released in the finally.
        val one = one0.localCheckpoint(true)
        try {
        val m = readManifest(currentVersion)
        require(m.bucketCol == keyCol,
          s"table $root is bucketed by '${m.bucketCol}', not '$keyCol'")
        val touched = one
          .select(bucketOf(col(keyCol), m.nBuckets).as("b")).distinct()
          .collect().map(_.getLong(0).toInt)
        val paths = bucketPaths(m, touched)
        // single-consumer plan (see mergeEdges): the commit write detects
        // the idempotent-replay empty case itself — no version, no write,
        // two fewer jobs than the old localCheckpoint + isEmpty probe
        val novel =
          if (paths.isEmpty) one
          else one.join(readPaths(paths).select(col(keyCol)), Seq(keyCol), "left_anti")
        commit(novel, keyCol, appendTouched, noopIfEmpty = true)
        } finally one.unpersist(blocking = false)
      }
    } finally ()
  }

  /** Compaction — the fast-append maintenance op (Iceberg's
    * `rewrite_data_files` analog). Every fast-append commit adds one more
    * data version to each touched bucket, so a rolling crawl that ingests
    * per wave leaves each bucket's read unioning O(commits) parquet dirs —
    * at 10^4 waves that is 10^4 footer opens per bucket per read, which
    * dwarfs the data it guards. Buckets whose version list exceeds
    * `maxVersionsPerBucket` get their current rows rewritten into ONE new
    * version; all other buckets keep their file lists byte-untouched. The
    * swap is the same atomic CURRENT replace as any commit, and older
    * manifests still resolve (time travel keeps working until
    * [[expireSnapshots]] deletes the files). Returns the new current
    * version — unchanged when nothing crossed the threshold, so calling
    * this after every ingest is cheap: the no-op path reads one manifest. */
  def compact(maxVersionsPerBucket: Int = 8): Int =
    if (!exists) currentVersion
    else {
      val m = readManifest(currentVersion)
      val toCompact = m.buckets.collect {
        case (b, vs) if vs.length > maxVersionsPerBucket => b
      }
      if (toCompact.isEmpty) currentVersion
      else {
        // bucket assignment is a pure function of (bucketCol, nBuckets),
        // so the rewrite lands each row back in its own bucket and
        // replaceTouched points exactly the compacted buckets at the
        // single new version
        val rows = readPaths(bucketPaths(m, toCompact))
        commit(rows, m.bucketCol, replaceTouched)
      }
    }

  /** Snapshot expiry (Iceberg's `expire_snapshots` analog): drop manifests
    * older than the last `keepLast` versions and delete data-version dirs
    * no surviving manifest references. A data version stays alive as long
    * as ANY kept manifest points at it (untouched buckets reference old
    * versions indefinitely), so this never breaks `read()` or
    * `readVersion` within the kept window — only time travel past it. */
  def expireSnapshots(keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val cur = currentVersion
    if (cur > 0) {
      val keepFrom = math.max(1, cur - keepLast + 1)
      // a manifest inside the window may already be gone (an earlier
      // expiry with a smaller keepLast deleted it) — skip, don't crash
      val live = (keepFrom to cur)
        .filter(v => Files.exists(Paths.get(s"$root/manifest_v$v.json")))
        .flatMap(v => readManifest(v).buckets.values.flatten).toSet
      for (v <- 1 until keepFrom) {
        val p = Paths.get(s"$root/manifest_v$v.json")
        if (Files.exists(p)) Files.delete(p)
      }
      val dataDir = new java.io.File(s"$root/data")
      for {
        d <- Option(dataDir.listFiles()).getOrElse(Array.empty)
        if d.getName.startsWith("v") && d.getName.drop(1).forall(_.isDigit)
        if !live.contains(d.getName.drop(1).toInt)
      } deleteRecursively(d)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** K3 — delete rows matching `pred`, then insert `replacements`. An
    * arbitrary predicate can match anything, so this is a full-table
    * rewrite by construction; when the delete set is keyed by the bucket
    * column — the reference's actual shape — use [[replaceForKeys]],
    * which touches O(batch's buckets). */
  def deleteThenInsert(pred: Column, replacements: DataFrame): Int = {
    val bucketCol = inferBucketCol(replacements.columns)
    val kept = if (exists) read().filter(!pred) else replacements.limit(0)
    commit(kept.unionByName(replacements, allowMissingColumns = true),
      bucketCol, replaceAll)
  }

  /** K3, keyed — replace the full row set of the given bucket-column
    * keys: every current row whose key appears in `keys` is deleted and
    * `replacements` inserted, reading and rewriting ONLY the buckets the
    * keys (and replacements) hash into — the reference's delete_old_urls
    * (delete by entity-key set, re-insert fresh rows,
    * crawler/spiders/__init__.py:110-115) is exactly this shape, and at
    * the 10^8-row design point it must not cost a table rewrite the way
    * [[deleteThenInsert]]'s arbitrary predicate does. A touched bucket
    * the delete empties is cleared in the manifest even though the
    * commit wrote no file for it; untouched buckets keep their files
    * byte-identical. */
  def replaceForKeys(keys: DataFrame, replacements: DataFrame): Int =
    if (!exists)
      commit(replacements, inferBucketCol(replacements.columns), replaceTouched)
    else {
      val m = readManifest(currentVersion)
      val keyCol = m.bucketCol
      require(keys.columns.contains(keyCol),
        s"keys must carry the table's bucket column '$keyCol'")
      val touched = keys.select(bucketOf(col(keyCol), m.nBuckets).as("b"))
        .unionByName(replacements.select(bucketOf(col(keyCol), m.nBuckets).as("b")))
        .distinct().collect().map(_.getLong(0).toInt)
      val paths = bucketPaths(m, touched)
      val kept =
        if (paths.isEmpty) read().limit(0)
        else readPaths(paths)
          .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      val touchedSet = touched.toSet
      commit(kept.unionByName(replacements, allowMissingColumns = true), keyCol,
        (prev, written, v) =>
          prev ++ touchedSet.map(_ -> (Nil: Seq[Int])) ++ written.map(_ -> Seq(v)))
    }

  /** Plain append (text-doc index K5) — fast-append: writes only the new
    * rows; prior data files are untouched. */
  def append(rows: DataFrame): Int =
    commit(rows, inferBucketCol(rows.columns), appendTouched)
}

object MergeOps {

  /** K4 — keep update rows whose `fkCol` exists as `idCol` in `parents`
    * (semi-join gate). */
  def gateByExistence(updates: DataFrame, parents: DataFrame,
      fkCol: String, idCol: String = "id"): DataFrame =
    updates.join(parents.select(col(idCol).as(fkCol)).distinct(), Seq(fkCol), "left_semi")

  /** K6 — split rows into (valid, quarantined) by required non-null,
    * non-empty fields. */
  def validateOrQuarantine(rows: DataFrame, required: Seq[String]): (DataFrame, DataFrame) = {
    val ok = required.map(c => col(c).isNotNull && col(c) =!= "").reduce(_ && _)
    (rows.filter(ok), rows.filter(!ok))
  }
}

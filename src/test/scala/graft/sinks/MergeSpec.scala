package graft.sinks

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("K1 merge: partial-field upsert, snapshot versioning, idempotence") {
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("merge"))
    t.merge(Seq(("Bill:1", "犬法案", "KAKUHOU"), ("Bill:2", "猫法案", "SHUHOU"))
      .toDF("id", "name", "category"))
    // partial update: only reason for Bill:1; new Bill:3
    t.merge(Seq(("Bill:1", Some("誤字修正のため"), None),
        ("Bill:3", None, Some("SANHOU")))
      .toDF("id", "reason", "category"))
    val rows = t.read().orderBy("id").collect()
    assert(rows.length == 3)
    val r1 = t.read().filter($"id" === "Bill:1").head()
    assert(r1.getAs[String]("name") == "犬法案") // untouched field kept
    assert(r1.getAs[String]("reason") == "誤字修正のため")
    assert(r1.getAs[String]("category") == "KAKUHOU")
    // re-running the same merge is a no-op on content (new snapshot, same rows)
    val v = t.currentVersion
    t.merge(Seq(("Bill:1", Some("誤字修正のため"), None): (String, Option[String], Option[String]))
      .toDF("id", "reason", "category"))
    assert(t.currentVersion == v + 1)
    assert(t.read().orderBy("id").collect().toSeq == rows.toSeq)
    // time travel: v1 had no reason column value
    assert(t.readVersion(1).columns.toSet == Set("id", "name", "category"))
  }

  test("K1 duplicate updates for one id are applied deterministically") {
    // with a sequence column: per field, last non-null in seq order wins
    // (reference arrival-order semantics); fields from different partial
    // updates MERGE instead of one row winning wholesale
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("merge-dup"))
    t.merge(Seq(("Bill:1", Some("first"), None, 1L),
        ("Bill:1", Some("second"), Some("KAKUHOU"), 2L),
        ("Bill:1", None, Some("SHUHOU"), 3L))
      .toDF("id", "reason", "category", "seq"), seqCol = Some("seq"))
    val r = t.read().head()
    assert(r.getAs[String]("reason") == "second") // seq 3 carried no reason
    assert(r.getAs[String]("category") == "SHUHOU")
    assert(!t.read().columns.contains("seq")) // seq is metadata, not stored
    // without a sequence column: still deterministic (row-content order)
    val u = new SnapshotTable(spark, SparkTestSession.tmpDir("merge-dup2"))
    val batch = Seq(("Bill:1", "b"), ("Bill:1", "a"), ("Bill:1", "c"))
    for (perm <- batch.permutations.take(6)) {
      u.merge(perm.toDF("id", "name"))
      assert(u.read().head().getAs[String]("name") == "c") // max content order
    }
  }

  test("K1 merge rewrites only the buckets its update ids touch") {
    val dir = SparkTestSession.tmpDir("merge-buckets")
    val t = new SnapshotTable(spark, dir, nBuckets = 8)
    t.merge((1 to 64).map(i => (s"Bill:$i", s"name$i")).toDF("id", "name"))
    val v1Buckets = Option(new java.io.File(s"$dir/data/v1").listFiles()).get
      .filter(_.isDirectory).map(_.getName).toSet
    assert(v1Buckets.size > 1) // ids actually span buckets
    t.merge(Seq(("Bill:7", "renamed")).toDF("id", "name"))
    val v2Buckets = Option(new java.io.File(s"$dir/data/v2").listFiles()).get
      .filter(_.isDirectory).map(_.getName).toSet
    assert(v2Buckets.size == 1) // one update id -> one bucket rewritten
    val rows = t.read().orderBy("id").as[(String, String)].collect()
    assert(rows.length == 64)
    assert(rows.toMap.apply("Bill:7") == "renamed")
    assert(rows.toMap.apply("Bill:8") == "name8") // untouched bucket intact
  }

  test("readForKeys: manifest-absent buckets yield an empty probe WITH the table's full schema") {
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("readforkeys"), nBuckets = 16)
    t.insertIfAbsent(Seq((100L, "w1")).toDF("k", "payload"), "k", col("payload"))
    // find a key whose bucket the manifest does NOT contain (the one
    // inserted row wrote exactly one bucket, so almost any other works)
    val usedBucket = spark.range(1).select(pmod(xxhash64(lit(100L)), lit(16))).head().getLong(0)
    val probeKey = (1L to 64L).find { k =>
      spark.range(1).select(pmod(xxhash64(lit(k)), lit(16))).head().getLong(0) != usedBucket
    }.get
    val probe = t.readForKeys(Seq(probeKey).toDF("k"), "k")
    assert(probe.columns.toSet == Set("k", "payload")) // payload column present
    assert(probe.count() == 0)
    // consumer shape that crashed before the fix: aggregate a payload
    // column of the join result against the empty probe
    val agg = Seq(probeKey).toDF("k").join(probe, Seq("k"))
      .agg(count(lit(1)), min(col("payload"))).collect()
    assert(agg.head.getLong(0) == 0L)
  }

  test("K5 append is a fast-append: new files only, old data untouched") {
    val dir = SparkTestSession.tmpDir("append")
    val t = new SnapshotTable(spark, dir)
    t.append(Seq(("Doc:1", "t1")).toDF("id", "body"))
    t.append(Seq(("Doc:2", "t2")).toDF("id", "body"))
    assert(t.read().count() == 2)
    // v2 holds only the appended row
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/data/v2").count() == 1)
  }

  test("K5/K1 interop: append-first table prefers the id column for bucketing") {
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("append-id"))
    // id is NOT the first column — bucketing must still pick it so a
    // later merge by id finds the layout it expects
    t.append(Seq(("body text", "Doc:1")).toDF("body", "id"))
    t.merge(Seq(("Doc:1", Some("t2")), ("Doc:2", Some("t3")))
      .toDF("id", "title"))
    val rows = t.read().orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[String]("body") == "body text") // append survived merge
    assert(rows.head.getAs[String]("title") == "t2")
  }

  test("K2 edge merge is distinct-accumulating") {
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("edges"))
    t.mergeEdges(Seq(("a", "b"), ("a", "c")).toDF("from_id", "to_id"))
    t.mergeEdges(Seq(("a", "b"), ("d", "e")).toDF("from_id", "to_id"))
    assert(t.read().count() == 3)
  }

  test("K2 edge merge is incremental: a 1-bucket batch leaves other buckets' files untouched") {
    val dir = SparkTestSession.tmpDir("edges-inc")
    val t = new SnapshotTable(spark, dir, nBuckets = 8)
    t.mergeEdges((1 to 64).map(i => (s"Member:$i", s"Bill:$i")).toDF("from_id", "to_id"))
    val v1Buckets = Option(new java.io.File(s"$dir/data/v1").listFiles()).get
      .filter(_.isDirectory).map(_.getName).toSet
    assert(v1Buckets.size > 1) // edges actually span buckets
    val v1Files = v1Buckets.map(b =>
      b -> Option(new java.io.File(s"$dir/data/v1/$b").listFiles()).get.map(_.getName).toSet).toMap
    // one new edge + one duplicate of an existing edge (same from_id)
    t.mergeEdges(Seq(("Member:7", "Bill:7"), ("Member:7", "Bill:999"))
      .toDF("from_id", "to_id"))
    // the commit wrote only the touched bucket, as an APPEND (v1 files intact)
    val v2Buckets = Option(new java.io.File(s"$dir/data/v2").listFiles()).get
      .filter(_.isDirectory).map(_.getName).toSet
    assert(v2Buckets.size == 1)
    v1Buckets.foreach { b =>
      val now = Option(new java.io.File(s"$dir/data/v1/$b").listFiles()).get.map(_.getName).toSet
      assert(now == v1Files(b), s"v1 files of $b changed")
    }
    // content: duplicate collapsed, new edge present, per-bucket distinctness holds
    assert(t.read().count() == 65)
    assert(t.read().filter($"from_id" === "Member:7").count() == 2)
  }

  test("K3 delete-then-insert replaces matching rows only") {
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("dti"))
    t.merge(Seq(("Url:1", "Bill:1", "KEIKA"), ("Url:2", "Bill:1", "HONBUN"),
      ("Url:3", "Bill:2", "KEIKA")).toDF("id", "to_id", "title"))
    t.deleteThenInsert($"to_id" === "Bill:1" && $"title" === "KEIKA",
      Seq(("Url:9", "Bill:1", "KEIKA")).toDF("id", "to_id", "title"))
    val ids = t.read().select("id").as[String].collect().toSet
    assert(ids == Set("Url:9", "Url:2", "Url:3"))
  }

  test("K3 keyed replace rewrites only the keys' buckets; a bucket emptied by the delete clears") {
    val dir = SparkTestSession.tmpDir("dti-keyed")
    val t = new SnapshotTable(spark, dir, nBuckets = 8)
    t.merge((1 to 64).map(i => (s"Url:$i", s"name$i")).toDF("id", "name"))
    val v1Files = Option(new java.io.File(s"$dir/data/v1").listFiles()).get
      .filter(_.isDirectory)
      .map(d => d.getName -> Option(d.listFiles()).get.map(_.getName).toSet).toMap
    assert(v1Files.size > 1)

    // replace Url:7's row set with a fresh row + a brand-new key
    t.replaceForKeys(Seq("Url:7").toDF("id"),
      Seq(("Url:7", "renamed7"), ("Url:999", "name999")).toDF("id", "name"))
    val rows = t.read().as[(String, String)].collect().toMap
    assert(rows.size == 65 && rows("Url:7") == "renamed7" && rows("Url:999") == "name999")
    assert(rows("Url:8") == "name8")
    // untouched buckets: v1 files byte-listing-identical
    val touched = Seq("Url:7", "Url:999")
      .map(k => graft.urls.UrlCanon.urlHash(k) % 8).map(b => s"_bucket=${(b + 8) % 8}").toSet
    v1Files.keys.filterNot(touched).foreach { b =>
      val now = Option(new java.io.File(s"$dir/data/v1/$b").listFiles()).get.map(_.getName).toSet
      assert(now == v1Files(b), s"v1 files of untouched $b changed")
    }

    // delete-only replace that empties a whole bucket: single-id table
    val t2 = new SnapshotTable(spark, SparkTestSession.tmpDir("dti-empty"), nBuckets = 4)
    t2.merge(Seq(("Url:1", "x"), ("Url:2", "y")).toDF("id", "name"))
    t2.replaceForKeys(Seq("Url:1").toDF("id"),
      spark.emptyDataset[(String, String)].toDF("id", "name"))
    assert(t2.read().as[(String, String)].collect().toMap == Map("Url:2" -> "y"))
  }

  test("K4 existence gate keeps only rows with a live parent") {
    val parents = Seq("Minutes:1", "Minutes:2").toDF("id")
    val updates = Seq(("Url:1", "Minutes:1"), ("Url:2", "Minutes:9")).toDF("id", "minutes_id")
    val gated = MergeOps.gateByExistence(updates, parents, "minutes_id")
    assert(gated.select("id").as[String].collect().toSeq == Seq("Url:1"))
  }

  test("insertIfAbsent of only-known keys is a version no-op") {
    import org.apache.spark.sql.functions.{col, struct}
    val t = new SnapshotTable(spark, SparkTestSession.tmpDir("noop-insert"))
    val rows = Seq(("k1", "v1", 1L), ("k2", "v2", 2L)).toDF("id", "payload", "seq")
    t.insertIfAbsent(rows, "id", struct(col("seq")))
    val v = t.currentVersion
    t.insertIfAbsent(rows, "id", struct(col("seq"))) // full replay
    assert(t.currentVersion == v) // no version burned, no data dir written
    assert(t.read().count() == 2)
  }

  test("compact: over-threshold buckets collapse to one data version, content and time travel intact") {
    val dir = SparkTestSession.tmpDir("compact")
    val t = new SnapshotTable(spark, dir, nBuckets = 4)
    // 6 fast-appends, each one row; bucket lists grow one version per
    // touched bucket per append
    for (i <- 1 to 6)
      t.append(Seq((s"Doc:$i", s"body$i")).toDF("id", "text"))
    val preVersion = t.currentVersion
    val preRows = t.read().orderBy("id").collect().toSeq
    def versionsPerBucket: Map[Int, Int] = {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/manifest_v${t.currentVersion}.json"))
      """"(\d+)":\[([\d,]*)\]""".r.findAllMatchIn(s)
        .map(m => m.group(1).toInt -> m.group(2).split(",").count(_.nonEmpty)).toMap
    }
    assert(versionsPerBucket.values.max > 1) // something accumulated
    val v = t.compact(maxVersionsPerBucket = 1)
    assert(v == preVersion + 1)
    assert(versionsPerBucket.values.forall(_ == 1)) // every bucket now one version
    assert(t.read().orderBy("id").collect().toSeq == preRows) // content identical
    assert(t.readVersion(preVersion).orderBy("id").collect().toSeq == preRows) // time travel
    // idempotent: nothing over threshold -> no new version
    assert(t.compact(maxVersionsPerBucket = 1) == v)
    // under-threshold is a no-op too
    assert(t.compact(maxVersionsPerBucket = 64) == v)
  }

  test("expireSnapshots: old manifests and unreferenced data versions deleted, current read intact") {
    val dir = SparkTestSession.tmpDir("expire")
    val t = new SnapshotTable(spark, dir, nBuckets = 4)
    for (i <- 1 to 5)
      t.append(Seq((s"Doc:$i", s"body$i")).toDF("id", "text"))
    t.compact(maxVersionsPerBucket = 0) // threshold 0 = rewrite every bucket
    val cur = t.currentVersion
    val preRows = t.read().orderBy("id").collect().toSeq
    t.expireSnapshots(keepLast = 1)
    // only the current manifest survives
    val manifests = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("manifest_")).map(_.getName).toSet
    assert(manifests == Set(s"manifest_v$cur.json"))
    // the compacted data version is the only one left (compaction put
    // every bucket on the final version)
    val dataDirs = new java.io.File(s"$dir/data").listFiles().map(_.getName).toSet
    assert(dataDirs == Set(s"v$cur"))
    assert(t.read().orderBy("id").collect().toSeq == preRows)
    intercept[Exception] { t.readVersion(cur - 1).collect() } // past the window
  }

  test("expireSnapshots tolerates a keep window wider than the surviving manifests") {
    val dir = SparkTestSession.tmpDir("expire-widen")
    val t = new SnapshotTable(spark, dir, nBuckets = 4)
    for (i <- 1 to 5)
      t.append(Seq((s"Doc:$i", s"body$i")).toDF("id", "text"))
    t.expireSnapshots(keepLast = 1) // deletes manifests v1..v4
    t.append(Seq(("Doc:6", "body6")).toDF("id", "text"))
    val preRows = t.read().orderBy("id").collect().toSeq
    t.expireSnapshots(keepLast = 3) // window reaches back into deleted manifests
    assert(t.read().orderBy("id").collect().toSeq == preRows)
  }

  test("expireSnapshots keeps data versions still referenced by kept manifests") {
    val dir = SparkTestSession.tmpDir("expire-ref")
    val t = new SnapshotTable(spark, dir, nBuckets = 4)
    for (i <- 1 to 4)
      t.append(Seq((s"Doc:$i", s"body$i")).toDF("id", "text"))
    val preRows = t.read().orderBy("id").collect().toSeq
    // no compaction: the current manifest references EVERY data version
    t.expireSnapshots(keepLast = 1)
    assert(t.read().orderBy("id").collect().toSeq == preRows) // nothing live deleted
  }

  test("K6 validate-or-quarantine splits on required fields") {
    val rows = Seq(("News:1", "title1", "body"), ("News:2", "", "body"),
      (null.asInstanceOf[String], "t", "b")).toDF("id", "title", "body")
    val (ok, bad) = MergeOps.validateOrQuarantine(rows, Seq("id", "title"))
    assert(ok.count() == 1)
    assert(bad.count() == 2)
  }
}

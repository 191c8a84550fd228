package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Sink semantics of the reference (SURVEY.md §2.2), re-expressed over
 * snapshot-versioned parquet tables:
 *
 *  - K1 `merge`: upsert by id with partial-field semantics — an update row
 *    only overwrites the fields it carries non-null (the reference MERGEs
 *    partial entities, e.g. a Bill with only id+reason:
 *    /root/reference/crawler/spiders/shugiin_spider.py:87-90).
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
 * Iceberg's runtime jar is not present in this sandbox, so the table
 * layout is an Iceberg-like snapshot directory tree
 * (`<table>/snapshots/v<N>/` + a CURRENT pointer); every MERGE writes a
 * new immutable snapshot — time travel = reading an older vN. A later
 * swap to Iceberg `MERGE INTO` is mechanical (documented deviation,
 * SURVEY.md §4).
 */
class SnapshotTable(spark: SparkSession, root: String) {

  private def currentPath = Paths.get(s"$root/CURRENT")

  def currentVersion: Int =
    if (Files.exists(currentPath)) Files.readString(currentPath).trim.toInt else 0

  def exists: Boolean = currentVersion > 0

  def read(): DataFrame = readVersion(currentVersion)

  def readVersion(v: Int): DataFrame = {
    require(v > 0, s"no snapshot v$v under $root")
    spark.read.parquet(s"$root/snapshots/v$v")
  }

  private def commit(df: DataFrame): Int = {
    val v = currentVersion + 1
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/snapshots/v$v")
    Files.createDirectories(Paths.get(root))
    Files.writeString(currentPath, v.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    v
  }

  /** K1 — MERGE by `id`: non-null update fields overwrite, missing/null
    * update fields keep the current value; unmatched ids are inserted.
    * Schema = union of both sides' columns. */
  def merge(updates: DataFrame, idCol: String = "id"): Int = {
    val merged =
      if (!exists) updates.dropDuplicates(idCol)
      else {
        val cur = read()
        val allCols = (cur.columns ++ updates.columns).distinct.filter(_ != idCol)
        def withAll(df: DataFrame): DataFrame =
          allCols.foldLeft(df)((d, c) =>
            if (d.columns.contains(c)) d else d.withColumn(c, lit(null)))
        val c = withAll(cur).as("c")
        val u = withAll(updates.dropDuplicates(idCol)).as("u")
        c.join(u, col(s"c.$idCol") === col(s"u.$idCol"), "full_outer")
          .select(
            coalesce(col(s"u.$idCol"), col(s"c.$idCol")).as(idCol) +:
              allCols.map(x => coalesce(col(s"u.$x"), col(s"c.$x")).as(x)): _*)
      }
    commit(merged)
  }

  /** K2 — distinct edge accumulation. */
  def mergeEdges(edges: DataFrame): Int = {
    val all = if (exists) read().unionByName(edges).distinct() else edges.distinct()
    commit(all)
  }

  /** K3 — delete rows matching `pred`, then insert `replacements`. */
  def deleteThenInsert(pred: Column, replacements: DataFrame): Int = {
    val kept = if (exists) read().filter(!pred) else replacements.limit(0)
    commit(kept.unionByName(replacements, allowMissingColumns = true))
  }

  /** Plain append (text-doc index K5). */
  def append(rows: DataFrame): Int = {
    val all = if (exists) read().unionByName(rows, allowMissingColumns = true) else rows
    commit(all)
  }
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

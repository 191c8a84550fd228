package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTTP revalidation planning — the bandwidth half of the recrawl economy
 * (the scheduling half is [[Recrawl]]). The reference re-downloads every
 * body on refresh, hidden behind Scrapy's 600 s HTTP cache
 * (/root/reference/crawler/settings.py:84-86); a 10^10-URL crawler
 * revalidates instead: a page we already hold is re-fetched with its
 * stored validator (If-None-Match) and an unchanged server answers 304
 * with NO body — on real corpora the refresh set is mostly unchanged, so
 * revisit bandwidth drops to headers.
 *
 * The validator is [[graft.model.SpanHash]]: one hash, computable as a
 * codegen'd column on the history side (here) and as plain Scala inside
 * the fetcher's conditional compare ([[graft.fetch.Fetcher.fetchConditional]]).
 *
 * The loop composes engine + ops pieces that all exist independently:
 *   history = observations(engine.fetchedTable)          // this file
 *   plan    = Revalidate.plan(Recrawl.due(...), history) // this file
 *   seeds   = Sources.revalidatingSeeds(plan)            // engine S14
 *   crawl   → 304 rows for unchanged pages               // fetchIter
 *   corpus  = Revalidate.resolve(refreshRun, priorRun)   // this file
 *
 * Scale shape: [[plan]] is one map-side-combinable max_by aggregate over
 * the history (O(urls) fixed-width output) plus one equi-join against the
 * due set; [[resolve]] is one equi-join on canonical in which bodies ship
 * only FROM the prior table TO the 304 rows that need them — the refresh
 * run's own rows never re-shuffle their spans.
 */
object Revalidate {

  /** The span-sequence validator as a column expression. */
  def validator(spans: Column): Column = graft.model.SpanHash.column(spans)

  /** Observation history from a crawl's fetched table: one
    * (url, wave, validator) per successful PAGE fetch. Raw 304 rows are
    * excluded — a revalidation proves the stored copy is still current
    * but carries no body to re-hash; run a refresh table through
    * [[resolve]] first and its revalidated rows come back as full-bodied
    * 200s, so [[Recrawl]]'s change detector sees the UNCHANGED hash. */
  def observations(fetched: DataFrame): DataFrame =
    fetched
      .filter(col("status") >= 200 && col("status") < 300 &&
        col("parse_fn") =!= graft.model.SpanKind.Media)
      .select(col("canonical").as("url"), col("wave"),
        validator(col("spans")).as("validator"))

  /** Fetch plan for a refresh: for each due url, `conditional` with the
    * LAST stored validator when history has one, else `full`. Output:
    * (url, mode, if_hash — null on full rows). */
  def plan(due: DataFrame, history: DataFrame): DataFrame = {
    val last = history.groupBy(col("url"))
      .agg(max_by(col("validator"), col("wave")).as("if_hash"))
    due.select(col("url")).distinct()
      .join(last, Seq("url"), "left")
      .select(col("url"),
        when(col("if_hash").isNotNull, lit("conditional"))
          .otherwise(lit("full")).as("mode"),
        col("if_hash"))
  }

  /** Resolve a refresh run against the prior corpus: 304 rows (content
    * unchanged — the fetch shipped no body) take doc_id + spans from the
    * prior run's copy of the same canonical; every other row passes
    * through untouched. The result is a full-bodied fetched-table view of
    * the refresh — feed it to [[observations]]/[[Recrawl]] and the
    * unchanged pages correctly hash identical to last time. */
  def resolve(refreshRun: DataFrame, prior: DataFrame): DataFrame = {
    val cols = refreshRun.columns.toSeq
    val stored = prior
      .filter(col("status") >= 200 && col("status") < 300)
      // one copy per canonical even if the prior table holds several
      // (e.g. a cache replay): latest (wave, seq) wins, deterministically
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("canonical"))
          .orderBy(col("wave").desc, col("seq").desc)))
      .filter(col("_rn") === 1)
      .select(col("canonical"), col("doc_id").as("_doc_id"), col("spans").as("_spans"))
    val revalidated = refreshRun.filter(col("status") === 304)
      .drop("doc_id", "spans")
      .join(stored, Seq("canonical"))
      .withColumnRenamed("_doc_id", "doc_id")
      .withColumnRenamed("_spans", "spans")
      // the resolved view is what a FRESH crawl would have produced: a
      // revalidated row is a confirmed-current observation, so it reads
      // as an ordinary 200 (downstream consumers — observations/Recrawl,
      // extraction transforms — need no 304 special case)
      .withColumn("status", lit(200))
      .select(cols.map(col): _*)
    refreshRun.filter(col("status") =!= 304).unionByName(revalidated)
  }
}

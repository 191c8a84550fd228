package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing for training-data
 * pipelines: media as opaque `binary` columns + typed metadata, processed
 * in partition-sized batches.
 *
 * Codec boundary: IMAGE decode is REAL ([[Multimodal.ImageIoDecoder]] —
 * `javax.imageio` ships in every JDK, so JPEG/PNG/GIF/BMP → grayscale
 * grid → dHash runs on actual pixels with zero new dependencies). Audio
 * and video codecs are not in the JDK and stay STUBBED behind
 * `MediaDecoder`: `FakeDecoder` produces deterministic features from the
 * bytes so the Spark-side plumbing (schema, batching, partitioning,
 * feature join-back) is real and tested; a production deployment swaps
 * in a JNI/Java codec without touching the pipeline.
 *
 * Scale notes: decode is the expensive stage, so it runs once per
 * partition batch via `mapPartitions` (amortizes model/codec init, the
 * same shape a Python deployment gets from `mapInPandas` batches);
 * media rows are `repartition`ed by byte-size salt first so a few huge
 * videos don't straggle one task.
 */
object Multimodal {

  /** A media row: opaque payload + typed metadata (input_hint style:
    * media refs travel with the span docs; payloads live here). */
  final case class MediaRow(
      media_ref: String,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_ref: String,
      kind: String,
      n_bytes: Long,
      sha_like: Long, // content hash (stands in for perceptual hash)
      feature: Array[Float]) // fixed-dim embedding (stubbed)

  /** Codec boundary: batch-in, batch-out (one call per partition batch —
    * init cost amortized like a mapInPandas batch). */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** Deterministic stand-in for the real codec: features derived from the
    * bytes, so tests can assert exact values. */
  object FakeDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        var h = 1125899906842597L
        var i = 0
        while (i < r.bytes.length) { h = h * 31 + (r.bytes(i) & 0xFF); i += 1 }
        val dim = 8
        val feature = Array.tabulate(dim) { d =>
          val x = h * (d * 2 + 1) + r.width * 131 + r.height * 17 + r.duration_ms
          ((x % 1000003L).toFloat / 1000003f)
        }
        MediaFeatures(r.media_ref, r.kind, r.bytes.length.toLong, h, feature)
      }
  }

  /** Decode/feature-extract pipeline: size-salted repartition →
    * partition-batched decode → typed feature table. */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      decoder: MediaDecoder = FakeDecoder,
      partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      // uniform hash spread with the payload's byte length folded into the
      // salt: re-encoded payloads under the same ref still move, and equal
      // refs with different sizes never collide into one task. (Beyond
      // uniform hashing, byte-weighted balancing — range partitioning on
      // cumulative size — is the documented production upgrade for
      // pathological few-giant-videos skews.)
      .withColumn("size_salt",
        pmod(xxhash64(col("media_ref"), length(col("bytes"))), lit(partitions)))
      .repartition(partitions, col("size_salt"))
      .drop("size_salt")
      .as[MediaRow]
      .mapPartitions(it => decoder.decodeBatch(it))
  }

  /** Frame-sampling plan for videos: every `everyMs` ms up to `maxFrames`
    * timestamps per video — pure column math (the decode of each frame
    * would go through the decoder above). */
  def frameSamplePlan(media: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_ref"),
        sequence(lit(0L), least(col("duration_ms"), lit(everyMs * (maxFrames - 1))), lit(everyMs))
          .as("frame_ts_ms"))
      .select(col("media_ref"), posexplode(col("frame_ts_ms")).as(Seq("frame_idx", "ts_ms")))

  // --------------------------------------------------------------------
  // Perceptual-hash near-dup for the media plane (image dedup).
  // --------------------------------------------------------------------

  /** A decoded-image hash row: opaque ref + its owner doc + 64-bit dHash. */
  final case class MediaHash(id: Long, media_ref: String, phash: Long)

  /** Raw media payload headed for perceptual hashing: `bytes` is the
    * DECODED grayscale grid, row-major `rows x (cols+1)` (one extra
    * column: dHash compares horizontal neighbors). The JPEG/PNG →
    * grayscale-grid resample is the stubbed codec stage (same boundary
    * as [[MediaDecoder]]); everything after the grid is real. */
  final case class GridRow(id: Long, media_ref: String, bytes: Array[Byte])

  /** REAL image decode for the dHash plane — the one codec stage the JDK
    * already ships: `javax.imageio` reads JPEG/PNG/GIF/BMP with zero new
    * dependencies, so image near-dup does not need the [[FakeDecoder]]
    * stub (which remains the deterministic oracle/test seam, and the
    * boundary for audio/video codecs the JDK lacks).
    *
    * Grid semantics: BT.601 integer luma (299R + 587G + 114B) / 1000,
    * area-averaged per cell — each of the rows×(cols+1) cells averages
    * its full source-pixel block, the classic box-filter downsample
    * dHash uses (gradient DIRECTION survives resampling, brightness and
    * contrast shifts, and mild recompression). Returns None for
    * undecodable payloads (truncated/foreign formats) — callers drop or
    * quarantine, never crash the partition. */
  object ImageIoDecoder extends Serializable {
    def grayscaleGrid(bytes: Array[Byte], rows: Int = 8,
        cols: Int = 8): Option[Array[Byte]] = {
      val img =
        // NonFatal, not just IOException: malformed payloads also surface
        // as RuntimeExceptions from codec internals (IllegalArgument,
        // CMMException from bad ICC profiles, ArrayIndexOutOfBounds) and
        // must drop the payload, never crash the partition
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // one bulk RGB grab (TYPE_INT_ARGB layout regardless of the
        // source raster) — per-pixel getRGB would re-convert per call
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val gw = cols + 1
        val out = new Array[Byte](rows * gw)
        var r = 0
        while (r < rows) {
          val y0 = (r.toLong * h / rows).toInt
          val y1 = math.max(y0 + 1, ((r + 1).toLong * h / rows).toInt)
          var c = 0
          while (c < gw) {
            val x0 = (c.toLong * w / gw).toInt
            val x1 = math.max(x0 + 1, ((c + 1).toLong * w / gw).toInt)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              val base = y * w
              while (x < x1) {
                val p = rgb(base + x)
                sum += ((p >> 16 & 0xFF) * 299 + (p >> 8 & 0xFF) * 587 +
                  (p & 0xFF) * 114) / 1000
                x += 1
              }
              y += 1
            }
            out(r * gw + c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
            c += 1
          }
          r += 1
        }
        Some(out)
      }
    }
  }

  /** Decoded-grid plane from RAW image payloads via [[ImageIoDecoder]]:
    * (idCol, refCol, bytesCol) rows → [[GridRow]]s ready for [[dhash64]].
    * Partition-batched like [[extractFeatures]] (decode is the expensive
    * stage; payloads die in their partition — only 72-byte grids
    * survive). Undecodable payloads are dropped; diff the input/output
    * counts for the quarantine metric. */
  def imageGrids(spark: SparkSession, media: DataFrame, idCol: String,
      refCol: String, bytesCol: String, rows: Int = 8,
      cols: Int = 8): Dataset[GridRow] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(refCol), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, ref, bytes) =>
        ImageIoDecoder.grayscaleGrid(bytes, rows, cols)
          .map(g => GridRow(id, ref, g))
      })
  }

  /** Difference hash (dHash, Krawetz 2013 — the standard cheap image
    * near-dup fingerprint): bit (r*cols + c) is set iff
    * grid[r][c] < grid[r][c+1], over a rows x (cols+1) grayscale grid.
    * Gradient *direction* survives brightness/contrast shifts and
    * mild recompression, so near-identical images land within a few
    * bits of each other.
    *
    * Runs as a partition-batched pass over the decoded grids (the codec
    * boundary — one iterator per partition, like [[extractFeatures]]);
    * the hash itself is an allocation-free loop. 8x8 bits by default
    * (rows = cols = 8 → 72-byte grid, 64-bit hash). */
  def dhash64(spark: SparkSession, grids: Dataset[GridRow],
      rows: Int = 8, cols: Int = 8): Dataset[MediaHash] = {
    require(rows * cols <= 64, s"dhash $rows x $cols exceeds 64 bits")
    import spark.implicits._
    val stride = cols + 1
    grids.mapPartitions { it =>
      it.map { g =>
        require(g.bytes.length >= rows * stride,
          s"grid for ${g.media_ref}: ${g.bytes.length} bytes < ${rows * stride}")
        var h = 0L
        var r = 0
        while (r < rows) {
          var c = 0
          while (c < cols) {
            val left = g.bytes(r * stride + c) & 0xFF
            val right = g.bytes(r * stride + c + 1) & 0xFF
            if (left < right) h |= (1L << (r * cols + c))
            c += 1
          }
          r += 1
        }
        MediaHash(g.id, g.media_ref, h)
      }
    }
  }

  /** Near-duplicate image pairs: banded multi-index join over the dHash
    * plane — [[Dedup.simhashPairsFor]]'s pigeonhole machinery applied to
    * the perceptual hash (maxHamming+agreeBlocks blocks; with
    * agreeBlocks = 2 every pair within `maxHamming` bits shares an exact
    * pair-of-blocks key, so candidate generation is provably complete).
    * Only (id, phash) travels; payloads and grids never shuffle. Returns
    * (doc_a, doc_b, hamming) with doc_a < doc_b, one row per pair. */
  def phashPairs(hashes: Dataset[MediaHash], maxHamming: Int = 4,
      maxBucketSize: Int = 10000): DataFrame =
    Dedup.simhashPairsFor(hashes.toDF.select(col("id"), col("phash")),
      "id", "phash", bits = 64, maxHamming = maxHamming,
      maxBucketSize = maxBucketSize, agreeBlocks = 2)

  /** Video-level near-dup pairs from sampled frame fingerprints: two
    * videos are near-dups when the JACCARD of their distinct frame-hash
    * sets clears `threshold` — the standard shot-level video dedup for
    * multimodal corpora (frame sample via [[frameSamplePlan]], per-frame
    * dHash via [[dhash64]], then set overlap via the SAME posting-join
    * core as [[Dedup.ngramJaccardPairs]] — `Dedup.postingJaccardPairs`
    * with frame hashes in place of text shingles).
    *
    * Frames match by EXACT hash equality (a dHash already absorbs
    * re-encode noise within a frame), so candidate generation is a plain
    * equi-join on the 8-byte hash — no banding needed and nothing can be
    * missed. The `maxDf` guard drops hashes shared by more than `maxDf`
    * videos before the f² posting self-join (black/intro frames are the
    * boilerplate n-grams of the video plane); Jaccard is computed over
    * the capped sets on both sides, so the estimate stays
    * self-consistent. Shuffles carry (video, 8-byte hash) only.
    *
    * Expects (videoCol, hashCol) rows, one per sampled frame; emits
    * (video_a, video_b, shared, jaccard) with video_a < video_b. */
  def videoNearDupPairs(frameHashes: DataFrame, videoCol: String,
      hashCol: String, threshold: Double = 0.3,
      maxDf: Int = 10000): DataFrame = {
    val f = frameHashes.select(col(videoCol).as("vid"), col(hashCol).as("ph"))
      .distinct()
    Dedup.postingJaccardPairs(f, "vid", "ph", threshold, maxDf)
      .select(col("doc_a").as("video_a"), col("doc_b").as("video_b"),
        col("inter").as("shared"), col("jaccard"))
  }

  // --------------------------------------------------------------------
  // Interleaved image-text alignment (CLIP-style caption mining).
  // --------------------------------------------------------------------

  /** For every media span in an interleaved span table, the nearest text
    * span by document order within `window` positions — the standard
    * weak-supervision pairing for image-text training data (alt-text /
    * adjacent-caption mining, LAION-style, over the input_hint span
    * shape).
    *
    * Plan: ONE shuffle (partition by doc), two running window passes
    * (last text above, first text below — both ignore-nulls frame scans
    * over the same sort), then a row-local nearest/tie-break pick. No
    * self-join, no explode beyond the input: at 100 TB the cost is the
    * per-document sort, and documents are bounded.
    *
    * Tie-break: the EARLIER span wins on equal distance (captions lead
    * their image more often than they trail it). Media spans with no
    * text span within `window` are dropped.
    *
    * Expects columns (idCol, offset, kind, text, media_ref); emits
    * (idCol, media_ref, media_offset, caption, caption_offset, delta). */
  def captionPairs(spans: DataFrame, idCol: String, window: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("offset"))
    val above = w.rowsBetween(Window.unboundedPreceding, -1)
    val below = w.rowsBetween(1, Window.unboundedFollowing)
    val textOff = when(col("kind") === "text", col("offset"))
    val textVal = when(col("kind") === "text", col("text"))
    // one projection level: analysis groups the four window expressions
    // by frame into exactly two Window nodes over the same sort (a
    // withColumn chain leaves four un-collapsed single-expression Windows)
    val annotated = spans.select(col("*"),
      last(textOff, ignoreNulls = true).over(above).as("prev_off"),
      last(textVal, ignoreNulls = true).over(above).as("prev_txt"),
      first(textOff, ignoreNulls = true).over(below).as("next_off"),
      first(textVal, ignoreNulls = true).over(below).as("next_txt"))
    val prevDelta = col("offset") - col("prev_off")
    val nextDelta = col("next_off") - col("offset")
    val usePrev = col("prev_off").isNotNull &&
      prevDelta <= window &&
      (col("next_off").isNull || prevDelta <= nextDelta)
    val useNext = !usePrev && col("next_off").isNotNull && nextDelta <= window
    annotated
      .filter(col("kind") === "media")
      .filter(usePrev || useNext)
      .select(col(idCol), col("media_ref"),
        col("offset").as("media_offset"),
        when(usePrev, col("prev_txt")).otherwise(col("next_txt")).as("caption"),
        when(usePrev, col("prev_off")).otherwise(col("next_off")).as("caption_offset"),
        when(usePrev, prevDelta).otherwise(nextDelta).as("delta"))
  }
}

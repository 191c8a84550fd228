package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing for training-data
 * pipelines: media as opaque `binary` columns + typed metadata, processed
 * in partition-sized batches.
 *
 * The actual codec work is STUBBED — image/audio libraries are not in
 * this container — behind `MediaDecoder`: `FakeDecoder` produces
 * deterministic features from the bytes so the Spark-side plumbing
 * (schema, batching, partitioning, feature join-back) is real and tested;
 * a production deployment swaps in a JNI/Java codec without touching the
 * pipeline.
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
}

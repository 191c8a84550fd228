package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/**
 * Golden tests for the REAL image-decode path (Multimodal.ImageIoDecoder
 * — javax.imageio, no external libraries): actual PNG/JPEG bytes through
 * grayscale-grid resample → dhash64 → banded near-dup, pinning exact
 * grid values and hash bits, plus the invariances dHash exists for
 * (brightness shift, JPEG recompression).
 */
class ImageDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A real 36x32 PNG, checked in as bytes: 9 vertical 4px bands with
    * luma 0, 25, 50, …, 200 left to right (RGB, 8-bit, no filter). */
  private val GoldenPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAACQAAAAgCAIAAAD1803ZAAAAPElEQVR4nO3NwQAAIBAF0a+RRhqr" +
    "kUYaaaQR1l7nksE8gZfAgAkFCzYcuPAgZmZmZmZmZmZmZmZmZr+sAYprRkzzlKtXAAAAAElFTkSu" +
    "QmCC")

  private def png(img: BufferedImage): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    ImageIO.write(img, "png", b)
    b.toByteArray
  }

  private def jpeg(img: BufferedImage): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", b)
    b.toByteArray
  }

  /** w x h RGB image with per-pixel luma f(x, y) (0-255, applied to all
    * three channels). */
  private def mk(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def hashOf(bytes: Array[Byte]): Long = {
    val grid = Multimodal.ImageIoDecoder.grayscaleGrid(bytes).get
    val ds = spark.createDataset(Seq(Multimodal.GridRow(1L, "g", grid)))
    Multimodal.dhash64(spark, ds).collect().head.phash
  }

  test("golden PNG: exact grid values and all-ones dHash") {
    // 9 constant 4px bands, luma 25 apart; BT.601 of (v,v,v) is v, and
    // each 4x4-block average is exactly the band value
    val grid = Multimodal.ImageIoDecoder.grayscaleGrid(GoldenPng)
    assert(grid.isDefined)
    val g = grid.get
    assert(g.length == 8 * 9)
    for (r <- 0 until 8; c <- 0 until 9)
      assert((g(r * 9 + c) & 0xFF) == c * 25,
        s"cell ($r,$c) = ${g(r * 9 + c) & 0xFF}, expected ${c * 25}")
    // strictly increasing left-to-right in every row -> all 64 bits set
    assert(hashOf(GoldenPng) == -1L)
  }

  test("dHash geometry: vertical gradient has no horizontal edges") {
    assert(hashOf(png(mk(72, 64)((_, y) => 30 + y * 2))) == 0L)
  }

  test("dHash invariance: brightness shift and JPEG recompression keep the hash") {
    // mid-range horizontal gradient (30..180) so a +40 shift saturates
    // nothing and every gradient direction survives
    def grad(shift: Int) = mk(72, 64)((x, _) => 30 + x * 150 / 71 + shift)
    val base = hashOf(png(grad(0)))
    assert(base == -1L) // strictly increasing rows
    assert(hashOf(png(grad(40))) == base, "brightness shift must not move dHash")
    assert(hashOf(jpeg(grad(0))) == base, "JPEG recompression must not move dHash")
  }

  test("imageGrids: real decode in-pipeline; undecodable payloads dropped; near-dup found") {
    def grad(shift: Int, seed: Int) =
      png(mk(72, 64)((x, y) => 30 + x * 150 / 71 + shift + (if (seed > 0 && ((x * 7 + y * 13 + seed) % 97 == 0)) 1 else 0)))
    val inverse = png(mk(72, 64)((x, _) => 180 - x * 150 / 71))
    val rows = Seq(
      (1L, "m1", grad(0, 0)),
      (2L, "m2", grad(35, 3)),          // brightness-shifted + pixel noise
      (3L, "m3", inverse),              // reversed gradient: far in Hamming
      (4L, "bad", Array[Byte](1, 2, 3)) // not an image
    ).toDF("id", "media_ref", "bytes")
    val grids = Multimodal.imageGrids(spark, rows, "id", "media_ref", "bytes")
    assert(grids.count() == 3) // the garbage payload dropped, not crashed
    val hashes = Multimodal.dhash64(spark, grids)
    val pairs = Multimodal.phashPairs(hashes, maxHamming = 4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // the shifted copy pairs, the inverse doesn't
  }
}

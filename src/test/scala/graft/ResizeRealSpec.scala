package graft

import java.awt.image.BufferedImage

/** Hand-computed area-average resize on constructed rasters — pins the
  * exact integer overlap/floor-divide/hash semantics the oracle replays.
  */
class ResizeRealSpec extends SparkSpec {

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
    im
  }

  test("4x2 to 2x1: each output pixel is the floored mean of its half") {
    // left half pixels: (10,20,30),(12,22,32),(14,24,34),(16,26,36)
    // right half: (100,0,0),(104,0,0),(200,50,8),(204,54,12)
    val vals = Map(
      (0, 0) -> (10, 20, 30), (1, 0) -> (12, 22, 32),
      (0, 1) -> (14, 24, 34), (1, 1) -> (16, 26, 36),
      (2, 0) -> (100, 0, 0), (3, 0) -> (104, 0, 0),
      (2, 1) -> (200, 50, 8), (3, 1) -> (204, 54, 12))
    val im = img(4, 2) { (x, y) =>
      val (r, g, b) = vals((x, y)); (r << 16) | (g << 8) | b
    }
    val (ow, oh, rhash) = graft.operators.Multimodal.areaResizeHash(im, 2)
    assert((ow, oh) == (2, 1))
    // left mean: r=(10+12+14+16)/4=13, g=23, b=33; right: r=152, g=26, b=5
    val expected = 1L * (3 * 13 + 5 * 23 + 7 * 33) + (1L + 31) * (3 * 152 + 5 * 26 + 7 * 5)
    assert(rhash == expected)
  }

  test("constant-color raster resizes to the same color at every cell") {
    val im = img(8, 8)((_, _) => (40 << 16) | (50 << 8) | 60)
    val (ow, oh, rhash) = graft.operators.Multimodal.areaResizeHash(im, 4)
    assert((ow, oh) == (4, 4))
    val perPixel = 3 * 40 + 5 * 50 + 7 * 60
    val expected = (for (j <- 0 until 4; i <- 0 until 4)
      yield (1L + 31 * i + 17 * j) * perPixel).sum
    assert(rhash == expected)
  }

  test("registered query decodes real PNGs and matches the formula raster") {
    // doc 5: w = 8+5%9 = 13, h = 8+15%9 = 14 — decode through the real
    // codec must agree with computing the hash straight from the formula
    val row = graft.operators.Multimodal.resizeReal(sf, 4)
      .where(org.apache.spark.sql.functions.col("doc_id") === 5).collect()(0)
    assert(row.getInt(1) == 13 && row.getInt(2) == 14)
    val formula = img(13, 14) { (x, y) =>
      val r = ((5 + 7 * x + 13 * y) % 256).toInt
      val g = ((10 + 11 * x + 3 * y) % 256).toInt
      val b = ((15 + 5 * x + 17 * y) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    val (ow, oh, rhash) = graft.operators.Multimodal.areaResizeHash(formula, 4)
    assert((row.getInt(3), row.getInt(4), row.getLong(5)) == ((ow, oh, rhash)))
  }
}

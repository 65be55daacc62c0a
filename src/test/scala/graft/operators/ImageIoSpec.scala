package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The real-codec contract (m15): PNG round-trips bit-exactly through
  * the JDK codec into the shared PpmImage raster, JPEG reproduces
  * dimensions exactly and pixels within quantization tolerance, the
  * production decodePixels kernel prefers real codecs over the fake,
  * and corrupt bytes degrade to None instead of throwing. */
class ImageIoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def gradient(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (((x * 9) % 256) << 16) | (((y * 11) % 256) << 8) | ((x + y) % 256))
    img
  }

  private def encode(img: java.awt.image.BufferedImage,
      fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("PNG: lossless round-trip into the shared raster") {
    val img = gradient(13, 7)
    val dec = MultimodalOps.decodeImageIo(encode(img, "png")).get
    assert(dec.width == 13 && dec.height == 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      val rgb = img.getRGB(x, y)
      val i = (y * 13 + x) * 3
      assert((dec.pixels(i) & 0xff) == ((rgb >> 16) & 0xff))
      assert((dec.pixels(i + 1) & 0xff) == ((rgb >> 8) & 0xff))
      assert((dec.pixels(i + 2) & 0xff) == (rgb & 0xff))
    }
  }

  test("JPEG: exact dimensions, pixels within quantization tolerance") {
    val img = gradient(16, 16)
    val dec = MultimodalOps.decodeImageIo(encode(img, "jpg")).get
    assert(dec.width == 16 && dec.height == 16)
    var sumAbs = 0L
    for (y <- 0 until 16; x <- 0 until 16) {
      val rgb = img.getRGB(x, y)
      val i = (y * 16 + x) * 3
      sumAbs += math.abs((dec.pixels(i) & 0xff) - ((rgb >> 16) & 0xff)) +
        math.abs((dec.pixels(i + 1) & 0xff) - ((rgb >> 8) & 0xff)) +
        math.abs((dec.pixels(i + 2) & 0xff) - (rgb & 0xff))
    }
    val meanAbs = sumAbs.toDouble / (16 * 16 * 3)
    assert(meanAbs < 24.0, s"JPEG mean abs err $meanAbs too high")
  }

  test("decodePixels prefers real codecs; corrupt bytes fall back") {
    val png = encode(gradient(5, 4), "png")
    assert(MultimodalOps.decodePixels(png) == 20, "real PNG w*h")
    val jpg = encode(gradient(6, 3), "jpg")
    assert(MultimodalOps.decodePixels(jpg) == 18, "real JPEG w*h")
    // corrupt: PNG magic then garbage — None from ImageIO, fake kicks in
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      1, 2, 3)
    assert(MultimodalOps.decodeImageIo(corrupt).isEmpty)
    assert(MultimodalOps.decodePixels(corrupt) == corrupt.length * 3)
  }

  test("m15 fixture: JPEG arm really went through the JDK codec") {
    val sf = "/root/testdata/sf0.001"
    val rows = MultimodalOps.imageioDecode(spark, sf).collect()
    assert(rows.nonEmpty)
    val (png, jpg) = rows.partition(_.getString(1) == "png")
    assert(png.nonEmpty && jpg.nonEmpty)
    // dims obey the planted law on BOTH arms (a failed JPEG decode
    // could not know them), checksum only on the lossless arm
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == 8 + id % 5 && r.getLong(3) == 6 + id % 3)
    }
    assert(png.forall(!_.isNullAt(4)) && jpg.forall(_.isNullAt(4)))
  }
}

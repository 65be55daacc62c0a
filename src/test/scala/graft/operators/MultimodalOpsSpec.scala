package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The REAL half of the multimodal kernels: the pure-JVM PPM (P6)
  * decode/encode/resize path, standalone and through the distributed
  * decodeBatched shape (valid payloads decode for real, everything else
  * falls back to the deterministic fake — never throws). */
class MultimodalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** w×h gradient raster: pixel (x,y) = (x%256, y%256, (x+y)%256). */
  private def gradient(w: Int, h: Int): MultimodalOps.PpmImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      px(i) = (x % 256).toByte
      px(i + 1) = (y % 256).toByte
      px(i + 2) = ((x + y) % 256).toByte
    }
    MultimodalOps.PpmImage(w, h, px)
  }

  test("PPM round-trip is lossless, header comments and whitespace parse") {
    val img = gradient(13, 7)
    val decoded = MultimodalOps.decodePpm(MultimodalOps.encodePpm(img))
    assert(decoded.contains(img)) // PpmImage equality includes pixels

    // netpbm header laxity: comments + multi-whitespace between tokens
    val weird = ("P6\n# a comment\n 13 # inline\n\t7\n255\n")
      .getBytes("US-ASCII") ++ img.pixels
    val d2 = MultimodalOps.decodePpm(weird).get
    assert(d2.width == 13 && d2.height == 7)
    assert(java.util.Arrays.equals(d2.pixels, img.pixels))
  }

  test("malformed payloads return None, never throw") {
    val img = gradient(4, 4)
    val good = MultimodalOps.encodePpm(img)
    assert(MultimodalOps.decodePpm(Array[Byte]()).isEmpty)
    assert(MultimodalOps.decodePpm("P5\n4 4\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(MultimodalOps.decodePpm(good.dropRight(1)).isEmpty) // truncated
    assert(MultimodalOps.decodePpm(good ++ Array[Byte](0)).isEmpty) // trailing
    assert(MultimodalOps.decodePpm(
      "P6\n4 4\n65535\n".getBytes("US-ASCII") ++ img.pixels).isEmpty) // 16-bit
    assert(MultimodalOps.decodePpm(
      "P6\n0 4\n255\n".getBytes("US-ASCII")).isEmpty) // zero dim
  }

  test("nearest-neighbor resize samples block top-left corners") {
    val img = gradient(8, 6)
    val half = MultimodalOps.resizePpm(img, 2)
    assert(half.width == 4 && half.height == 3)
    // pixel (x,y) of the half image == pixel (2x,2y) of the original
    for (y <- 0 until 3; x <- 0 until 4) {
      val d = (y * 4 + x) * 3
      val s = ((2 * y) * 8 + (2 * x)) * 3
      assert(half.pixels(d) == img.pixels(s))
      assert(half.pixels(d + 1) == img.pixels(s + 1))
      assert(half.pixels(d + 2) == img.pixels(s + 2))
    }
    // resize of an encoded round-trip equals resize of the original
    val viaBytes = MultimodalOps.resizePpm(
      MultimodalOps.decodePpm(MultimodalOps.encodePpm(img)).get, 2)
    assert(java.util.Arrays.equals(viaBytes.pixels, half.pixels))
  }

  test("decodeBatched: real decode for PPM payloads, fake fallback for the rest") {
    val s = spark
    import s.implicits._
    val ppm = MultimodalOps.encodePpm(gradient(10, 5)) // 50 real pixels
    val junk = "not an image at all".getBytes("US-ASCII") // 19 bytes
    // the ACTUAL decodeBatched pipeline (fixture-injected), not a copy
    val rows = MultimodalOps.decodeBatchedOn(
      Seq((1L, ppm), (2L, junk)).toDF("media_id", "payload"))
      .collect().toMap
    assert(rows(1L) == 50, "valid PPM must take the REAL decode path")
    assert(rows(2L) == 57, "non-PPM must take the deterministic fallback")
  }

  test("m06 ahash: block-mean bits, identical inputs, length gate") {
    val s = spark
    import s.implicits._
    // 64 chars: first 32 are 'a' (97), last 32 are 'z' (122) — global
    // mean 109.5, so blocks 0-31 (each one 'a') sit below, 32-63
    // above: c0 = c1 = 0, c2 = c3 = 0xFFFF
    val half = "a" * 32 + "z" * 32
    // uniform text: every block equals the mean, strict > fails, all
    // chunks 0
    val flat = "m" * 100
    val got = MultimodalOps.ahashOn(Seq(
      (1L, half), (2L, half), (3L, flat), (4L, "short"))
      .toDF("media_id", "txt"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (0L, 0L, 65535L, 65535L))
    assert(got(2L) == got(1L)) // identical payloads, identical hash
    assert(got(3L) == (0L, 0L, 0L, 0L))
    assert(!got.contains(4L)) // < 64 units: excluded, both engines
  }

  test("m07 candidates: chunk collisions pair up, hamming exact") {
    val s = spark
    import s.implicits._
    val half = "a" * 32 + "z" * 32 // chunks (0, 0, 0xFFFF, 0xFFFF)
    val flat = "m" * 100 // chunks (0, 0, 0, 0): collides on bands 0-1
    val got = MultimodalOps.ahashCandidatesOn(Seq(
      (1L, half), (2L, half), (3L, flat)).toDF("media_id", "txt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // identical pair at hamming 0; the flat item collides with both
    // halves on the zero chunks and reports the true 32-bit distance
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 32L), (2L, 3L, 32L)))
  }

  test("m07/m08 hot-bucket cap drops boilerplate buckets, keeps cold pairs") {
    val s = spark
    import s.implicits._
    val half = "a" * 32 + "z" * 32
    // 70 identical flat payloads: every band bucket holds 70 > 64 and
    // is dropped — zero pairs from the boilerplate group; the cold
    // identical pair survives untouched
    val rows = (10L until 80L).map(i => (i, "m" * 100)) ++
      Seq((1L, half), (2L, half))
    val got = MultimodalOps.ahashCandidatesOn(rows.toDF("media_id", "txt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
    // and with the cap lifted the boilerplate group pairs quadratically
    val uncapped = MultimodalOps.ahashCandidatesOn(
      rows.toDF("media_id", "txt"), maxBucket = 1000L).count()
    assert(uncapped === 70L * 69 / 2 + 1 + 140) // group pairs + cold pair
      // + 70×2 flat-vs-half collisions on the zero chunks
  }

  /** Independent scalar reference of m09's integer pHash pipeline —
    * same grid, same frozen coefficients, no Spark. */
  private def refPhash(txt: String): Seq[Long] = {
    val len = txt.length.toLong
    val codes = txt.map(_.toInt.toLong)
    val m = (0 until 64).map { bk =>
      val a = (bk * len / 64).toInt
      val b = ((bk + 1) * len / 64).toInt
      codes.slice(a, b).sum * 100 / (b - a)
    }
    val k = MultimodalOps.dctK.map { case (f, t, w) => (f, t) -> w }.toMap
    val d = for (u <- 0 until 8; v <- 0 until 8) yield
      (u * 8 + v,
        (for (x <- 0 until 8; y <- 0 until 8)
          yield m(8 * x + y) * k((v, y)) * k((u, x))).sum)
    val ac = d.filter(_._1 > 0)
    val med = ac.map(_._2).sorted.apply(31)
    (0 until 4).map { c =>
      ac.filter { case (bk, dc) =>
        bk >= c * 16 && bk < (c + 1) * 16 && dc > med
      }.map { case (bk, _) => 1L << (bk % 16) }.sum
    }
  }

  test("m09 pHash equals the scalar reference; invariances hold") {
    val s = spark
    import s.implicits._
    val grad = (0 until 128).map(i => ('a' + i % 26).toChar).mkString
    val flat = "m" * 100
    val rows = Seq((1L, grad), (2L, flat), (3L, grad + "zzzzqqqq"))
    val got = MultimodalOps.dctPhashOn(rows.toDF("media_id", "txt"))
      .collect()
      .map(r => r.getLong(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    rows.foreach { case (id, txt) =>
      assert(got(id) == refPhash(txt), s"media $id")
    }
    // constant signal: every AC coefficient is 0, nothing exceeds the
    // median → all-zero hash (the brightness-invariance base case)
    assert(got(2L) == Seq(0L, 0L, 0L, 0L))
    // structured signal must produce a non-trivial hash
    assert(got(1L).exists(_ != 0L))
  }

  test("m10 phash candidates: shared kernel pairs identical media") {
    val s = spark
    import s.implicits._
    val grad = (0 until 128).map(i => ('a' + i % 26).toChar).mkString
    val flat = "m" * 100
    val got = MultimodalOps.chunkCandidates(
      MultimodalOps.dctPhashOn(
        Seq((1L, grad), (2L, grad), (3L, flat))
          .toDF("media_id", "txt"))
        .selectExpr("media_id", "p0 AS c0", "p1 AS c1", "p2 AS c2",
          "p3 AS c3"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // identical payloads: identical pHash, hamming 0
    assert(got((1L, 2L)) == 0L)
    // the flat doc's hash is all-zero; it band-collides with the grad
    // docs only on grad's zero chunks, and the hamming it reports is
    // grad's full popcount
    val pop = refPhash(grad).map(java.lang.Long.bitCount(_).toLong).sum
    got.get((1L, 3L)).foreach(h => assert(h == pop))
  }

  test("m08 clusters: band pairs merge, min-id keeps, singletons self") {
    val s = spark
    import s.implicits._
    val half = "a" * 32 + "z" * 32 // 1 and 2 pair at hamming 0
    val flat = "m" * 100 // collides with both at hamming 32 > 16: no edge
    val other = "b" * 16 + "y" * 16 + "b" * 16 + "y" * 16 // no collision
    val got = MultimodalOps.ahashClustersOn(Seq(
      (1L, half), (2L, half), (3L, flat), (4L, other), (5L, "tiny"))
      .toDF("media_id", "txt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // {1,2} cluster under min-id 1 (1 kept, 2 dropped); 3 and 4 are
    // singletons keeping themselves; 5 is under the length gate and
    // has no row at all
    assert(got == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 3L, 1),
      (4L, 4L, 1)))
  }

  test("m08i production band: hamming<=3 merges twins, drops far pairs") {
    val s = spark
    import s.implicits._
    val half = "a" * 32 + "z" * 32 // 1 and 2 pair at hamming 0
    val flat = "m" * 100 // hamming 32 from half: outside EVERY band
    val got = MultimodalOps.ahashClustersOn(
        Seq((1L, half), (2L, half), (3L, flat)).toDF("media_id", "txt"),
        maxHamming = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // exact twins still merge at the production band; flat stays its
    // own singleton exactly as under the wide gate band
    assert(got == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 3L, 1)))
  }

  test("m08i fixture: production band keeps a superset of the gate band") {
    val sf = "/root/testdata/sf0.001"
    def byId(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val gate = byId(MultimodalOps.ahashClusters(spark, sf))
    val prod = byId(MultimodalOps.ahashClustersProduction(spark, sf))
    assert(gate.nonEmpty && gate.keySet == prod.keySet)
    // a tighter band can only split clusters -> every gate keeper is
    // still kept, and the production band never keeps fewer
    gate.foreach { case (id, kept) =>
      if (kept == 1) assert(prod(id) == 1, s"gate keeper $id dropped")
    }
  }
}

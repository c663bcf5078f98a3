package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.search.Knn

/** Real image decode (graft.expr.ImageOps via JDK ImageIO): PNG fixtures
  * are ENCODED in-test (ImageIO writer → bytes), decoded by the
  * expression, and checked against the known raster — no external image
  * files, fully deterministic (PNG is lossless). */
class ImageSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val red = 0xff0000
  private val green = 0x00ff00
  private val blue = 0x0000ff

  test("image_meta decodes width/height and sniffs the format") {
    val rows = Seq(
      (1L, png(8, 6)((_, _) => red)),
      (2L, "definitely not an image".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val m = rows.select($"id", Multimodal.imageMeta($"media").as("meta"))
      .orderBy($"id").collect()
    val ok = m(0).getStruct(1)
    assert(ok.getInt(0) == 8 && ok.getInt(1) == 6)
    assert(ok.getString(2) == "image/png")
    assert(m(1).isNullAt(1), "garbage bytes must decode to NULL, not throw")
    assert(m(2).isNullAt(1), "null payload stays NULL")
  }

  test("image_grid_features: exact mean-RGB cells on a known raster") {
    // left half pure red, right half pure blue; 2x2 grid on an 8x8 image
    // puts cell columns cleanly inside one half each.
    val rows = Seq((1L, png(8, 8)((x, _) => if (x < 4) red else blue)))
      .toDF("id", "media")
    val f = Multimodal.extractImageFeatures(rows, "media", "feat", grid = 2)
      .select($"feat").head().getSeq[Float](0)
    assert(f.length == 12)
    // cells row-major: (0,0)=red, (0,1)=blue, (1,0)=red, (1,1)=blue
    def cell(i: Int) = f.slice(3 * i, 3 * i + 3).toList
    assert(cell(0) == List(1f, 0f, 0f) && cell(2) == List(1f, 0f, 0f))
    assert(cell(1) == List(0f, 0f, 1f) && cell(3) == List(0f, 0f, 1f))
  }

  test("grid binning averages within cells (gradient raster)") {
    // 4x1 image [black, black, white, white], grid 2 -> cells avg 0 and 1
    val rows = Seq((1L, png(4, 1)((x, _) => if (x < 2) 0x000000 else 0xffffff)))
      .toDF("id", "media")
    val f = Multimodal.extractImageFeatures(rows, "media", "feat", grid = 2)
      .select($"feat").head().getSeq[Float](0)
    // 2x2 grid over h=1: both grid rows map to the same pixel row; cell
    // (0,*) gets all pixels, cell (1,*) is empty -> zeros.
    assert(f.slice(0, 3).forall(_ == 0f))   // left cell: black
    assert(f.slice(3, 6).forall(_ == 1f))   // right cell: white
    assert(f.slice(6, 12).forall(_ == 0f))  // empty grid row -> zeros
  }

  test("end-to-end: pack images -> real decode features -> knn neighbors") {
    val media = Seq(
      (1L, png(16, 16)((_, _) => red)),
      (2L, png(16, 16)((x, y) => if ((x + y) % 8 == 0) 0xee0000 else red)),
      (3L, png(16, 16)((_, _) => green)),
      (4L, png(16, 16)((x, y) => if ((x + y) % 8 == 0) 0x00ee00 else green)),
      (5L, png(16, 16)((_, _) => blue))).toDF("doc_id", "media")
    val feats = Multimodal.extractImageFeatures(media, "media", "feat", grid = 4)
      .select($"doc_id", $"feat")
    val nn = Knn.knnJoin(feats, "doc_id", "feat", feats, "doc_id", "feat",
        k = 1, roundScoreTo = Some(6))
      .select($"query_id", $"doc_id".as("nn")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nn(1L) == 2L && nn(2L) == 1L, "near-identical reds pair up")
    assert(nn(3L) == 4L && nn(4L) == 3L, "near-identical greens pair up")
  }

  test("paletted GIF resolves the palette, not the raw index") {
    // GIF encodes through an IndexColorModel: the single-band raster
    // stores palette INDICES, so the grayscale fast path must NOT match
    // (index 0 could map to white). A solid-red GIF must come back as
    // (1, 0, 0), which only happens if getRGB resolves the palette.
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, red)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", out)
    val decoded = ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    assert(decoded.getColorModel.isInstanceOf[java.awt.image.IndexColorModel],
      "fixture must actually be paletted for this regression to bite")
    val rows = Seq((1L, out.toByteArray)).toDF("id", "media")
    val f = Multimodal.extractImageFeatures(rows, "media", "feat", grid = 1)
      .select($"feat").head().getSeq[Float](0)
    assert(f.toList == List(1f, 0f, 0f),
      s"paletted red must decode to (1,0,0) through the palette, got $f")
  }

  test("true grayscale raster still takes the raw-sample path (no ICC shift)") {
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 4; x <- 0 until 4) raster.setSample(x, y, 0, 16)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val rows = Seq((1L, out.toByteArray)).toDF("id", "media")
    val f = Multimodal.extractImageFeatures(rows, "media", "feat", grid = 1)
      .select($"feat").head().getSeq[Float](0)
    // raw sample 16/255, NOT the linear-gray->sRGB ICC value (~71/255)
    assert(f.forall(v => math.abs(v - 16f / 255f) < 1e-6f),
      s"gray sample must be raw (16/255), got $f")
  }

  test("interlaced (Adam7) PNG decodes to the identical raster as baseline PNG") {
    // The PNG reader de-interlaces transparently; pin it so a future
    // reader-cache / input-stream change cannot silently ship progressive
    // scans as half-decoded rasters. Fixture: the same raster encoded
    // twice, MODE_DEFAULT progressive (= Adam7 for PNG) vs sequential.
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) red else blue)
    def encode(progressive: Boolean): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val w = ImageIO.getImageWritersByFormatName("png").next()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        w.setOutput(ios)
        val p = w.getDefaultWriteParam
        p.setProgressiveMode(
          if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
          else javax.imageio.ImageWriteParam.MODE_DISABLED)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { w.dispose(); ios.close() }
      out.toByteArray
    }
    val plain = encode(progressive = false)
    val adam7 = encode(progressive = true)
    assert(!java.util.Arrays.equals(plain, adam7),
      "fixture must actually differ on the wire (interlaced encoding)")
    val rows = Seq((1L, plain), (2L, adam7)).toDF("id", "media")
    val f = Multimodal.extractImageFeatures(rows, "media", "feat", grid = 4)
      .orderBy($"id").select($"feat").collect().map(_.getSeq[Float](0))
    assert(f(0) == f(1), "Adam7 and sequential encodings must yield identical features")
    val meta = rows.select(Multimodal.imageMeta($"media").as("m")).collect()
    assert(meta.forall(r => r.getStruct(0).getInt(0) == 16))
  }

  test("animated GIF: FRAME-0 semantics pinned (decode = first frame, like a thumbnailer)") {
    // media_meta/multimodal_knn treat an image payload as ONE still:
    // metadata reports the container header dims and grid features come
    // from frame 0 only — the universal thumbnailer convention. Frame
    // COUNTS are a video-container concern (mjpeg_frames exposes them);
    // GIF animation is out of image scope BY DESIGN, pinned here so the
    // choice is visible and a silent frame-blend regression would fail.
    def frame(c: Int): BufferedImage = {
      val im = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) im.setRGB(x, y, c)
      im
    }
    val out = new ByteArrayOutputStream()
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      Seq(red, green, blue).foreach { c =>
        w.writeToSequence(new javax.imageio.IIOImage(frame(c), null, null), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    val bytes = out.toByteArray
    // the fixture really is multi-frame
    val r = ImageIO.getImageReadersByFormatName("gif").next()
    val riis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try { r.setInput(riis); assert(r.getNumImages(true) == 3) }
    finally { r.dispose(); riis.close() }
    val rows = Seq((1L, bytes)).toDF("id", "media")
    val f = Multimodal.extractImageFeatures(rows, "media", "feat", grid = 1)
      .select($"feat").head().getSeq[Float](0)
    assert(f.toList == List(1f, 0f, 0f),
      s"animated GIF must decode frame 0 (red), got $f")
    val m = rows.select(Multimodal.imageMeta($"media").as("m")).head().getStruct(0)
    assert(m.getInt(0) == 8 && m.getInt(1) == 8 && m.getString(2) == "image/gif")
  }

  test("SQL registration: image_meta / image_grid_features callable from SQL") {
    graft.functions.registerAll(spark)
    Seq((1L, png(2, 2)((_, _) => red))).toDF("id", "media")
      .createOrReplaceTempView("imgs")
    val r = spark.sql(
      """SELECT image_meta(media).width AS w,
        |       size(image_grid_features(media, 1)) AS n FROM imgs""".stripMargin)
      .head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 3)
  }
}

package graft.expr

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MJPEG frame decode: the hand-encoded solid-gray baseline JPEG must
  * round-trip bit-exactly through the JDK's actual ImageIO decoder (the
  * whole premise of the video_frames oracle), the SOI/EOI splitter must
  * recover exact frame boundaries, and the composed pipeline
  * (synth → split → ImageIO decode → grid features) must reproduce the
  * generating formula. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("solidJpeg decodes via ImageIO to exactly the encoded gray, all pixels") {
    for (g <- 0 to 255 by 17 map (math.min(_, 255))) {
      val img = ImageIO.read(new ByteArrayInputStream(VideoOps.solidJpeg(g, 16)))
      assert(img != null, s"g=$g must decode")
      assert(img.getWidth == 16 && img.getHeight == 16)
      // raw raster samples — getRGB would apply the gray→sRGB ICC curve
      for (x <- 0 until 16; y <- 0 until 16)
        assert(img.getRaster.getSample(x, y, 0) == g,
          s"g=$g pixel ($x,$y) decoded to ${img.getRaster.getSample(x, y, 0)}")
    }
    // and a larger multi-MCU frame (DC-diff-0 path)
    val img = ImageIO.read(new ByteArrayInputStream(VideoOps.solidJpeg(200, 32)))
    assert(img.getWidth == 32 && img.getRaster.getSample(31, 31, 0) == 200)
  }

  test("splitFrames recovers exact frame boundaries from a concatenated stream") {
    val f0 = VideoOps.solidJpeg(50, 16)
    val f1 = VideoOps.solidJpeg(100, 16)
    val f2 = VideoOps.solidJpeg(150, 16)
    val stream = f0 ++ f1 ++ f2
    val got = VideoOps.splitFrames(stream)
    assert(got.numElements() == 3)
    assert(java.util.Arrays.equals(got.getBinary(0), f0))
    assert(java.util.Arrays.equals(got.getBinary(1), f1))
    assert(java.util.Arrays.equals(got.getBinary(2), f2))
    // truncated tail frame is dropped, not emitted broken
    val truncated = stream ++ f0.dropRight(10)
    assert(VideoOps.splitFrames(truncated).numElements() == 3)
    // frameless bytes -> empty, not null
    assert(VideoOps.splitFrames(Array[Byte](1, 2, 3)).numElements() == 0)
    assert(VideoOps.splitFrames(Array.empty[Byte]).numElements() == 0)
  }

  test("APPn payload embedding a whole JPEG (EXIF thumbnail) does not split the frame") {
    // Build a frame whose APP1 segment payload IS a complete smaller JPEG
    // (the EXIF-thumbnail shape): a raw SOI/EOI byte scan would end the
    // outer frame at the thumbnail's EOI and then emit corrupt sub-frames;
    // the segment parser must skip the payload by its declared length.
    val thumb = VideoOps.solidJpeg(10, 8) // carries its own SOI..EOI
    val outer = VideoOps.solidJpeg(77, 16)
    assert(outer(0) == 0xff.toByte && outer(1) == 0xd8.toByte)
    val app1Len = 2 + 6 + thumb.length // length field + "Exif\0\0" + payload
    assert(app1Len <= 0xffff)
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte,
      'E', 'x', 'i', 'f', 0, 0) ++ thumb
    val framed = outer.take(2) ++ app1 ++ outer.drop(2) // APP1 right after SOI
    val second = VideoOps.solidJpeg(150, 16)
    val got = VideoOps.splitFrames(framed ++ second)
    assert(got.numElements() == 2,
      s"expected 2 frames (thumbnail must not split), got ${got.numElements()}")
    assert(java.util.Arrays.equals(got.getBinary(0), framed))
    assert(java.util.Arrays.equals(got.getBinary(1), second))
    // and the APP1-carrying frame still decodes to its own gray
    val img = ImageIO.read(new ByteArrayInputStream(got.getBinary(0)))
    assert(img.getRaster.getSample(5, 5, 0) == 77)
  }

  test("synthMjpeg frame f decodes to frameGray(seed, f) — the oracle formula") {
    for (seed <- Seq(0L, 1L, 7L, 123456789L, -5L)) {
      val frames = VideoOps.splitFrames(VideoOps.synthMjpeg(seed, 4, 16))
      assert(frames.numElements() == 4)
      for (f <- 0 until 4) {
        val img = ImageIO.read(new ByteArrayInputStream(frames.getBinary(f)))
        val expect = VideoOps.frameGray(seed, f)
        assert(img.getRaster.getSample(3, 5, 0) == expect, s"seed=$seed f=$f")
        assert(img.getRaster.getSample(15, 15, 0) == expect)
      }
    }
  }

  test("composed pipeline: grid features of each frame equal g/255 exactly") {
    val df = Seq((1L, 2), (2L, 3), (42L, 1)).toDF("seed", "k")
      .select($"seed", graft.functions.synth_mjpeg($"seed", $"k", lit(16)).as("media"))
    val rows = df.select($"seed",
        posexplode(graft.functions.mjpeg_frames($"media")).as(Seq("f", "frame")))
      .select($"seed", $"f",
        graft.functions.image_grid_features($"frame", 2).as("feat"))
      .collect()
    assert(rows.length == 2 + 3 + 1)
    rows.foreach { r =>
      val g = VideoOps.frameGray(r.getLong(0), r.getInt(1))
      val feat = r.getSeq[Float](2)
      assert(feat.length == 12)
      assert(feat.forall(_ == (g / 255.0).toFloat),
        s"seed=${r.getLong(0)} f=${r.getInt(1)} g=$g feat=${feat.take(3)}")
    }
  }

  test("null/garbage handling via the expressions") {
    val df = Seq((1L, Some(Array[Byte](9, 9, 9))), (2L, None))
      .toDF("id", "media")
    val got = df.select($"id", graft.functions.mjpeg_frames($"media").as("fs"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Array[Byte]](1)))
      .toMap
    assert(got(1L) != null && got(1L).isEmpty, "frameless bytes -> empty array")
    assert(got(2L) == null, "null payload -> null")
  }
}

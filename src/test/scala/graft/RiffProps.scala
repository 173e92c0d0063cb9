package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.{Gen, Prop, Properties}

import graft.ops.{Multimodal, Riff}

/**
 * Property-based round trip for the native AVI container support: for ANY
 * geometry (including odd widths whose BGR rows need padding, 1-pixel
 * edges) and ANY frame pixels, write → parse → decode must reproduce the
 * exact pixels, geometry, and frame count. A binary format with manual
 * stride/offset arithmetic is exactly where a fixed example suite misses
 * the off-by-one that random shapes find.
 */
object RiffProps extends Properties("Riff") {

  private val aviGen = for {
    w <- Gen.chooseNum(1, 17)
    h <- Gen.chooseNum(1, 13)
    fps <- Gen.chooseNum(1, 60)
    nFrames <- Gen.chooseNum(1, 5)
    seeds <- Gen.listOfN(nFrames, Gen.chooseNum(0, Int.MaxValue / 2))
  } yield (w, h, fps, seeds.map { s =>
    Array.tabulate(w * h)(i => 0xFF000000 |
      (((i * 31 + s) % 256) << 16) | (((i * 17 + s * 3) % 256) << 8) |
      ((i * 7 + s * 5) % 256))
  })

  property("write -> parse -> decode reproduces geometry and exact pixels") =
    Prop.forAll(aviGen) { case (w, h, fps, frames) =>
      val bytes = Riff.writeUncompressedAvi(w, h, fps, frames)
      val avi = Riff.parseAvi(bytes, Multimodal.maxFramePixels)
      val geomOk = avi.width == w && avi.height == h &&
        avi.nFrames == frames.size && avi.fps == fps.toDouble
      val pixelsOk = frames.indices.forall { f =>
        Riff.decodeFrame(avi, f, Multimodal.maxFramePixels).argb.sameElements(frames(f))
      }
      (Prop(geomOk) :| s"geometry: got ${avi.width}x${avi.height} " +
        s"frames=${avi.nFrames} fps=${avi.fps}, want ${w}x$h ${frames.size} $fps") &&
        (Prop(pixelsOk) :| "pixel round trip")
    }

  property("a final odd-size chunk may omit its trailing pad byte") =
    Prop.forAll(Gen.chooseNum(0, 49)) { k =>
      val oddLen = 2 * k + 1
      val body = Array.tabulate(oddLen)(i => (i * 7).toByte)
      val full = Riff.writeAvi(4, 3, 10, "MJPG", Seq(("dc", body)))
      // Strip the final pad byte the writer emitted and fix up the sizes a
      // pad-omitting writer would have produced (RIFF form + movi LIST) —
      // word-aligned chunk sizes never include their own pad, so only the
      // two enclosing lengths shrink.
      val bytes = full.dropRight(1)
      def shrink(at: Int): Unit = {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(at, bb.getInt(at) - 1)
      }
      shrink(4) // RIFF form size
      val moviKind = Iterator.range(0, bytes.length - 4).find(i =>
        bytes(i) == 'm' && bytes(i + 1) == 'o' &&
          bytes(i + 2) == 'v' && bytes(i + 3) == 'i').get
      shrink(moviKind - 4) // movi LIST size
      val avi = Riff.parseAvi(bytes, Multimodal.maxFramePixels)
      (Prop(avi.nFrames == 1) :| s"frame count ${avi.nFrames}") &&
        (Prop(avi.frameChunks.head._2.sameElements(body)) :| "frame bytes intact")
    }

  property("truncated containers fail loudly, never decode garbage") =
    Prop.forAll(aviGen, Gen.chooseNum(1, 99)) { case ((w, h, fps, frames), pct) =>
      val bytes = Riff.writeUncompressedAvi(w, h, fps, frames)
      val cut = bytes.take(math.max(4, bytes.length * pct / 100))
      val r = scala.util.Try {
        val avi = Riff.parseAvi(cut, Multimodal.maxFramePixels)
        frames.indices.take(avi.nFrames)
          .foreach(f => Riff.decodeFrame(avi, f, Multimodal.maxFramePixels))
        avi
      }
      // Either the parse/decode throws (expected for most cuts), or the cut
      // happened to land on a chunk boundary and a PREFIX of the frames
      // decodes — in which case every decoded frame must still be exact.
      r.failed.isSuccess || {
        val avi = r.get
        avi.width == w && avi.height == h && avi.nFrames <= frames.size &&
          (0 until avi.nFrames).forall(f =>
            Riff.decodeFrame(avi, f, Multimodal.maxFramePixels).argb
              .sameElements(frames(f)))
      }
    }
}

package graft.sinks

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure renderer kernels added with the
  * plot/docx backends — same pattern as `graft.ops` KernelProps:
  * every driver-side kernel is pinned against an independent
  * formulation of its contract.
  */
object PlotRenderProps extends Properties("PlotRender") {

  private val range: Gen[(Double, Double)] = for {
    lo <- Gen.choose(-1e6, 1e6)
    span <- Gen.choose(1e-3, 1e6)
  } yield (lo, lo + span)

  property("ticks lie inside the range, strictly increase, sane count") =
    Prop.forAll(range) { case (lo, hi) =>
      val ts = PlotRender.ticks(lo, hi)
      val eps = (hi - lo) * 1e-6
      ts.nonEmpty &&
      ts.forall(t => t >= lo - eps && t <= hi + eps) &&
      ts.sliding(2).forall { case Seq(a, b) => b > a; case _ => true } &&
      ts.size >= 1 && ts.size <= 12
    }

  property("tick step is from the 1/2/5 decade ladder") =
    Prop.forAll(range) { case (lo, hi) =>
      val ts = PlotRender.ticks(lo, hi)
      ts.size < 2 || {
        val step = ts(1) - ts.head
        val mant = step / math.pow(10, math.floor(math.log10(step)))
        Seq(1.0, 2.0, 5.0, 10.0).exists(m => math.abs(mant - m) < 1e-6)
      }
    }

  property("colors: n distinct well-formed colors for every tier") =
    Prop.forAll(Gen.choose(1, 40)) { n =>
      val cs = PlotRender.colors(n)
      cs.size == n && cs.distinct.size == n &&
      cs.forall(_.matches("#[0-9a-f]{6}"))
    }
}

object DocxProps extends Properties("DocxRenderer") {

  private val cell: Gen[(Int, Int)] =
    for { r <- Gen.choose(0, 5); c <- Gen.choose(0, 5) } yield (r, c)
  private val groups: Gen[List[List[(Int, Int)]]] =
    Gen.resize(6, Gen.listOf(Gen.resize(4, Gen.nonEmptyListOf(cell))))

  property("mergeRects: in bounds, pairwise disjoint, bounding some input group") =
    Prop.forAll(groups) { gs =>
      val rects = DocxRenderer.mergeRects(gs, nRows = 6, nCols = 6)
      val inBounds = rects.forall { case (r0, c0, r1, c1) =>
        r0 >= 0 && c0 >= 0 && r1 < 6 && c1 < 6 && r0 <= r1 && c0 <= c1 }
      val disjoint = rects.combinations(2).forall {
        case Seq((ar0, ac0, ar1, ac1), (br0, bc0, br1, bc1)) =>
          ar1 < br0 || br1 < ar0 || ac1 < bc0 || bc1 < ac0
        case _ => true
      }
      val fromInput = rects.forall { case (r0, c0, r1, c1) =>
        gs.exists(g => g.nonEmpty &&
          g.map(_._1).min == r0 && g.map(_._2).min == c0 &&
          g.map(_._1).max == r1 && g.map(_._2).max == c1)
      }
      val noSingletons = rects.forall { case (r0, c0, r1, c1) =>
        r0 != r1 || c0 != c1 }
      inBounds && disjoint && fromInput && noSingletons
    }

  property("pngDims inverts ImageIO encoding; rejects prefixed junk") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 64)) { (w, h) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      DocxRenderer.pngDims(bytes).contains((w, h)) &&
      DocxRenderer.pngDims('x'.toByte +: bytes).isEmpty
    }
}

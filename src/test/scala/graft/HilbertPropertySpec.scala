package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spatial.HilbertCurve2D

/** Property tests for the Hilbert curve (reference semantics F3). */
class HilbertPropertySpec extends AnyFunSuite {

  test("xy2d is a bijection on small grids") {
    (1 to 6).foreach { order =>
      val n = 1 << order
      val ds = for { x <- 0 until n; y <- 0 until n }
        yield HilbertCurve2D.xy2d(order, x, y)
      assert(ds.toSet.size == n * n, s"order $order not bijective")
      assert(ds.min == 0L && ds.max == n.toLong * n - 1)
    }
  }

  test("adjacent curve positions are adjacent grid cells (locality)") {
    val order = 6
    val n = 1 << order
    val byD = (for { x <- 0 until n; y <- 0 until n }
      yield HilbertCurve2D.xy2d(order, x, y) -> ((x, y))).toMap
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("index maps bounds corners and center consistently") {
    val r = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val res = 2 + r.nextInt(10)
      val x = r.nextDouble() * 360 - 180
      val y = r.nextDouble() * 180 - 90
      val idx = HilbertCurve2D.index(res, -180, -90, 180, 90)(x, y)
      assert(idx.isDefined)
      val cells = 1L << res
      assert(idx.get >= 0 && idx.get < cells * cells)
    }
  }
}

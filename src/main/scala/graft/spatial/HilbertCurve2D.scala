package graft.spatial

/** 2-D Hilbert curve index, re-expressed from the reference's semantics
  * (`api/src/main/java/org/apache/iceberg/util/havasu/HilbertCurve2D.java:51-117`
  * in /root/reference): a geometry maps to the Hilbert index of its envelope
  * center on a 2^res × 2^res grid over user-supplied bounds; coordinates
  * outside the bounds (or empty geometries) map to null/None.
  *
  * The curve math itself is the standard iterative rotate-and-accumulate
  * construction (public domain, e.g. Wikipedia "Hilbert curve"), not a copy
  * of the reference's uzaygezen CompactHilbertCurve — any true Hilbert curve
  * provides the locality property the reference tests
  * (`TestHilbert.java:61-84`).
  */
object HilbertCurve2D {

  /** Max resolution such that the index (2*res bits) fits a Long. */
  val MaxResolution = 31

  /** Map grid cell (x, y) on a 2^order grid to its Hilbert distance. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    require(order >= 1 && order <= MaxResolution, s"resolution $order out of [1,$MaxResolution]")
    var x = xIn
    var y = yIn
    var d = 0L
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Index of a point in world coordinates; None if outside the bounds.
    * Matches the reference's scaling: (2^res - 1) cells across the extent,
    * out-of-bounds → null (`HilbertCurve2D.java:51-117`, `Hilbert.java:86-97`).
    */
  def index(res: Int, minX: Double, minY: Double, maxX: Double, maxY: Double)(
      cx: Double, cy: Double): Option[Long] = {
    if (cx.isNaN || cy.isNaN || cx < minX || cx > maxX || cy < minY || cy > maxY) None
    else {
      val cells = (1L << res) - 1
      // COLLAPSED bounds (minX == maxX / minY == maxY, e.g. data on one
      // meridian): the division is 0/0 = NaN and math.round(NaN) = 0 —
      // which HAPPENS to be the right cell, but only by accident of the
      // rounding; make the well-defined 1-D ordering explicit instead
      val gx = if (maxX > minX) math.round((cx - minX) / (maxX - minX) * cells) else 0L
      val gy = if (maxY > minY) math.round((cy - minY) / (maxY - minY) * cells) else 0L
      Some(xy2d(res, gx, gy))
    }
  }
}

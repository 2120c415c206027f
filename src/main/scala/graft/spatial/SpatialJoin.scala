package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoSql

/** Distributed spatial join (the capability the reference delegates to
  * Sedona's RangeJoin strategy — `README.md:26-28` in /root/reference names
  * the external connector; SURVEY.md §2.5).
  *
  * Shape: each geometry is assigned to every fixed-size grid cell its bbox
  * covers (map-side explode), the two sides meet in an equi-join on the
  * cell id — a plain shuffle join Catalyst already knows how to plan — and
  * pairs are de-duplicated *without* a distinct by keeping only the cell
  * that contains the reference corner of the bbox intersection. An exact
  * JTS `st_intersects` refines candidates.
  *
  * At 100 TB: no cross product, no broadcast requirement; the shuffle key
  * (cell id) has data-independent cardinality controlled by `cellDeg`, and
  * skewed cells (urban areas) are exactly what AQE skew-join splitting
  * handles. Both inputs stay fully columnar until the JTS refine.
  */
object SpatialJoin {

  /** Cells covered by a bbox, as an array of (cx, cy) structs — structs
    * rather than a packed long so arbitrary coordinate ranges can't collide.
    */
  private def cells(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      cellDeg: Double): Column = {
    val cxs = sequence(floor(xmin / cellDeg).cast("long"), floor(xmax / cellDeg).cast("long"))
    val cys = sequence(floor(ymin / cellDeg).cast("long"), floor(ymax / cellDeg).cast("long"))
    flatten(transform(cxs, cx => transform(cys, cy =>
      struct(cx.as("cx"), cy.as("cy")))))
  }

  private def refCell(axmin: Column, aymin: Column, bxmin: Column, bymin: Column,
      cellDeg: Double): Column =
    struct(
      floor(greatest(axmin, bxmin) / cellDeg).cast("long").as("cx"),
      floor(greatest(aymin, bymin) / cellDeg).cast("long").as("cy"))

  /** Inner join of `left` and `right` on `ST_Intersects(lCol, rCol)`.
    * Output columns: all of left's then all of right's (caller ensures
    * distinct names). `cellDeg` is the grid pitch in coordinate units.
    */
  def intersects(left: DataFrame, lCol: String, right: DataFrame, rCol: String,
      cellDeg: Double = 1.0): DataFrame = {
    // a non-positive/NaN pitch is a configuration error: floor(x / 0) =
    // ±Infinity clamps to ±Long.MaxValue and sequence() fails deep inside
    // codegen with an opaque too-long-sequence error
    require(cellDeg > 0 && !cellDeg.isNaN && !cellDeg.isInfinite,
      s"cellDeg must be a positive finite grid pitch, got $cellDeg")
    val spark = left.sparkSession
    GeoSql.install(spark)

    def prepared(df: DataFrame, g: String, side: String): DataFrame = {
      val bb = GeoSql.st_bbox(col(g))
      df.withColumn(s"__${side}_bbox", bb)
        .withColumn(s"__${side}_cell", explode(cells(
          col(s"__${side}_bbox.xmin"), col(s"__${side}_bbox.ymin"),
          col(s"__${side}_bbox.xmax"), col(s"__${side}_bbox.ymax"), cellDeg)))
    }

    val l = prepared(left, lCol, "l")
    val r = prepared(right, rCol, "r")
    val joined = l.join(r, col("__l_cell") === col("__r_cell"))
      // de-dup: keep the single cell holding the bbox-intersection corner
      .filter(col("__l_cell") === refCell(
        col("__l_bbox.xmin"), col("__l_bbox.ymin"),
        col("__r_bbox.xmin"), col("__r_bbox.ymin"), cellDeg))
      // exact refinement
      .filter(GeoSql.st_intersects(col(lCol), col(rCol)))
    joined.drop("__l_bbox", "__l_cell", "__r_bbox", "__r_cell")
  }
}

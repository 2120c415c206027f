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

  // internal columns carry the __graft_spj_ marker prefix SHARED with
  // SpatialJoinRewrite's generated attributes: when a later optimizer
  // batch folds the refine Filter back into the equi-join condition, the
  // rewrite rule's reference guard must recognize this construction as
  // its own machinery and decline to re-explode it (a -1 broadcast
  // threshold disables the tiny-side gate, so the guard is the only thing
  // standing between an API-built join and a double explode — caught by
  // the SpatialJoinSpec AQE-skew fixture)

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
      df.withColumn(s"__graft_spj_${side}bbox", bb)
        .withColumn(s"__graft_spj_${side}cell", explode(cells(
          col(s"__graft_spj_${side}bbox.xmin"), col(s"__graft_spj_${side}bbox.ymin"),
          col(s"__graft_spj_${side}bbox.xmax"), col(s"__graft_spj_${side}bbox.ymax"), cellDeg)))
    }

    val l = prepared(left, lCol, "l")
    val r = prepared(right, rCol, "r")
    val joined = l.join(r, col("__graft_spj_lcell") === col("__graft_spj_rcell"))
      // de-dup: keep the single cell holding the bbox-intersection corner
      .filter(col("__graft_spj_lcell") === refCell(
        col("__graft_spj_lbbox.xmin"), col("__graft_spj_lbbox.ymin"),
        col("__graft_spj_rbbox.xmin"), col("__graft_spj_rbbox.ymin"), cellDeg))
      // exact refinement
      .filter(GeoSql.st_intersects(col(lCol), col(rCol)))
    joined.drop("__graft_spj_lbbox", "__graft_spj_lcell", "__graft_spj_rbbox", "__graft_spj_rcell")
  }

  /** Inner DISTANCE join: pairs with `ST_DWithin(lCol, rCol, dist)` —
    * the Sedona distance-join capability the reference delegates
    * alongside RangeJoin. Same PBSM construction as [[intersects]] with
    * the LEFT side's bboxes expanded by `dist` before cell assignment: a
    * pair within euclidean distance d has per-axis displacement at most
    * d, so the right bbox intersects the left's d-expanded bbox and the
    * pair meets in the expanded-intersection's reference-corner cell —
    * found exactly once, refined by the exact JTS kernel. Expansion on
    * ONE side only (duplicating both sides would double the candidate
    * surface for nothing).
    */
  def dwithin(left: DataFrame, lCol: String, right: DataFrame, rCol: String,
      dist: Double, cellDeg: Double = 1.0): DataFrame = {
    require(dist >= 0 && !dist.isNaN && !dist.isInfinite,
      s"dist must be a nonnegative finite distance, got $dist")
    require(cellDeg > 0 && !cellDeg.isNaN && !cellDeg.isInfinite,
      s"cellDeg must be a positive finite grid pitch, got $cellDeg")
    val spark = left.sparkSession
    GeoSql.install(spark)
    val l = left.withColumn("__graft_spj_lbbox", GeoSql.st_bbox(col(lCol)))
      .withColumn("__graft_spj_lcell", explode(cells(
        col("__graft_spj_lbbox.xmin") - dist, col("__graft_spj_lbbox.ymin") - dist,
        col("__graft_spj_lbbox.xmax") + dist, col("__graft_spj_lbbox.ymax") + dist, cellDeg)))
    val r = right.withColumn("__graft_spj_rbbox", GeoSql.st_bbox(col(rCol)))
      .withColumn("__graft_spj_rcell", explode(cells(
        col("__graft_spj_rbbox.xmin"), col("__graft_spj_rbbox.ymin"),
        col("__graft_spj_rbbox.xmax"), col("__graft_spj_rbbox.ymax"), cellDeg)))
    l.join(r, col("__graft_spj_lcell") === col("__graft_spj_rcell"))
      .filter(col("__graft_spj_lcell") === refCell(
        col("__graft_spj_lbbox.xmin") - dist, col("__graft_spj_lbbox.ymin") - dist,
        col("__graft_spj_rbbox.xmin"), col("__graft_spj_rbbox.ymin"), cellDeg))
      .filter(GeoSql.st_dwithin(col(lCol), col(rCol), lit(dist)))
      .drop("__graft_spj_lbbox", "__graft_spj_lcell", "__graft_spj_rbbox", "__graft_spj_rcell")
  }

  // ---- grid-MATERIALIZED face: the storage-partitioned spatial join ------
  //
  // intersects() above shuffles BOTH sides on the cell id every join. When
  // the same tables join spatially again and again (the production shape:
  // a fact geometry table vs a slowly-changing region table), the explode
  // can move into STORAGE: each row is written once per covered grid cell,
  // identity-partitioned by (cell_x, cell_y). Two such CO-GRIDDED graft
  // catalog tables then meet in a plain equi-join on the stored cell
  // columns, which the scan's KeyGroupedPartitioning report turns into a
  // storage-partitioned join — ZERO exchanges, the shuffle that dominates
  // a 100 TB spatial fact-fact join gone. Beyond the reference: its SPJ
  // assist is equi-key only (`SparkPartitioningAwareScan.java` in
  // /root/reference), and its spatial joins delegate to Sedona's shuffled
  // RangeJoin. Same exactness proof as intersects(): two intersecting
  // geometries' bboxes share the intersection reference corner, whose cell
  // BOTH sides stored — pair found, exactly once after the ref-cell dedup.

  /** Explode `df` for grid-materialized storage: one output row per grid
    * cell covered by the geometry's bbox, with the cell as identity
    * columns `cell_x`, `cell_y` (BIGINT). Write the result to a graft
    * table `PARTITIONED BY (cell_x, cell_y)`; both join sides must use
    * the SAME `cellDeg`.
    *
    * `expand` materializes the cell cover of the bbox EXPANDED by that
    * many coordinate units on every side — the storage face of the
    * distance join: [[dwithinGridded]] can then serve any `dist` with
    * `expandL + expandR >= dist` without re-shuffling either side.
    */
  def gridded(df: DataFrame, geomCol: String, cellDeg: Double,
      expand: Double = 0.0): DataFrame = {
    require(cellDeg > 0 && !cellDeg.isNaN && !cellDeg.isInfinite,
      s"cellDeg must be a positive finite grid pitch, got $cellDeg")
    require(expand >= 0 && !expand.isNaN && !expand.isInfinite,
      s"expand must be a nonnegative finite distance, got $expand")
    GeoSql.install(df.sparkSession)
    // the pitch AND the declared expansion ride BOTH cell columns'
    // METADATA (persisted through the graft manifest's schema JSON and
    // parquet footer schemas): a join of two grids materialized at
    // DIFFERENT pitches would silently miss pairs, and a distance join
    // beyond the declared expansion would too, so the gridded joins
    // validate the stamps UNCONDITIONALLY
    val stamp = new org.apache.spark.sql.types.MetadataBuilder()
      .putDouble(PitchKey, cellDeg).putDouble(ExpandKey, expand).build()
    df.withColumn("__bb", GeoSql.st_bbox(col(geomCol)))
      .withColumn("__cell", explode(cells(
        col("__bb.xmin") - expand, col("__bb.ymin") - expand,
        col("__bb.xmax") + expand, col("__bb.ymax") + expand, cellDeg)))
      .withColumn("cell_x", col("__cell.cx").as("cell_x", stamp))
      .withColumn("cell_y", col("__cell.cy").as("cell_y", stamp))
      .drop("__bb", "__cell")
  }

  private val PitchKey = "graft.grid.cell-deg"
  private val ExpandKey = "graft.grid.expand"

  /** Declared grid stamp (pitch / expansion) of a grid-materialized
    * frame. Resolution order: the cell columns' metadata stamp (survives
    * column-preserving transformations), then the SOURCE table's
    * persisted schema, found by walking the plan to its DSv2 relations —
    * a projection that re-derived `cell_x` through an expression drops
    * attribute metadata, but the catalog table the frame reads from still
    * declares the stamp in the manifest-persisted schema JSON. None only
    * when neither channel knows.
    */
  private def declaredStamp(df: DataFrame, key: String): Option[Double] = {
    def ofMeta(m: org.apache.spark.sql.types.Metadata): Option[Double] =
      if (m.contains(key)) Some(m.getDouble(key)) else None
    // cell_x and cell_y must AGREE: a frame assembled from two different
    // grid materializations (cell_x selected off one, cell_y off another,
    // or a union of differently-expanded grids) carries cells that satisfy
    // neither grid's cover/dedup argument — serving headOption would
    // silently miss pairs (r18 review)
    def uniq(vs: Seq[Double], src: String): Option[Double] = {
      require(vs.distinct.size <= 1,
        s"grid stamps disagree on $key across cell columns ($src): " +
          s"${vs.distinct.mkString(" vs ")} — this frame mixes columns from " +
          "different grid materializations; re-grid it with SpatialJoin.gridded")
      vs.headOption
    }
    val fromCols = Seq("cell_x", "cell_y")
      .filter(df.columns.contains).flatMap(c => ofMeta(df.schema(c).metadata))
    uniq(fromCols, "column metadata").orElse {
      uniq(df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          Seq("cell_x", "cell_y").flatMap(c => r.output.find(_.name == c)
            .flatMap(a => ofMeta(a.metadata)))
      }.flatten, "source table schemas")
    }
  }

  private def declaredPitch(df: DataFrame): Option[Double] =
    declaredStamp(df, PitchKey)

  /** Validate a gridded side's shape + pitch; returns its declared
    * expansion (pre-expansion r16 grids carry no expand stamp = 0.0).
    */
  private def validateGridded(df: DataFrame, side: String,
      cellDeg: Double): Double = {
    require(Seq("cell_x", "cell_y").forall(df.columns.contains),
      s"$side side is not grid-materialized: expected cell_x/cell_y " +
        "(write it with SpatialJoin.gridded)")
    // UNCONDITIONAL: a frame whose pitch cannot be established refuses —
    // a silent same-`cellDeg` contract is exactly the failure this
    // stamp exists to catch (misaligned grids miss pairs, no error)
    val p = declaredPitch(df).getOrElse(throw new IllegalArgumentException(
      s"$side side carries no grid-pitch stamp on cell_x/cell_y and none " +
        "is recoverable from its source tables — re-grid it with " +
        "SpatialJoin.gridded, or read the co-gridded catalog table directly"))
    require(p == cellDeg,
      s"$side side was grid-materialized at pitch $p but the join asked " +
        s"for $cellDeg — misaligned grids silently miss pairs")
    declaredStamp(df, ExpandKey).getOrElse(0.0)
  }

  /** Inner `ST_Intersects` join of two GRID-MATERIALIZED frames (both
    * carrying `cell_x`/`cell_y` from [[gridded]] at the same `cellDeg`,
    * e.g. reads of two co-gridded catalog tables). The equi-join keys are
    * exactly the stored identity partition columns, so co-partitioned
    * DSv2 scans plan it storage-partitioned (no exchange). Output: all of
    * left's then right's columns, grid columns dropped; pairs are exact
    * and deduplicated like [[intersects]].
    */
  def intersectsGridded(left: DataFrame, lCol: String,
      right: DataFrame, rCol: String, cellDeg: Double): DataFrame = {
    require(cellDeg > 0 && !cellDeg.isNaN && !cellDeg.isInfinite,
      s"cellDeg must be a positive finite grid pitch, got $cellDeg")
    validateGridded(left, "left", cellDeg)
    validateGridded(right, "right", cellDeg)
    // expanded grids (materialized once for the distance join) are still
    // exact here: the unexpanded bbox-intersection corner cell is covered
    // by the expanded cover too, so the pair is found, exactly once
    GeoSql.install(left.sparkSession)
    val l = left.withColumn("__graft_spj_lbbox", GeoSql.st_bbox(col(lCol)))
    val r = right.withColumn("__graft_spj_rbbox", GeoSql.st_bbox(col(rCol)))
    l.join(r, Seq("cell_x", "cell_y"))
      // de-dup: keep the single cell holding the bbox-intersection corner
      .filter(col("cell_x") === floor(greatest(
          col("__graft_spj_lbbox.xmin"), col("__graft_spj_rbbox.xmin")) / cellDeg).cast("long") &&
        col("cell_y") === floor(greatest(
          col("__graft_spj_lbbox.ymin"), col("__graft_spj_rbbox.ymin")) / cellDeg).cast("long"))
      // exact refinement
      .filter(GeoSql.st_intersects(col(lCol), col(rCol)))
      .drop("__graft_spj_lbbox", "__graft_spj_rbbox", "cell_x", "cell_y")
  }

  /** Inner `ST_DWithin` join of two GRID-MATERIALIZED frames — the
    * storage-partitioned face of [[dwithin]]: the PBSM explode (with the
    * d-expansion) moved into storage at [[gridded]] time, so the join is
    * a plain equi-join on the stored identity partition columns that
    * co-partitioned DSv2 scans plan WITHOUT an exchange.
    *
    * Exactness: a pair within euclidean `dist` has per-axis displacement
    * at most `dist`, so with declared expansions `eL + eR >= dist` the
    * two expanded bboxes intersect; both sides stored every cell of
    * their expanded cover, hence both stored the expanded-intersection's
    * reference-corner cell — the pair meets there, exactly once after
    * the corner dedup, and the exact JTS kernel refines. A `dist` above
    * the declared expansion budget refuses loudly (the pitch-stamp
    * posture): serving it would silently miss pairs.
    */
  def dwithinGridded(left: DataFrame, lCol: String,
      right: DataFrame, rCol: String, dist: Double, cellDeg: Double): DataFrame = {
    require(dist >= 0 && !dist.isNaN && !dist.isInfinite,
      s"dist must be a nonnegative finite distance, got $dist")
    require(cellDeg > 0 && !cellDeg.isNaN && !cellDeg.isInfinite,
      s"cellDeg must be a positive finite grid pitch, got $cellDeg")
    val eL = validateGridded(left, "left", cellDeg)
    val eR = validateGridded(right, "right", cellDeg)
    require(eL + eR >= dist,
      s"the declared grid expansions ($eL left + $eR right) do not cover " +
        s"dist=$dist — pairs farther than the materialized expansion never " +
        "meet in a stored cell; re-grid a side with " +
        s"SpatialJoin.gridded(..., expand >= ${dist - math.min(eL, eR)})")
    GeoSql.install(left.sparkSession)
    val l = left.withColumn("__graft_spj_lbbox", GeoSql.st_bbox(col(lCol)))
    val r = right.withColumn("__graft_spj_rbbox", GeoSql.st_bbox(col(rCol)))
    l.join(r, Seq("cell_x", "cell_y"))
      // de-dup: the single cell holding the EXPANDED-intersection corner
      .filter(col("cell_x") === floor(greatest(
          col("__graft_spj_lbbox.xmin") - eL, col("__graft_spj_rbbox.xmin") - eR) / cellDeg)
          .cast("long") &&
        col("cell_y") === floor(greatest(
          col("__graft_spj_lbbox.ymin") - eL, col("__graft_spj_rbbox.ymin") - eR) / cellDeg)
          .cast("long"))
      // exact refinement
      .filter(GeoSql.st_dwithin(col(lCol), col(rCol), lit(dist)))
      .drop("__graft_spj_lbbox", "__graft_spj_rbbox", "cell_x", "cell_y")
  }
}

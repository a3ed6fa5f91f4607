package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial near-join on planar coordinates — all pairs within `radius`,
  * the geo companion to the engine's other candidate-generation joins
  * (LSH bands, interval tiles, barcode slices): bucket the plane into a
  * radius-sized grid, equi-join cell keys, verify exactly. Works on any
  * projected (x, y) — for geographic data project first (the reference
  * geocodes to planar tracts the same way); trig-based haversine is
  * deliberately NOT used in the exact filter because sin/cos are not
  * correctly-rounded across engines, while the squared-distance chain
  * (sub, mul, add, compare) is.
  */
object SpatialJoin {

  /** Pairs (id_a < id_b) with squared distance <= radius². One side
    * explodes its 3×3 neighbor cells, the other keeps its home cell, so
    * every qualifying pair meets on exactly one (cell) key — an
    * equi-join with bounded fan-out 9, never a cross join; candidate
    * volume is governed by points-per-cell (cell edge = radius), the
    * standard grid-join density argument. Exact verify:
    * (dx·dx + dy·dy) <= radius·radius on doubles — a fixed chain of
    * correctly-rounded IEEE ops, engine-identical.
    *
    * Input: (idCol, xCol, yCol). Output: id_a, id_b, dist2.
    */
  def radiusJoin(
      pts: DataFrame, idCol: String, xCol: String, yCol: String,
      radius: Double): DataFrame = {
    require(radius > 0, "radius must be positive")
    val cellX = floor(col(xCol) / radius).cast("long")
    val cellY = floor(col(yCol) / radius).cast("long")
    val probe = pts.select(col(idCol).as("id_a"),
        col(xCol).as("_xa"), col(yCol).as("_ya"),
        cellX.as("_cx"), cellY.as("_cy"))
      .withColumn("_dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_a"), col("_xa"), col("_ya"),
        (col("_cx") + col("_dx")).as("_cx"),
        (col("_cy") + col("_dy")).as("_cy"))
    val build = pts.select(col(idCol).as("id_b"),
      col(xCol).as("_xb"), col(yCol).as("_yb"),
      cellX.as("_cx"), cellY.as("_cy"))
    val dx = col("_xa") - col("_xb")
    val dy = col("_ya") - col("_yb")
    probe.hint("shuffle_hash").join(build, Seq("_cx", "_cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= radius * radius)
      .select("id_a", "id_b", "dist2")
  }
}

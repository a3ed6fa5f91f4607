package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Dedup.bind

/** Minimal geometry predicates (SURVEY §2.6 C17) — the reference needs
  * only point-in-polygon containment (st_covers check,
  * warehouse/location.sql:33-35) and a default point for a polygon
  * (st_centroid/st_pointonsurface,
  * warehouse/location/triggers/point-default-from-polygon.sql:8-24).
  *
  * Polygons are rings as `array<struct<x:double,y:double>>` (GeoJSON
  * coordinate order, closing point optional). Pure column math — ray
  * casting via `aggregate` over edges — so the predicates run distributed
  * with no UDF and no geometry library dependency.
  */
object Geo {

  /** Ray-casting point-in-polygon (odd crossings ⇒ inside). Boundary
    * behavior follows the classic algorithm (half-open edges), which is
    * the standard tolerance for the reference's sanity-check use.
    */
  def pointInPolygon(x: Column, y: Column, ring: Column): Column =
    bind(ring, r =>
      aggregate(
        sequence(lit(0), size(r) - 2),
        lit(false),
        (acc, i) => {
          val a = element_at(r, i + 1)
          val b = element_at(r, i + 2)
          val ax = a.getField("x"); val ay = a.getField("y")
          val bx = b.getField("x"); val by = b.getField("y")
          val crosses = ((ay > y) =!= (by > y)) &&
            (x < (bx - ax) * (y - ay) / (by - ay) + ax)
          when(crosses, !acc).otherwise(acc)
        }))

  /** Vertex centroid (mean of ring points, closing vertex dropped if it
    * repeats the first) — the "good enough default point" the reference's
    * trigger computes.
    */
  def ringCentroid(ring: Column): Column =
    bind(ring, full =>
      bind(
        when(size(full) > 1 && element_at(full, 1) <=> element_at(full, size(full)),
          slice(full, lit(1), size(full) - 1)).otherwise(full),
        r => struct(
          (aggregate(r, lit(0.0), (acc, p) => acc + p.getField("x")) / size(r)).as("x"),
          (aggregate(r, lit(0.0), (acc, p) => acc + p.getField("y")) / size(r)).as("y"))))

  /** GeoJSON [ [x,y], ... ] ring (array<array<double>>) → typed ring. */
  def ringFromCoords(coords: Column): Column =
    transform(coords, p =>
      struct(element_at(p, 1).as("x"), element_at(p, 2).as("y")))
}

package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial filtering (SURVEY.md J4, reference
  * `ETL.py:149-162`: every station row tested against the single MISO
  * polygon via a per-row geopandas `contains`).
  *
  * Spark-first shape: the polygon is tiny (25 vertices) and broadcast
  * inside a UDF closure; the table side streams through a filter — a
  * semi-join against a broadcast 1-polygon side with no shuffle. The
  * ray-cast is O(vertices) per row.
  */
object Geo {

  /** Closed or open ring of (lon, lat) vertices. */
  type Ring = Array[(Double, Double)]

  /** Even-odd ray casting; boundary points count as inside (matches the
    * reference's `contains`-with-`covers` tolerance for station points
    * sitting on the footprint edge; exact-boundary hits are edge-cased
    * explicitly because the crossing parity is unstable there).
    */
  def pointInPolygon(lon: Double, lat: Double, ring: Ring): Boolean = {
    val n = ring.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring(j)
      // on-vertex / on-horizontal-edge / on-general-edge → inside
      if (xi == lon && yi == lat) return true
      val minX = math.min(xi, xj); val maxX = math.max(xi, xj)
      val minY = math.min(yi, yj); val maxY = math.max(yi, yj)
      if (lat >= minY && lat <= maxY && lon >= minX && lon <= maxX) {
        val cross = (xj - xi) * (lat - yi) - (yj - yi) * (lon - xi)
        if (cross == 0.0) return true
      }
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Column predicate over lon/lat columns — since round 9 a native
    * codegen'd expression ([[graft.functions.PointInPolygon]]): the ring
    * rides the plan as two double-array reference objects (a 25-vertex
    * polygon is bytes, not data) and the predicate stays inside
    * WholeStageCodegen (the SURVEY §4.3 upgrade of the former ScalaUDF,
    * which broke the scan stage with per-row boxing). Null coordinates
    * yield null — same filter behavior as the UDF's false.
    */
  def inPolygon(lonCol: Column, latCol: Column, ring: Ring): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.PointInPolygon(
      Bridge.expression(lonCol.cast("double")),
      Bridge.expression(latCol.cast("double")),
      ring.map(_._1), ring.map(_._2)))
  }

  /** Semi-join form (`stations.filter(inPolygon(...))`, `ETL.py:154`). */
  def filterInPolygon(df: DataFrame, lonCol: String, latCol: String,
                      ring: Ring): DataFrame =
    df.filter(inPolygon(col(lonCol), col(latCol), ring))

  /** Driver-side GeoJSON read (S7, `data/miso.geojson:1`): first Polygon
    * ring of the first feature. Uses the Jackson parser bundled with
    * Spark — the file is a one-polygon artifact, not a data-plane input.
    */
  def readPolygonRing(path: String): Ring = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    val geom =
      if (root.has("features")) root.get("features").get(0).get("geometry")
      else if (root.has("geometry")) root.get("geometry")
      else root
    require(geom != null && geom.get("type").asText() == "Polygon",
      s"expected a Polygon geometry in $path")
    val ring = geom.get("coordinates").get(0)
    (0 until ring.size()).map { i =>
      val pt = ring.get(i)
      (pt.get(0).asDouble(), pt.get(1).asDouble())
    }.toArray
  }
}

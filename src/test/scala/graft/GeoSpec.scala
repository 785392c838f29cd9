package graft

import graft.ops.GeoOps
import org.apache.spark.sql.functions._

/** The geo tier (GeoOps): geo_distance membership and the geohash-4 cell
  * law, each checked against an INDEPENDENT spelling — the distance from
  * first-principles integer arithmetic on the returned coordinates, the
  * geohash against a classic interval-halving reference encoder (the
  * public algorithm, not the production bit-interleave).
  */
class GeoSpec extends SparkSpecBase {
  private val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Reference geohash-4: interval halving in QUARTER-micro-degrees so
    * every midpoint at depth ≤ 10 is an exact integer (360e6·4 and
    * 180e6·4 are both divisible by 2^10) — no float anywhere.
    */
  private def refGeohash4(latUd: Long, lonUd: Long): String = {
    var loLat = -90000000L * 4; var hiLat = 90000000L * 4
    var loLon = -180000000L * 4; var hiLon = 180000000L * 4
    val (lat4, lon4) = (latUd * 4, lonUd * 4)
    val sb = new StringBuilder
    var isLon = true
    var bits = 0; var ch = 0
    while (sb.length < 4) {
      if (isLon) {
        val mid = (loLon + hiLon) / 2
        if (lon4 >= mid) { ch = (ch << 1) | 1; loLon = mid }
        else { ch = ch << 1; hiLon = mid }
      } else {
        val mid = (loLat + hiLat) / 2
        if (lat4 >= mid) { ch = (ch << 1) | 1; loLat = mid }
        else { ch = ch << 1; hiLat = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) { sb.append(B32(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  test("reference encoder pins the public geohash anchors") {
    // geohash.org canon: (0, 0) = s000…, equator/antimeridian corners
    assert(refGeohash4(0L, 0L) === "s000")
    assert(refGeohash4(-90000000L, -180000000L) === "0000") // SW corner
    assert(refGeohash4(90000000L, 180000000L) === "zzzz")   // NE edge (clamped)
  }

  test("geoDistance: dist2 is the exact integer law; every hit inside the radius") {
    val r = 10000000L
    val rows = GeoOps.geoDistance(spark, sf, r).collect()
    assert(rows.nonEmpty, "radius must catch events at this sf")
    val cosK = math.round(math.cos(math.toRadians(40.0)) * (1L << 20))
    rows.foreach { row =>
      val lat = row.getAs[Long]("lat_ud"); val lon = row.getAs[Long]("lon_ud")
      val dlat = lat - 40000000L
      val dx = (math.abs(lon - -74000000L) * cosK) / 1048576L
      assert(row.getAs[Long]("dist2") === dlat * dlat + dx * dx)
      assert(row.getAs[Long]("dist2") <= r * r)
    }
    // complement: no in-radius event is dropped (recompute membership over
    // the full derived-coordinate frame and compare counts)
    val full = Tables.events(spark, sf).select(col("event_id").cast("string").as("e"))
      .select(
        (pmod(conv(substring(md5(col("e")), 1, 15), 16, 10).cast("long"),
          lit(180000001L)) - lit(90000000L)).as("lat_ud"),
        (pmod(conv(substring(md5(concat(col("e"), lit("x"))), 1, 15), 16, 10)
          .cast("long"), lit(360000001L)) - lit(180000000L)).as("lon_ud"))
      .collect().count { row =>
        val dlat = row.getAs[Long]("lat_ud") - 40000000L
        val dx = (math.abs(row.getAs[Long]("lon_ud") - -74000000L) * cosK) / 1048576L
        dlat * dlat + dx * dx <= r * r
      }
    assert(rows.length === full)
  }

  test("geohash cells match the interval-halving reference on every in-radius event") {
    val cells = GeoOps.gridCells(spark, sf, 10000000L).collect()
    assert(cells.nonEmpty)
    cells.foreach { row =>
      assert(row.getAs[String]("geohash") ===
        refGeohash4(row.getAs[Long]("lat_ud"), row.getAs[Long]("lon_ud")),
        s"cell law diverges at (${row.getAs[Long]("lat_ud")}, ${row.getAs[Long]("lon_ud")})")
    }
  }

  test("geoDistanceStored: the stored-coordinate face returns the identical membership set") {
    // same rows, different plan: the stored face reads persisted (lat_ud,
    // lon_ud) columns with the bbox pushed to the scan (PlanSpec pins the
    // PushedFilters); row-for-row equality here proves the store build is
    // a faithful projection of the derivation
    val derived = GeoOps.geoDistance(spark, sf).collect().map(_.toSeq.toList).toSet
    val stored = GeoOps.geoDistanceStored(spark, sf).collect().map(_.toSeq.toList).toSet
    assert(stored === derived)
    assert(stored.nonEmpty)
    // the whole family serves from the same store: grid and bounds too
    val gridD = GeoOps.geoGrid(spark, sf).collect().map(_.toSeq.toList).toSet
    val gridS = GeoOps.geoGridStored(spark, sf).collect().map(_.toSeq.toList).toSet
    assert(gridS === gridD && gridS.nonEmpty)
    val boundsD = GeoOps.geoBounds(spark, sf).collect().map(_.toSeq.toList).toSet
    val boundsS = GeoOps.geoBoundsStored(spark, sf).collect().map(_.toSeq.toList).toSet
    assert(boundsS === boundsD)
  }

  test("geoGrid: bucket counts partition the in-radius events; users bounded") {
    val grid = GeoOps.geoGrid(spark, sf).collect()
    val hits = GeoOps.geoDistance(spark, sf).count()
    assert(grid.map(_.getAs[Long]("n_events")).sum === hits)
    grid.foreach(r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events")))
  }

  test("geoDistanceRings: rings partition the in-radius set; boundary law is from-inclusive on distance") {
    val rings = GeoOps.geoDistanceRings(spark, sf).collect()
    val hits = GeoOps.geoDistance(spark, sf).collect()
    assert(rings.map(_.getAs[Long]("doc_count")).sum === hits.length)
    // independent recomputation of each ring from the raw distances:
    // dist < r ⇔ dist² < r² (integers, non-negative)
    val d2 = hits.map(_.getAs[Long]("dist2"))
    val r1 = 2500000L; val r2 = 5000000L
    val want = Map(
      "*-2500000" -> d2.count(_ < r1 * r1).toLong,
      "2500000-5000000" -> d2.count(x => x >= r1 * r1 && x < r2 * r2).toLong,
      "5000000-*" -> d2.count(_ >= r2 * r2).toLong).filter(_._2 > 0)
    assert(rings.map(r => r.getAs[String]("ring") -> r.getAs[Long]("doc_count"))
      .toMap === want)
    rings.foreach(r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("doc_count")))
  }

  test("geoLine: per-user track ordered by (ts, event_id), truncated at size, complete flag") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val size = 10
    val events = Tables.eventsRaw(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val line = evs.sortBy(e => (e._2, e._3)).take(size).map { e =>
        val lat = h60(e._3.toString) % 180000001L - 90000000L
        val lon = h60(e._3.toString + "x") % 360000001L - 180000000L
        s"$lat:$lon"
      }.mkString("|")
      (u, evs.length.toLong, evs.length <= size, line)
    }.toSeq.sortBy(_._1)
    val got = GeoOps.geoLine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getString(3))).toSeq
    assert(got === expected)
    assert(got.exists(!_._3),
      "fixture must contain a truncated (incomplete) track or the cap is unexercised")
    got.foreach { case (u, n, complete, line) =>
      assert(line.split('|').length === math.min(n, size.toLong).toInt,
        s"user $u line length")
      assert(complete === (n <= size))
    }
  }
}

"""ES geo queries and the geotile_grid aggregation, engine-native.

The kohesive reference delegates geo search (geo_distance / geo_bounding_box
filters, geotile_grid aggregation) to Elasticsearch; this module is the
Spark-native equivalent over plain (lat, lon) double columns.

Everything here is built-in JVM expressions — trig, comparisons, floor —
inside whole-stage codegen; filters sit directly above the scan so lat/lon
range predicates push down to parquet.  The same formulas are expressible
verbatim in ANSI SQL, which is what makes the gate rows hash-matchable:

* distance: haversine on a 6,371,000 m sphere (the standard public
  great-circle approximation; ES uses the same sphere for ``arc`` type).
* geotile cell: web-mercator tile (z, x, y) —
  x = floor((lon + 180) / 360 * 2^z),
  y = floor((1 - ln(tan(rad(lat)) + 1/cos(rad(lat))) / pi) / 2 * 2^z) —
  exactly ES ``geotile_grid`` bucket keys "z/x/y".

Boundary caveat (documented, not hidden): both engines evaluate the same
IEEE-double formula, but their libm implementations may differ in the last
ulp, so a point EXACTLY on a radius/tile boundary could in principle land
differently; gate fixtures use md5-derived coordinates, making that a
measure-zero event.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0
_PI = 3.141592653589793


def _rad(x: Column) -> Column:
    """Degrees → radians as x * pi / 180 with FIXED operation order.

    Deliberately NOT F.radians: Spark's RADIANS is Java's toRadians
    (x / 180 * pi) while DuckDB's is x * (pi/180) — three different IEEE
    orderings of the same conversion, off by an ulp for some inputs.  An
    explicit left-associated x * pi / 180 is the one spelling every SQL
    engine reproduces bit-for-bit, which keeps gate hashes stable."""
    return x * _PI / 180.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in metres between two (lat, lon) points."""
    dphi = _rad(lat2 - lat1) / 2.0
    dlam = _rad(lon2 - lon1) / 2.0
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(_rad(lat1)) * F.cos(_rad(lat2))
         * F.sin(dlam) * F.sin(dlam))
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def _lon_range_filter(lon: Column, lo: float, hi: float) -> Column:
    """Longitude-membership predicate on the [-180, 180] domain, antimeridian
    aware: [lo, hi] that leaks past ±180 wraps into TWO OR'd sargable range
    predicates (both still push down to the scan).  A range covering the full
    circle degenerates to an everything-passes filter — still a sound prune."""
    if hi - lo >= 360.0:
        return F.lit(True)
    # normalize endpoints into [-180, 180]; an upper endpoint landing exactly
    # on the seam means +180, not -180
    lo_n = -180.0 + (lo + 180.0) % 360.0
    hi_n = -180.0 + (hi + 180.0) % 360.0
    if hi_n == -180.0 and hi != -180.0:
        hi_n = 180.0
    if lo_n <= hi_n:
        return (lon >= lo_n) & (lon <= hi_n)
    return (lon >= lo_n) | (lon <= hi_n)


def geo_distance(df: DataFrame, lat_col: str, lon_col: str,
                 center_lat: float, center_lon: float,
                 radius_m: float) -> DataFrame:
    """ES geo_distance filter: rows within ``radius_m`` of the center,
    with the computed ``distance_m`` kept for sorting/inspection.

    A cheap bounding-box pre-filter (sargable, pushes down to the scan)
    brackets the circle before the trig runs.  Soundness on the haversine
    sphere: one degree of great-circle arc is pi*R/180 = 111,194.93 m, so
    the latitude half-width uses the smaller divisor 111,000 (over-covers
    by ~0.18%); the longitude half-width divides by cos at the WORST
    (highest-|lat|) edge of the latitude band — the cap's lon extent peaks
    there, so taking the MINIMUM cosine over-covers.  (A cap touching a
    pole drives the cosine to the 1e-9 floor, which degenerates to an
    everything-passes lon filter — still sound.)  A center near ±180 wraps
    the lon prune into two OR'd ranges (``_lon_range_filter``) so far-side
    points are never pruned; the haversine itself is wrap-safe (sin² of the
    half-delta is 360°-periodic).  The exact haversine test below the box
    is what decides membership; the box only prunes."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    dlat = float(radius_m) / 111000.0
    import math

    coslat = max(min(math.cos(math.radians(center_lat + dlat)),
                     math.cos(math.radians(center_lat - dlat))), 1e-9)
    dlon = float(radius_m) / (111000.0 * coslat)
    boxed = df.filter((lat >= center_lat - dlat) & (lat <= center_lat + dlat)
                      & _lon_range_filter(lon, center_lon - dlon,
                                          center_lon + dlon))
    d = haversine_m(lat, lon, F.lit(float(center_lat)), F.lit(float(center_lon)))
    return (boxed.withColumn("distance_m", d)
            .filter(F.col("distance_m") <= float(radius_m)))


def geo_bounding_box(df: DataFrame, lat_col: str, lon_col: str,
                     top: float, left: float,
                     bottom: float, right: float) -> DataFrame:
    """ES geo_bounding_box filter.  ``left > right`` means the box crosses
    the antimeridian (ES semantics): the lon predicate becomes the
    two-disjunct ``lon >= left OR lon <= right``."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    out = df.filter((lat <= float(top)) & (lat >= float(bottom)))
    if float(left) > float(right):
        return out.filter((lon >= float(left)) | (lon <= float(right)))
    return out.filter((lon >= float(left)) & (lon <= float(right)))


def geotile_cell(lat: Column, lon: Column, zoom: int) -> Column:
    """Web-mercator tile key "z/x/y" for a point — ES geotile_grid's
    bucket key.  Valid for |lat| <= 85.05112878 (the mercator limit)."""
    n = float(1 << int(zoom))
    x = F.floor((lon + 180.0) / 360.0 * n)
    phi = _rad(lat)
    y = F.floor((1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi))
                 / F.lit(_PI)) / 2.0 * n)
    return F.concat_ws("/", F.lit(str(int(zoom))),
                       x.cast("long").cast("string"),
                       y.cast("long").cast("string"))


def geotile_grid(df: DataFrame, lat_col: str, lon_col: str, zoom: int,
                 size: int = 10) -> DataFrame:
    """ES geotile_grid aggregation: top ``size`` mercator tiles by row
    count at ``zoom``, deterministic total order (count desc, key asc).

    Scale shape: one map-side-combined groupBy on a short string key
    (#cells <= 4^zoom, and in practice the occupied-cell count), then a
    distributed TakeOrdered cut — never a single-partition sort of all
    cells."""
    cell = geotile_cell(F.col(lat_col), F.col(lon_col), zoom)
    agg = (df.select(cell.alias("tile"))
           .groupBy("tile").agg(F.count(F.lit(1)).alias("doc_count")))
    return (agg.orderBy(F.desc("doc_count"), F.asc("tile")).limit(int(size)))


def geo_distance_ranges(df: DataFrame, lat_col: str, lon_col: str,
                        center_lat: float, center_lon: float,
                        edges_m: list[float]) -> DataFrame:
    """ES geo_distance range aggregation: row counts per concentric
    distance band [edge_i, edge_{i+1}) around the center, plus the
    open-ended outer band.  One pass, one map-side-combined groupBy."""
    d = haversine_m(F.col(lat_col), F.col(lon_col),
                    F.lit(float(center_lat)), F.lit(float(center_lon)))
    edges = sorted(float(e) for e in edges_m)
    band = F.when(d < edges[0], F.lit(f"*-{edges[0]:g}"))
    for lo, hi in zip(edges, edges[1:]):
        band = band.when(d < hi, F.lit(f"{lo:g}-{hi:g}"))
    band = band.otherwise(F.lit(f"{edges[-1]:g}-*"))
    return (df.select(band.alias("band"))
            .groupBy("band").agg(F.count(F.lit(1)).alias("doc_count")))


# --------------------------------------------------------------- geohash

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell(lat: Column, lon: Column, precision: int) -> Column:
    """ES geohash bucket key at ``precision`` chars, as pure integer/
    string Catalyst expressions (whole-stage codegen; the identical
    arithmetic replays in any SQL engine — no libm involved, so unlike
    the trig paths this key has NO boundary-ulp caveat).

    Geohash = quantize lon/lat to ceil(5p/2)/floor(5p/2) bits, interleave
    (lon first from the MSB), emit 5-bit groups as base32 chars.  The
    interleave is a closed-form sum of shift/mask terms — ~5p integer ops,
    no loop rows, no UDF."""
    p = int(precision)
    if not 1 <= p <= 9:
        # 9 chars = 45 bits; lon_q needs 23 bits — still exact in BIGINT,
        # but ES caps geohash_grid precision at 12; we stop where the
        # double → integer quantization stays exact without extra care
        raise ValueError("geohash precision must be in 1..9")
    total = 5 * p
    nlon = (total + 1) // 2
    nlat = total // 2
    lon_q = F.least(F.lit((1 << nlon) - 1), F.floor(
        (lon + 180.0) / 360.0 * float(1 << nlon))).cast("long")
    lat_q = F.least(F.lit((1 << nlat) - 1), F.floor(
        (lat + 90.0) / 180.0 * float(1 << nlat))).cast("long")
    # bit positions from the LSB: total odd → lon on even positions,
    # total even → lon on odd positions (MSB-first sequence starts lon)
    lon_off, lat_off = (0, 1) if total % 2 == 1 else (1, 0)
    code = F.lit(0).cast("long")
    for i in range(nlon):
        code = code + F.shiftleft(
            F.shiftrightunsigned(lon_q, i).bitwiseAND(F.lit(1)),
            2 * i + lon_off)
    for i in range(nlat):
        code = code + F.shiftleft(
            F.shiftrightunsigned(lat_q, i).bitwiseAND(F.lit(1)),
            2 * i + lat_off)
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (F.shiftrightunsigned(code, 5 * (p - 1 - g))
             .bitwiseAND(F.lit(31)) + 1).cast("int"), 1)
        for g in range(p)]
    return F.concat(*chars)


def geohash_cell_sql(lat: str, lon: str, precision: int) -> str:
    """The same geohash key as portable SQL (oracle replay — DuckDB and
    Spark SQL both run this text verbatim)."""
    p = int(precision)
    total = 5 * p
    nlon = (total + 1) // 2
    nlat = total // 2
    lon_off, lat_off = (0, 1) if total % 2 == 1 else (1, 0)
    # x.0::DOUBLE casts everywhere: DuckDB parses bare x.0 literals as
    # DECIMAL and runs exact decimal arithmetic — both overflow-prone and
    # differently rounded from Spark's doubles (repo determinism policy)
    lon_q = (f"least({(1 << nlon) - 1}, "
             f"floor(({lon} + 180.0::DOUBLE) / 360.0::DOUBLE * "
             f"{float(1 << nlon)!r}::DOUBLE))::BIGINT")
    lat_q = (f"least({(1 << nlat) - 1}, "
             f"floor(({lat} + 90.0::DOUBLE) / 180.0::DOUBLE * "
             f"{float(1 << nlat)!r}::DOUBLE))::BIGINT")
    terms = [f"((({lon_q} >> {i}) & 1) << {2 * i + lon_off})"
             for i in range(nlon)]
    terms += [f"((({lat_q} >> {i}) & 1) << {2 * i + lat_off})"
              for i in range(nlat)]
    code = "(" + " + ".join(terms) + ")"
    chars = [f"substr('{GEOHASH_ALPHABET}', "
             f"((({code} >> {5 * (p - 1 - g)}) & 31) + 1)::INT, 1)"
             for g in range(p)]
    return " || ".join(chars)


def geohash_grid(df: DataFrame, lat_col: str, lon_col: str,
                 precision: int = 4, size: int = 10) -> DataFrame:
    """ES geohash_grid aggregation: top ``size`` geohash cells by row
    count at ``precision``, deterministic total order (count desc, key
    asc).  Same scale shape as :func:`geotile_grid` — map-side-combined
    groupBy on a short key, distributed TakeOrdered cut."""
    cell = geohash_cell(F.col(lat_col), F.col(lon_col), precision)
    agg = (df.select(cell.alias("geohash"))
           .groupBy("geohash").agg(F.count(F.lit(1)).alias("doc_count")))
    return (agg.orderBy(F.desc("doc_count"), F.asc("geohash"))
            .limit(int(size)))


def geo_bounds_agg(df: DataFrame, lat_col: str, lon_col: str,
                   by: str | list | None = None) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the smallest lat/lon box enclosing
    the points — top = max lat, bottom = min lat, left = min lon,
    right = max lon — per ``by`` bucket (or one global row).  min/max are
    order-free, so the outputs are bit-identical across engines on
    identical point doubles.  (ES's optional dateline-crossing shrink-wrap
    ``wrap_longitude`` is out of scope, same seam policy as
    :func:`geo_bounding_box` pre-round-5.)  Map-side-combined single agg."""
    keys = [by] if isinstance(by, str) else list(by or [])
    g = df.groupBy(*keys) if keys else df.groupBy()
    return g.agg(F.max(lat_col).cast("double").alias("top"),
                 F.min(lon_col).cast("double").alias("left"),
                 F.min(lat_col).cast("double").alias("bottom"),
                 F.max(lon_col).cast("double").alias("right"),
                 F.count(F.lit(1)).cast("long").alias("doc_count"))


def geo_centroid_agg(df: DataFrame, lat_col: str, lon_col: str,
                     by: str | list | None = None) -> DataFrame:
    """ES ``geo_centroid`` aggregation: arithmetic mean of lat/lon over the
    bucket's points (ES's planar centroid) + count, one map-side-combined
    pass.  The means are float sums whose order is engine-dependent at the
    last ulp — presentation code should round (the gate rounds to integer
    milli-degrees, where an md5-scattered boundary flip is measure-zero)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    g = df.groupBy(*keys) if keys else df.groupBy()
    return g.agg(F.avg(lat_col).alias("centroid_lat"),
                 F.avg(lon_col).alias("centroid_lon"),
                 F.count(F.lit(1)).cast("long").alias("doc_count"))

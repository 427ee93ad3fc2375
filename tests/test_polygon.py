"""functions/polygon.py — simple-polygon predicates (the duckdb-spatial
subset behind the reference's region queries:
benchmark/BerlinMOD/sql/load/04_regions.sql + query_13/14.sql)."""

from pyspark.sql import functions as F

from mobilityduck_spark.functions import polygon as PG
from mobilityduck_spark.sources import berlinmod as BM


def one(df, col):
    return df.select(col.alias("r")).collect()[0]["r"]


def _ring(*pts):
    return F.array(
        *[
            F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))
            for x, y in pts
        ]
    )


def _line(*pts):
    return _ring(*pts)


SQUARE = [(0, 0), (4, 0), (4, 4), (0, 4)]
# concave "L" polygon
ELL = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]


def test_point_in_ring(spark):
    df = spark.range(1)
    sq = _ring(*SQUARE)
    assert one(df, PG.point_in_ring(F.lit(2.0), F.lit(2.0), sq)) is True
    assert one(df, PG.point_in_ring(F.lit(5.0), F.lit(2.0), sq)) is False
    assert one(df, PG.point_in_ring(F.lit(-0.1), F.lit(0.0), sq)) is False
    ell = _ring(*ELL)
    assert one(df, PG.point_in_ring(F.lit(1.0), F.lit(3.0), ell)) is True
    # inside the bbox but in the concave notch
    assert one(df, PG.point_in_ring(F.lit(3.0), F.lit(3.0), ell)) is False


def test_line_intersects_ring(spark):
    df = spark.range(1)
    sq = _ring(*SQUARE)
    # pass-through: both endpoints outside, crosses two edges
    assert one(
        df, PG.line_intersects_ring(_line((-1, 2), (5, 2)), sq)
    ) is True
    # vertex inside
    assert one(
        df, PG.line_intersects_ring(_line((2, 2), (9, 9)), sq)
    ) is True
    # fully outside
    assert one(
        df, PG.line_intersects_ring(_line((5, 5), (9, 5), (9, 9)), sq)
    ) is False
    # degenerate single-vertex line
    assert one(df, PG.line_intersects_ring(_line((1, 1)), sq)) is True
    assert one(df, PG.line_intersects_ring(_line((9, 9)), sq)) is False
    # concave notch: segment through the notch only -> no intersection
    ell = _ring(*ELL)
    assert one(
        df, PG.line_intersects_ring(_line((3, 5), (3, 2.5)), ell)
    ) is False


def test_make_polygon_and_type(spark):
    df = spark.range(1)
    closed = _ring((0, 0), (4, 0), (4, 4), (0, 4), (0, 0))
    ring = PG.make_polygon(closed)
    assert one(df, F.size(ring)) == 4
    assert one(df, F.size(PG.make_polygon(_ring(*SQUARE)))) == 4
    assert (
        one(df, PG.ring_wkt(PG.make_polygon(closed)))
        == "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"
    )
    assert one(df, PG.st_geometry_type(F.lit("  polygon((0 0))"))) == "POLYGON"
    assert one(df, PG.st_geometry_type(F.lit("POINT (1 1)"))) == "POINT"


def test_regions_poly_simple_and_star_shaped(spark):
    """Generated probe polygons must be simple (angle-ordered star
    construction): no two non-adjacent edges properly cross."""
    rows = BM.regions_poly(spark, "").collect()
    assert len(rows) == 10
    for r in rows:
        ring = [(v["x"], v["y"]) for v in r["ring"]]
        n = len(ring)
        assert n == 8
        edges = [(ring[i], ring[(i + 1) % n]) for i in range(n)]

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (
                b[0] - o[0]
            )

        for i in range(n):
            for j in range(i + 1, n):
                if j in (i, (i + 1) % n, (i - 1) % n):
                    continue
                (p, q), (a, b) = edges[i], edges[j]
                d1, d2 = cross(p, q, a), cross(p, q, b)
                d3, d4 = cross(a, b, p), cross(a, b, q)
                proper = (
                    ((d1 > 0) != (d2 > 0))
                    and d1 != 0 and d2 != 0
                    and ((d3 > 0) != (d4 > 0))
                    and d3 != 0 and d4 != 0
                )
                assert not proper, f"region {r['region_id']} self-intersects"


def test_on_line_spanset_collinear_and_crossing(spark):
    """PG.on_line_spanset: a motion segment collinear with the probe
    edge contributes its projection-overlap interval; the following
    crossing contributes a touching instant that merges into it."""
    from pyspark.sql import types as T

    from mobilityduck_spark import textio
    from mobilityduck_spark import types as mt
    from mobilityduck_spark.functions import polygon as PG
    from mobilityduck_spark.functions import span as S

    trip = textio.parse_temporal(
        "[Point(0 0)@2000-01-01, Point(2 2)@2000-01-02,"
        " Point(4 0)@2000-01-03]",
        "point",
    )
    schema = T.StructType(
        [T.StructField("t", mt.temporal_type(mt.POINT_TYPE), True)]
    )
    df = spark.createDataFrame([(trip,)], schema)
    edges = F.array(
        F.struct(
            F.struct(F.lit(1.0).alias("x"), F.lit(1.0).alias("y")).alias("a"),
            F.struct(F.lit(3.0).alias("x"), F.lit(3.0).alias("y")).alias("b"),
        )
    )
    row = df.select(
        PG.on_line_spanset(F.col("t"), edges).alias("ss")
    ).select(
        F.size("ss").alias("n"),
        S.spanset_duration_us(F.col("ss")).alias("dur"),
        F.col("ss")[0]["lower"].alias("lo"),
        F.col("ss")[0]["upper"].alias("hi"),
    ).collect()[0]
    # on the line from halfway through day 1 (position (1,1)) until the
    # turn at (2,2); the outgoing crossing instant merges in
    assert row["n"] == 1
    assert row["dur"] == 12 * 3600 * 1_000_000
    assert str(row["lo"]).startswith("2000-01-01 12:00:00")
    assert str(row["hi"]).startswith("2000-01-02 00:00:00")


def test_segment_inside_intervals(spark):
    """Crossing-partition + midpoint ray-cast over the unit square."""
    df = spark.range(1)
    sq_edges = PG.ring_edges(_ring(*SQUARE))

    def ivs(p, q):
        return one(
            df,
            PG.segment_inside_intervals(
                F.lit(float(p[0])), F.lit(float(p[1])),
                F.lit(float(q[0])), F.lit(float(q[1])), sq_edges,
            ),
        )

    # pass-through: enters at s=1/6, exits at s=5/6
    got = ivs((-1, 2), (5, 2))
    assert len(got) == 1
    lo, hi = got[0]["lo"], got[0]["hi"]
    assert abs(lo - 1 / 6) < 1e-12 and abs(hi - 5 / 6) < 1e-12
    # fully inside: single [0, 1]
    assert [tuple(i) for i in ivs((1, 1), (3, 3))] == [(0.0, 1.0)]
    # fully outside: empty
    assert ivs((5, 5), (9, 9)) == []
    # starts inside, exits at s=0.5
    got = ivs((2, 2), (2, 6))
    assert len(got) == 1 and got[0]["lo"] == 0.0 and abs(got[0]["hi"] - 0.5) < 1e-12
    # stationary segment inside / outside
    assert [tuple(i) for i in ivs((1, 1), (1, 1))] == [(0.0, 1.0)]
    assert ivs((9, 9), (9, 9)) == []


def test_in_polygon_spanset_concave(spark):
    """in_polygon_spanset over the concave L: a straight pass along
    y=3 is inside for x∈(0,2) only (the notch excludes x∈(2,4));
    entry/exit crossing times are exact."""
    from pyspark.sql import types as T

    from mobilityduck_spark import textio
    from mobilityduck_spark import types as mt
    from mobilityduck_spark.functions import span as S

    trip = textio.parse_temporal(
        "[Point(-2 3)@2000-01-01, Point(4 3)@2000-01-04]", "point"
    )
    schema = T.StructType(
        [T.StructField("t", mt.temporal_type(mt.POINT_TYPE), True)]
    )
    df = spark.createDataFrame([(trip,)], schema)
    edges = PG.ring_edges(_ring(*ELL))
    row = df.select(
        PG.in_polygon_spanset(F.col("t"), edges).alias("ss")
    ).select(
        F.size("ss").alias("n"),
        S.spanset_duration_us(F.col("ss")).alias("dur"),
        F.col("ss")[0]["lower"].alias("lo"),
        F.col("ss")[0]["upper"].alias("hi"),
    ).collect()[0]
    # x: -2 → 4 over 3 days (2 units/day); inside x∈(0,2) → day 2 only
    assert row["n"] == 1
    assert row["dur"] == 24 * 3600 * 1_000_000
    assert str(row["lo"]).startswith("2000-01-02 00:00:00")
    assert str(row["hi"]).startswith("2000-01-03 00:00:00")


def test_at_polygon_duration_dense_sampling_independent(spark):
    """INDEPENDENT semantic check for at_polygon_duration (not an
    oracle transliteration): re-derive each probe vehicle's polyline
    from the raw events formula, densely sample every motion segment
    with a fresh numpy PNPOLY implementation, and integrate approximate
    time-in-polygon. The exact crossing-time answer must sit within the
    sampling-error bound — if interval states were systematically
    flipped (the bug class the oracle's old UNION ALL parity defect
    hid), the error would be the whole interval, orders of magnitude
    above the bound."""
    import numpy as np

    from mobilityduck_spark import queries as Q

    SF = "/root/testdata/sf0.001"
    out = {
        (r["vehicle_id"], r["region_id"]): r["dur_us"]
        for r in Q.queries()["at_polygon_duration"](spark, SF).collect()
    }
    assert out, "no (vehicle, region) rows at sf0.001"

    # raw polyline per probe vehicle (same derivation as the dataset)
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) ts", "event_id"
    ).collect()
    import collections

    pts = collections.defaultdict(list)
    for r in ev:
        if r["user_id"] % 7 == 0:
            x = (r["event_id"] % 1000) / 10.0
            y = (r["event_id"] * 7919 % 1000) / 10.0
            pts[r["user_id"]].append((r["ts"].timestamp(), x, y))
    for v in pts.values():
        v.sort()

    # polygons re-derived from the published closed form
    DX = [2, 2, 0, -1, -2, -2, 0, 1]
    DY = [0, 1, 2, 2, 0, -1, -2, -2]
    rings = {}
    for k in range(10):
        cx, cy = k * 9 % 80 + 10.5, k * 13 % 80 + 10.5
        rings[k] = [
            (
                cx + (6 + (k * 3 + j * 5) % 7) / 2.0 * DX[j],
                cy + (6 + (k * 3 + j * 5) % 7) / 2.0 * DY[j],
            )
            for j in range(8)
        ]

    def pnpoly(xs, ys, ring):  # fresh numpy ray-cast, vectorized
        inside = np.zeros(len(xs), dtype=bool)
        n = len(ring)
        for i in range(n):
            ax, ay = ring[i]
            bx, by = ring[(i + 1) % n]
            straddle = (ay > ys) != (by > ys)
            with np.errstate(divide="ignore", invalid="ignore"):
                xcross = (bx - ax) * (ys - ay) / (by - ay) + ax
            inside ^= straddle & (xs < xcross)
        return inside

    GAP = 7200.0
    N = 200  # samples per segment
    checked = 0
    top = sorted(out.items(), key=lambda kv: -kv[1])[:8]
    for (veh, reg), dur_us in top:
        ring = rings[reg]
        approx = 0.0
        err_cap = 0.0
        seq = pts[veh]
        for (t0, x0, y0), (t1, x1, y1) in zip(seq, seq[1:]):
            if t1 - t0 > GAP:  # island split — undefined between
                continue
            s = (np.arange(N) + 0.5) / N  # midpoint rule
            xs = x0 + (x1 - x0) * s
            ys = y0 + (y1 - y0) * s
            frac = pnpoly(xs, ys, ring).mean()
            approx += frac * (t1 - t0)
            err_cap += 16.0 * (t1 - t0) / N  # ≤2 per crossing, ≤8 edges
        tol_us = (err_cap + 60.0) * 1e6
        assert abs(dur_us - approx * 1e6) <= tol_us, (
            f"veh {veh} region {reg}: exact {dur_us} vs sampled "
            f"{approx * 1e6:.0f} (tol {tol_us:.0f})"
        )
        checked += 1
    assert checked >= 5

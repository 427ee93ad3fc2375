"""Distributed CRS reprojection — the column-level Spark surface over
the closed-form EPSG dispatcher in wkt.py.

The reference exposes reprojection as a scalar SQL function
(`transform(geomset, srid)`, src/geo/geoset.cpp:95-115, delegating to
duckdb-spatial/PROJ). At 100 TB the engine-level question is different:
reprojection must run AS A COLUMN OPERATOR inside the scan pipeline,
not as a driver-side scalar. Two tiers:

- Web mercator (EPSG:3857) is closed-form in elementary functions, so
  it compiles to PURE CATALYST expressions (`web_mercator_x/y`) —
  whole-stage codegen, no Python boundary, no UDF. This is the hot
  path for map-tile / extent workloads and the tier the hash oracle
  covers (`events_web_mercator_extent`).
- Every other supported CRS goes through `project_xy_udf`, an
  Arrow-batched pandas UDF over the same kernel table wkt.py
  dispatches (`_PROJECTIONS` / `_utm_fwd`) — unit-pinned against the
  scalar `project_wkt` path so the distributed and golden-replay
  answers can never diverge. UTM targets additionally take a
  numpy-vectorized Snyder series (no per-row Python in the batch).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, DoubleType

from .. import wkt as _wkt

_R_WGS84 = 6378137.0


def web_mercator_x(lon: Column) -> Column:
    """EPSG:3857 easting as a Catalyst expression (codegen, no UDF)."""
    return F.lit(_R_WGS84) * F.radians(lon)


def web_mercator_y(lat: Column) -> Column:
    """EPSG:3857 northing as a Catalyst expression (codegen, no UDF)."""
    return F.lit(_R_WGS84) * F.log(
        F.tan(F.lit(math.pi / 4) + F.radians(lat) / F.lit(2.0))
    )


_XY_SCHEMA = StructType(
    [StructField("x", DoubleType()), StructField("y", DoubleType())]
)


def _utm_np(zone: int, y0: float):
    """Numpy-vectorized Snyder TM forward for a UTM zone — the batch
    form of wkt._transverse_mercator (same series, same constants)."""
    import numpy as np

    a, f = _wkt._GRS80_A, _wkt._GRS80_F
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0, x0 = 0.9996, 500000.0
    lon0 = math.radians(zone * 6 - 183)
    m1 = 1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256
    m2 = 3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024
    m3 = 15 * e2**2 / 256 + 45 * e2**3 / 1024
    m4 = 35 * e2**3 / 3072

    def fwd(lon, lat):
        phi, lam = np.radians(lat), np.radians(lon)
        sp, cp, tp = np.sin(phi), np.cos(phi), np.tan(phi)
        nu = a / np.sqrt(1 - e2 * sp * sp)
        t = tp * tp
        c = ep2 * cp * cp
        ba = (lam - lon0) * cp
        arc = a * (
            m1 * phi - m2 * np.sin(2 * phi) + m3 * np.sin(4 * phi)
            - m4 * np.sin(6 * phi)
        )
        x = k0 * nu * (
            ba + (1 - t + c) * ba**3 / 6
            + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * ba**5 / 120
        )
        y = k0 * (
            arc + nu * tp * (
                ba**2 / 2
                + (5 - t + 9 * c + 4 * c * c) * ba**4 / 24
                + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * ba**6 / 720
            )
        )
        return x0 + x, y0 + y

    return fwd


def project_xy_udf(src_srid: int, dst_srid: int):
    """Arrow-batched (lon, lat) → struct(x, y) reprojection UDF for any
    CRS pair the wkt.py dispatcher supports; raises the same ValueError
    boundary at BUILD time for unsupported pairs (fail at plan time,
    not per-task). Web mercator callers should prefer the pure-Catalyst
    web_mercator_x/y; UTM targets run the numpy-vectorized series;
    the remaining national grids run the scalar kernels per batch row
    (bounded Python work inside an Arrow batch — the same tier the
    multimodal decoders occupy)."""
    import numpy as np
    import pandas as pd

    lookup_src = 4326 if src_srid in _wkt._GEOGRAPHIC_SRIDS else src_srid
    if dst_srid == 3857 and lookup_src == 4326:
        def batch(lon, lat):
            x = _R_WGS84 * np.radians(lon.to_numpy())
            y = _R_WGS84 * np.log(
                np.tan(math.pi / 4 + np.radians(lat.to_numpy()) / 2)
            )
            return pd.DataFrame({"x": x, "y": y})

        return F.pandas_udf(batch, _XY_SCHEMA)

    band, zone = dst_srid // 100, dst_srid % 100
    rng = _wkt._UTM_BANDS.get(band)
    if rng is not None and rng[0] <= zone <= rng[1] and lookup_src == 4326:
        vec = _utm_np(zone, rng[2])

        def batch(lon, lat):
            x, y = vec(lon.to_numpy(), lat.to_numpy())
            return pd.DataFrame({"x": x, "y": y})

        return F.pandas_udf(batch, _XY_SCHEMA)

    fwd = _wkt._PROJECTIONS.get((lookup_src, dst_srid))
    if fwd is None:
        raise ValueError(f"unsupported transform {src_srid}->{dst_srid}")

    def batch(lon, lat):
        out = [fwd(lo, la) for lo, la in zip(lon, lat)]
        return pd.DataFrame(out, columns=["x", "y"])

    return F.pandas_udf(batch, _XY_SCHEMA)

"""LatLonPoint geo queries: box (multi-dim range) + haversine distance.

Reference: lucene/core/src/java/org/apache/lucene/document/
LatLonPoint.java:231 (newBoxQuery), :258 (newDistanceQuery);
LatLonPointDistanceQuery.java:77-135 (BKD box visit + per-hit
haversin verify); geo/GeoUtils.java (EARTH_MEAN_RADIUS_METERS).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q

N = 200
R_EARTH = Q.EARTH_MEAN_RADIUS_METERS


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2 - lon1)
    h = (np.sin((p2 - p1) / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2)
    return 2 * R_EARTH * np.arcsin(np.sqrt(h))


@pytest.fixture(scope="module")
def geo_engine(spark, tmp_path_factory):
    ids = np.arange(N)
    lat = (ids * 37 % 1800) / 10.0 - 90.0
    lon = (ids * 73 % 3600) / 10.0 - 180.0
    pdf = pd.DataFrame({
        "repo": "r", "path": [f"{i:04d}" for i in ids], "commit": "c",
        "lang": "t", "lat": lat, "lon": lon,
        "content": [f"doc {i} data point" for i in ids],
    })
    d = str(tmp_path_factory.mktemp("geo_idx"))
    build_index(spark, spark.createDataFrame(pdf), d,
                EngineConfig(segment_size=64), resume=False)
    s = IndexSearcher(spark, d)
    meta = spark.read.parquet(s.docmeta_path).select(
        "doc_id", "lat", "lon"
    ).toPandas()
    return s, meta


def _filter_hits(s, q):
    b = Q.Builder()
    b.add(Q.MatchAllDocsQuery(), Q.Occur.MUST)
    b.add(q, Q.Occur.FILTER)
    return sorted(s.matches_df(b.build()).toPandas()["doc_id"].tolist())


def test_geo_box(geo_engine):
    s, meta = geo_engine
    hits = _filter_hits(s, Q.multi_dim_range(("lat", -30.0, 40.0),
                                             ("lon", -10.0, 60.0)))
    exp = meta[meta["lat"].between(-30, 40) & meta["lon"].between(-10, 60)]
    assert hits == sorted(exp["doc_id"].tolist())
    assert len(hits) > 0


def test_geo_distance(geo_engine):
    s, meta = geo_engine
    for (clat, clon, r) in [(10.0, 20.0, 2.03e6), (-45.0, 100.0, 5e6),
                            (0.0, 0.0, 1.0)]:
        q = Q.LatLonDistanceQuery("lat", "lon", clat, clon, r)
        hits = _filter_hits(s, q)
        d = _hav(clat, clon, meta["lat"].to_numpy(), meta["lon"].to_numpy())
        exp = sorted(meta["doc_id"].to_numpy()[d <= r].tolist())
        assert hits == exp, (clat, clon, r)


def test_geo_distance_band_is_sound(geo_engine):
    """The latitude-band prefilter never excludes a true match: compare
    against the unconstrained haversine at a radius large enough that
    the band spans many rows."""
    s, meta = geo_engine
    q = Q.LatLonDistanceQuery("lat", "lon", 80.0, 0.0, 8e6)
    hits = _filter_hits(s, q)
    d = _hav(80.0, 0.0, meta["lat"].to_numpy(), meta["lon"].to_numpy())
    assert hits == sorted(meta["doc_id"].to_numpy()[d <= 8e6].tolist())


def _point_in_poly(lat, lon, verts):
    """numpy crossing-number oracle (geo/Polygon2D.java contains)."""
    inside = np.zeros_like(lat, dtype=bool)
    n = len(verts)
    for i in range(n):
        yi, xi = verts[i]
        yj, xj = verts[(i + 1) % n]
        if yi == yj:
            continue
        straddles = (yi > lat) != (yj > lat)
        x_at = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= straddles & (lon < x_at)
    return inside


def test_geo_polygon(geo_engine):
    """LatLonPoint.newPolygonQuery analog vs a numpy ray-cast oracle —
    convex and non-convex rings, both vertex orders."""
    s, meta = geo_engine
    la, lo = meta["lat"].to_numpy(), meta["lon"].to_numpy()
    pent = ((5.05, -20.15), (45.25, 0.05), (30.15, 50.35),
            (-10.05, 40.25), (-25.35, 5.15))
    cases = [
        pent,
        tuple(reversed(pent)),  # winding order must not matter
        # non-convex "arrowhead"
        ((0.05, -30.15), (60.25, 0.05), (0.05, 30.15), (20.15, 0.05)),
        # triangle with a horizontal edge (skipped edge path)
        ((10.05, -50.15), (10.05, 50.15), (70.25, 0.05)),
    ]
    for verts in cases:
        q = Q.LatLonPolygonQuery("lat", "lon", verts)
        hits = _filter_hits(s, q)
        exp = sorted(meta["doc_id"].to_numpy()[
            _point_in_poly(la, lo, verts)].tolist())
        assert hits == exp, verts
        assert len(hits) > 0, verts


def test_geo_polygon_rejects_degenerate():
    with pytest.raises(ValueError):
        Q.LatLonPolygonQuery("lat", "lon", ((0.0, 0.0), (1.0, 1.0)))


def test_geo_with_term_conjunction(geo_engine):
    """geo FILTER composes with a scored term MUST (the common shape:
    text match within an area)."""
    s, meta = geo_engine
    b = Q.Builder()
    b.add(Q.TermQuery("data"), Q.Occur.MUST)
    b.add(Q.LatLonDistanceQuery("lat", "lon", 10.0, 20.0, 2.03e6),
          Q.Occur.FILTER)
    td = s.search(b.build(), k=50)
    d = _hav(10.0, 20.0, meta["lat"].to_numpy(), meta["lon"].to_numpy())
    exp = set(meta["doc_id"].to_numpy()[d <= 2.03e6].tolist())
    assert set(td.doc_ids.tolist()) <= exp
    assert td.total_hits == len(exp)  # every doc contains 'data'

"""S2-style hierarchical geocell index (demeton_spark/geocell.py).

Property tests pin the public S2 scheme's invariants — cube-face
assignment, quadratic ST transform inverses, Hilbert curve continuity
/ coverage / contiguity of descendants — plus the Spark Catalyst
implementation's agreement with the vectorized numpy one."""

import numpy as np
import pytest

from demeton_spark import geocell as gc

RNG = np.random.default_rng(99)
LON = RNG.uniform(-180.0, 180.0, 5000)
LAT = RNG.uniform(-90.0, 90.0, 5000)


def test_face_assignment_cardinals():
    pts = [
        (0, 0, 0), (90, 0, 1), (0, 90, 2),
        (180, 0, 3), (-180, 0, 3), (-90, 0, 4), (0, -90, 5),
    ]
    for lon, lat, face in pts:
        c = gc.lonlat_to_cell(np.array([lon]), np.array([lat]), 4)
        assert c[0] // 4**4 == face, (lon, lat)


def test_st_uv_inverse():
    u = RNG.uniform(-1, 1, 10000)
    assert np.allclose(gc.st_to_uv(gc.uv_to_st(u)), u, atol=1e-15)
    s = RNG.uniform(0, 1, 10000)
    assert np.allclose(gc.uv_to_st(gc.st_to_uv(s)), s, atol=1e-15)


def test_xyz_face_uv_inverse():
    x, y, z = gc.lonlat_to_xyz(LON, LAT)
    face, u, v = gc.xyz_to_face_uv(x, y, z)
    xx, yy, zz = gc.face_uv_to_xyz(face, u, v)
    # un-normalized direction is a positive multiple of the input
    norm = np.sqrt(xx * xx + yy * yy + zz * zz)
    assert np.allclose(xx / norm, x, atol=1e-12)
    assert np.allclose(yy / norm, y, atol=1e-12)
    assert np.allclose(zz / norm, z, atol=1e-12)
    assert np.all((u >= -1 - 1e-12) & (u <= 1 + 1e-12))
    assert np.all((v >= -1 - 1e-12) & (v <= 1 + 1e-12))


@pytest.mark.parametrize("level", [0, 1, 4, 10, 16, 30])
def test_cell_center_roundtrip(level):
    c = gc.lonlat_to_cell(LON, LAT, level)
    lon2, lat2 = gc.cell_to_lonlat(c, level)
    assert (gc.lonlat_to_cell(lon2, lat2, level) == c).all()


def test_hierarchy_parent_consistency():
    """Encoding at a coarser level == integer-parent of the finer id —
    the property that makes rollups pure arithmetic."""
    fine = gc.lonlat_to_cell(LON, LAT, 14)
    for lvl in (0, 3, 7, 13):
        assert (
            gc.cell_parent(fine, 14, lvl) == gc.lonlat_to_cell(LON, LAT, lvl)
        ).all()


def test_hilbert_continuity_and_coverage():
    """Consecutive curve positions are grid-adjacent (|Δi|+|Δj| = 1)
    and the curve visits every cell of the 2^L × 2^L grid exactly once
    — on every face (odd faces start with swapped orientation)."""
    level = 5
    pos = np.arange(4**level)
    for f in range(6):
        face = np.full_like(pos, f)
        i, j = gc.pos_to_ij(face, pos, level)
        assert (np.abs(np.diff(i)) + np.abs(np.diff(j)) == 1).all(), f
        assert len(set(zip(i.tolist(), j.tolist()))) == 4**level, f


def test_ij_pos_inverse():
    for level in (1, 6, 15):
        i = RNG.integers(0, 1 << level, 4000)
        j = RNG.integers(0, 1 << level, 4000)
        f = RNG.integers(0, 6, 4000)
        p = gc.ij_to_pos(f, i, j, level)
        i2, j2 = gc.pos_to_ij(f, p, level)
        assert (i == i2).all() and (j == j2).all()


def test_descendant_range_contiguity():
    """All level-12 descendants of a level-8 cell fall in ONE
    contiguous compact-id range — what turns a cell cover into range
    predicates a parquet/Iceberg scan prunes on min-max stats."""
    c8 = gc.lonlat_to_cell(LON, LAT, 8)
    c12 = gc.lonlat_to_cell(LON, LAT, 12)
    lo, hi = gc.cell_range(c8, 8, 12)
    assert ((c12 >= lo) & (c12 <= hi)).all()
    # and the range is exactly 4^(12-8) wide
    assert ((hi - lo + 1) == 4**4).all()


def test_s2_id_layout():
    """Canonical 64-bit layout: sentinel bit at 2·(30−L), id recovers
    the compact id, leaf lsb is bit 0, faces 4/5 go negative (bit 63)."""
    for level in (0, 12, 30):
        c = gc.lonlat_to_cell(LON, LAT, level)
        sid = gc.cell_to_s2_id(c, level)
        assert (gc.s2_id_to_cell(sid, level) == c).all()
        raw = sid.view(np.uint64)
        lsb = raw & (~raw + np.uint64(1))
        assert (lsb == np.uint64(1) << np.uint64(2 * (30 - level))).all()
    c = gc.lonlat_to_cell(np.array([-90.0]), np.array([0.0]), 2)  # face 4
    assert gc.cell_to_s2_id(c, 2)[0] < 0


def test_spark_catalyst_matches_numpy(spark):
    """The Catalyst implementation (queries._with_geocell) agrees with
    the vectorized numpy module on random points."""
    import pandas as pd

    from demeton_spark import queries as Q

    pdf = pd.DataFrame({"lon": LON[:800], "lat": LAT[:800]})
    pdf["pid"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    got = (
        Q._with_geocell(df, 12, keep=["pid"])
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    want = gc.lonlat_to_cell(pdf.lon.values, pdf.lat.values, 12)
    assert (got.cell_id.values == want).all()
    assert (got.face.values == want // 4**12).all()


def test_cross_face_neighbors_complete():
    """cell_neighbors is cross-face complete at level 3: the relation
    is symmetric over ALL 6·4³ cells, exactly the 24 cube-corner cells
    have 7 neighbors (everyone else 8), and every neighbor's center is
    geometrically adjacent (angle < 2.5 cell widths)."""
    level = 3
    n_cells = 6 * 4**level
    all_cells = np.arange(n_cells, dtype=np.int64)
    nbr_sets = [set(x.tolist()) for x in gc.cell_neighbors(all_cells, level)]
    for a in range(n_cells):
        for b in nbr_sets[a]:
            assert a in nbr_sets[b], (a, b)
    from collections import Counter

    hist = Counter(len(s) for s in nbr_sets)
    assert hist == {8: n_cells - 24, 7: 24}
    lon, lat = gc.cell_to_lonlat(all_cells, level)
    x, y, z = gc.lonlat_to_xyz(lon, lat)
    xyz = np.stack([x, y, z], axis=1)
    bound = 2.5 * (np.pi / 2) / (1 << level)
    for a in range(n_cells):
        for b in nbr_sets[a]:
            ang = np.arccos(np.clip(np.dot(xyz[a], xyz[b]), -1, 1))
            assert ang < bound, (a, b, ang)


def test_points_in_polygons_vs_numpy(spark):
    """The distributed points×polygons spatial join must agree with the
    sequential numpy crossing-number oracle (geometry.points_in_polygon,
    same half-open rule) on every polygon."""
    import math

    import pandas as pd

    from demeton_spark.geometry import points_in_polygon
    from demeton_spark.queries import (
        _GPIP_ECC,
        _GPIP_N_POLYS,
        q_geo_points_in_polygons,
    )

    # sf0.01: sf0.001's user_ids span only 0..14, so every point sits
    # south of -75 deg and misses all 40 polygons — no join exercise.
    sf = "/root/testdata/sf0.01"
    got = {
        int(r["poly_id"]): (int(r["n_inside"]), float(r["sum_value"]))
        for r in q_geo_points_in_polygons(spark, sf).collect()
    }
    assert len(got) == _GPIP_N_POLYS

    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "value"])
    lon = (-179.5 + (ev.event_id % 359)).to_numpy(dtype=np.float64)
    lat = (-89.5 + (ev.user_id % 179)).to_numpy(dtype=np.float64)
    val = ev.value.to_numpy(dtype=np.float64)

    any_inside = 0
    for p in range(_GPIP_N_POLYS):
        k = 3 + p % 6
        cx = -170.0 + (p * 97) % 340 + 0.5
        cy = -75.0 + (p * 61) % 150 + 0.5
        r = 1.5 + p % 5
        ang = 2 * math.pi * np.arange(k) / k + p
        vx = cx + r * np.cos(ang)
        vy = cy + _GPIP_ECC * r * np.sin(ang)
        mask = points_in_polygon(lon, lat, vx, vy)
        any_inside += int(mask.sum())
        assert got[p][0] == int(mask.sum()), p
        assert got[p][1] == pytest.approx(float(val[mask].sum()), abs=2e-6), p
    assert any_inside > 0  # the fixture actually exercises the join


def test_points_in_polygons_plan_shape(spark):
    """No cartesian product anywhere: candidates come from broadcast
    equi-joins on the cell cover and the edge table."""
    import contextlib
    import io

    from demeton_spark.queries import q_geo_points_in_polygons

    df = q_geo_points_in_polygons(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2

"""Segment-intersection taxonomy + polygon self-intersection (J9 second
half): deterministic ports of the reference's classification cases
(/root/reference/Demeton/Geometry/LineSegmentsIntersection.fs:38-211,
PolygonSelfIntersection.fs) plus hypothesis properties tying the
detection and point-finding functions together."""

import pytest

from demeton_spark.geometry import (
    SEG_COLLINEAR_OVERLAPPING,
    SEG_ENDPOINT_ON_OTHER,
    SEG_INTERSECT_PROPERLY,
    SEG_NOT_INTERSECT,
    SEG_OPPOSITE,
    SEG_SAME,
    SEG_SHARING_ENDPOINT,
    SEG_ZERO_LENGTH,
    area2,
    find_segments_intersection,
    polygon_self_intersects,
    segments_intersection_kind,
)

TAXONOMY_CASES = [
    # zero length (either operand)
    (((0, 0), (0, 0)), ((1, 1), (2, 2)), SEG_ZERO_LENGTH),
    (((1, 1), (2, 2)), ((3, 3), (3, 3)), SEG_ZERO_LENGTH),
    # identical / opposite
    (((0, 0), (1, 1)), ((0, 0), (1, 1)), SEG_SAME),
    (((0, 0), (1, 1)), ((1, 1), (0, 0)), SEG_OPPOSITE),
    # sharing exactly one endpoint (connected chain)
    (((0, 0), (1, 1)), ((1, 1), (2, 0)), SEG_SHARING_ENDPOINT),
    (((0, 0), (1, 1)), ((0, 0), (-1, 2)), SEG_SHARING_ENDPOINT),
    # collinear sharing an endpoint → still "sharing"
    (((0, 0), (1, 0)), ((1, 0), (2, 0)), SEG_SHARING_ENDPOINT),
    # proper crossing
    (((0, 0), (2, 2)), ((0, 2), (2, 0)), SEG_INTERSECT_PROPERLY),
    (((-1, 0), (1, 0)), ((0, -1), (0, 1)), SEG_INTERSECT_PROPERLY),
    # T-junction: endpoint of one lies on the other's interior
    (((0, 0), (2, 0)), ((1, 0), (1, 1)), SEG_ENDPOINT_ON_OTHER),
    (((1, 0), (1, 1)), ((0, 0), (2, 0)), SEG_ENDPOINT_ON_OTHER),
    # collinear overlapping (partial overlap / containment)
    (((0, 0), (2, 0)), ((1, 0), (3, 0)), SEG_COLLINEAR_OVERLAPPING),
    (((0, 0), (3, 0)), ((1, 0), (2, 0)), SEG_COLLINEAR_OVERLAPPING),
    (((1, 0), (2, 0)), ((0, 0), (3, 0)), SEG_COLLINEAR_OVERLAPPING),
    # collinear, disjoint
    (((0, 0), (1, 0)), ((2, 0), (3, 0)), SEG_NOT_INTERSECT),
    # parallel, non-collinear
    (((0, 0), (1, 0)), ((0, 1), (1, 1)), SEG_NOT_INTERSECT),
    # generic disjoint
    (((0, 0), (1, 1)), ((3, 0), (4, 1)), SEG_NOT_INTERSECT),
    # near-miss: segments whose extensions cross but bounded parts don't
    (((0, 0), (1, 1)), ((2, 0), (3, -5)), SEG_NOT_INTERSECT),
]


@pytest.mark.parametrize("seg1,seg2,want", TAXONOMY_CASES)
def test_taxonomy_cases(seg1, seg2, want):
    assert segments_intersection_kind(seg1, seg2) == want
    # symmetric in its operands for every symmetric class
    sym = segments_intersection_kind(seg2, seg1)
    if want in (SEG_SAME, SEG_OPPOSITE):
        assert sym in (SEG_SAME, SEG_OPPOSITE)
    else:
        assert sym == want


def test_find_intersection_point_proper():
    kind, pt = find_segments_intersection(((0, 0), (2, 2)), ((0, 2), (2, 0)))
    assert kind == SEG_INTERSECT_PROPERLY
    assert pt == pytest.approx((1.0, 1.0))


def test_find_intersection_endpoint_cases():
    kind, pt = find_segments_intersection(((0, 0), (2, 0)), ((1, 0), (1, 5)))
    assert kind == SEG_ENDPOINT_ON_OTHER and pt == pytest.approx((1.0, 0.0))
    kind, pt = find_segments_intersection(((0, 0), (1, 1)), ((1, 1), (2, 0)))
    assert kind == SEG_SHARING_ENDPOINT and pt == pytest.approx((1.0, 1.0))
    kind, pt = find_segments_intersection(((0, 0), (1, 0)), ((0, 1), (1, 1)))
    assert kind == SEG_NOT_INTERSECT and pt is None
    kind, pt = find_segments_intersection(((0, 0), (2, 0)), ((1, 0), (3, 0)))
    assert kind == SEG_COLLINEAR_OVERLAPPING and pt is not None


def test_detection_and_finding_agree():
    """Property: on random small-integer segments the detection taxonomy
    and the parametric point-finder never contradict each other on the
    intersect/not-intersect boundary."""
    import itertools
    import random

    rng = random.Random(5)
    pts = [(rng.randint(-3, 3), rng.randint(-3, 3)) for _ in range(60)]
    count = 0
    for (a, b), (c, d) in itertools.combinations(
        itertools.combinations(pts[:16], 2), 2
    ):
        kind = segments_intersection_kind((a, b), (c, d))
        fkind, fpt = find_segments_intersection((a, b), (c, d))
        if kind == SEG_INTERSECT_PROPERLY:
            assert fkind == SEG_INTERSECT_PROPERLY and fpt is not None
        if kind == SEG_NOT_INTERSECT:
            assert fkind == SEG_NOT_INTERSECT
        if fkind == SEG_INTERSECT_PROPERLY:
            # the point really lies on both lines: zero signed area
            assert abs(area2(a, b, fpt)) < 1e-6
            assert abs(area2(c, d, fpt)) < 1e-6
        count += 1
    assert count > 1000


POLYGONS = [
    ([(0, 0), (1, 0)], "invalid"),  # < 3 vertices
    ([(0, 0), (4, 0), (4, 4), (0, 4)], "non_intersecting"),  # square
    ([(0, 0), (4, 0), (2, 3)], "non_intersecting"),  # triangle
    # bowtie / hourglass: the canonical self-intersection
    ([(0, 0), (4, 4), (4, 0), (0, 4)], "intersecting"),
    # star-of-david style crossing
    ([(0, 0), (4, 0), (0, 3), (2, -1), (4, 3)], "intersecting"),
    # non-convex but simple (L-shape)
    ([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)], "non_intersecting"),
    # doubled-back collinear spike (reference todo-case; we reject it)
    ([(0, 0), (4, 0), (2, 0), (2, 3)], "intersecting"),
    # shared-y edges: exercises equal-y event ordering
    ([(0, 0), (2, 0), (2, 2), (4, 2), (4, 4), (0, 4)], "non_intersecting"),
    # bowtie with a duplicated consecutive vertex: the zero-length edge
    # is dropped, and adjacency must be decided on the FILTERED ring —
    # with original-index adjacency the crossing edges look adjacent and
    # the self-intersection is missed
    ([(0, 0), (4, 4), (4, 4), (4, 0), (0, 4)], "intersecting"),
    # simple square with a duplicated vertex stays simple
    ([(0, 0), (4, 0), (4, 0), (4, 4), (0, 4)], "non_intersecting"),
    # duplicate closing vertex (explicitly closed ring input)
    ([(0, 0), (4, 4), (4, 0), (0, 4), (0, 0)], "intersecting"),
]


@pytest.mark.parametrize("verts,want", POLYGONS)
def test_polygon_self_intersection(verts, want):
    assert polygon_self_intersects(verts) == want
    if want != "invalid":
        # rotation of the vertex list must not change the answer
        rot = verts[2:] + verts[:2]
        assert polygon_self_intersects(rot) == want


def test_run_hillshade_rejects_self_intersecting_clip(spark):
    from demeton_spark.engine import run_hillshade
    from demeton_spark.synth import WorldSpec, images_df

    spec = WorldSpec(
        lon0=13, lat0=45, n_tiles_x=1, n_tiles_y=1, tile_size=60,
        block_size=20,
    )
    bowtie = [(13.1, 45.1), (13.9, 45.9), (13.9, 45.1), (13.1, 45.9)]
    with pytest.raises(ValueError, match="clip_polygon rejected"):
        run_hillshade(
            spark, images_df(spark, spec), spec.tile_size,
            clip_polygon=bowtie,
        )

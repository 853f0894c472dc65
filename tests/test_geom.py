"""Geometry kernel tests: parser, beziers, arcs, transforms, hulls."""

import numpy as np
import pytest

from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.geom import bezier, arc
from svgrasterize_tpu.geom.hull import ConvexHull
from svgrasterize_tpu.geom.path import (
    Path,
    PATH_CLOSED,
    PATH_CUBIC,
    PATH_LINE,
    PATH_QUAD,
    PATH_UNCLOSED,
)


# --- path parser -------------------------------------------------------------
def test_parse_lines_and_close():
    path = Path.from_svg("M1,2 L3,4 5,6 z")
    (sub,) = path.subpaths
    kinds = [k for k, _ in sub]
    assert kinds == [PATH_LINE, PATH_LINE, PATH_CLOSED]
    assert sub[0][1] == [[1, 2], [3, 4]]
    assert sub[1][1] == [[3, 4], [5, 6]]
    assert sub[2][1] == [[5, 6], [1, 2]]


def test_parse_relative_and_hv():
    path = Path.from_svg("m1,1 h2 v3 l-1,-1")
    (sub,) = path.subpaths
    assert sub[0][1] == [[1, 1], [3, 1]]
    assert sub[1][1] == [[3, 1], [3, 4]]
    assert sub[2][1] == [[3, 4], [2, 3]]
    assert sub[3][0] == PATH_UNCLOSED


def test_parse_smooth_cubic_reflection():
    path = Path.from_svg("M0,0 C1,1 2,1 3,0 S5,-1 6,0")
    (sub,) = path.subpaths
    c1 = sub[0]
    c2 = sub[1]
    assert c1[0] == PATH_CUBIC
    # reflected control: 2*(3,0) - (2,1) = (4,-1)
    assert c2[1][1] == [4, -1]


def test_parse_smooth_quad_reflection():
    path = Path.from_svg("M0,0 Q1,2 2,0 T4,0")
    (sub,) = path.subpaths
    assert sub[1][0] == PATH_QUAD
    assert sub[1][1][1] == [3, -2]  # 2*(2,0)-(1,2)


def test_parse_multiple_subpaths_and_implicit_lineto():
    path = Path.from_svg("M0,0 1,1 M5,5 6,6z")
    assert len(path.subpaths) == 2
    assert path.subpaths[0][0][0] == PATH_LINE
    assert path.subpaths[1][-1][0] == PATH_CLOSED


def test_parse_matches_reference(reference):
    cases = [
        "M1,2 L3,4 Q5,6 7,8 C1,2 3,4 5,6 z",
        "m10,10 c1,1 2,2 3,3 s1,1 2,2 t5,5",
        "M0,0 H10 V10 H0 z m2,2 6,0 0,6 -6,0 z",
        "M300,200 a25,50 -30 0,1 50,-25 z",
        "M600,350 l 50,-25 a25,25 -30 0,1 50,-25 l 50,-25",
    ]
    for case in cases:
        ours = Path.from_svg(case)
        theirs = reference.Path.from_svg(case)
        assert len(ours.subpaths) == len(theirs.subpaths)
        for sub_a, sub_b in zip(ours.subpaths, theirs.subpaths):
            assert len(sub_a) == len(sub_b), case
            for (ka, pa), (kb, pb) in zip(sub_a, sub_b):
                assert ka == kb, case
                if ka == 3:  # ARC: (center, rx, ry, phi, eta, eta_delta)
                    np.testing.assert_allclose(pa[0], pb[0], atol=1e-9)
                    np.testing.assert_allclose(pa[1:], pb[1:], atol=1e-9)
                else:
                    np.testing.assert_allclose(pa, pb, atol=1e-9)


def test_svg_roundtrip():
    src = "M1,2 L3,4 Q5,6 7,8 C1,2 3,4 5,6 z"
    path = Path.from_svg(src)
    again = Path.from_svg(path.to_svg())
    for sub_a, sub_b in zip(path.subpaths, again.subpaths):
        for (ka, pa), (kb, pb) in zip(sub_a, sub_b):
            assert ka == kb
            np.testing.assert_allclose(pa, pb, atol=1e-9)


# --- bezier flattening ---------------------------------------------------------
def test_flatten_within_tolerance():
    curve = np.array([[0, 0], [30, 60], [70, -60], [100, 0]], dtype=np.float64)
    tol = 0.1
    lines = bezier.flatten_cubics(curve[None], tol)
    # endpoints are chained and pinned
    np.testing.assert_allclose(lines[0, 0], [0, 0])
    np.testing.assert_allclose(lines[-1, 1], [100, 0])
    np.testing.assert_allclose(lines[1:, 0], lines[:-1, 1])
    # every chord midpoint stays within tolerance of the curve (the
    # adaptive flatten subdivides non-uniformly in t, so measure against a
    # dense sampling of the curve rather than assuming uniform chords)
    n = len(lines)
    ts = np.linspace(0.0, 1.0, 4096)
    on_curve = bezier.cubic_eval(np.broadcast_to(curve, (len(ts), 4, 2)), ts)
    chord_mid = lines.mean(axis=1)
    dist = np.linalg.norm(
        on_curve[None, :, :] - chord_mid[:, None, :], axis=-1
    ).min(axis=1)
    assert dist.max() <= tol + 1e-2  # sampling granularity slack


def test_quad_to_cubic_exact():
    quad = np.array([[0, 0], [5, 10], [10, 0]], dtype=np.float64)
    cubic = bezier.quad_to_cubic(quad)
    for t in np.linspace(0, 1, 7):
        q = (1 - t) ** 2 * quad[0] + 2 * (1 - t) * t * quad[1] + t**2 * quad[2]
        c = bezier.cubic_eval(cubic, np.asarray(t))
        np.testing.assert_allclose(c, q, atol=1e-12)


# --- arcs ---------------------------------------------------------------------
def test_arc_endpoint_conversion_matches_reference(reference):
    cases = [
        ((0, 0), (10, 10), 10, 10, 0, False, True),
        ((0, 0), (10, 10), 10, 10, 0, True, False),
        ((5, 3), (1, 9), 7, 4, 30, True, True),
        ((0, 0), (1, 0), 0.4, 0.4, 0, False, False),  # radii scale-up
    ]
    for src, dst, rx, ry, rot, large, sweep in cases:
        ours = arc.endpoint_to_center(src, dst, rx, ry, rot, large, sweep)
        theirs = reference.arc_svg_to_parametric(src, dst, rx, ry, rot, large, sweep)
        np.testing.assert_allclose(ours[0], theirs[0], atol=1e-9)
        np.testing.assert_allclose(ours[1:], theirs[1:], atol=1e-9)


def test_arc_to_cubic_accuracy():
    params = arc.endpoint_to_center((10, 0), (0, 10), 10, 10, 0, False, True)
    cubics = arc.to_cubics(*params)
    # sample each cubic, all points must lie on the circle radius 10
    for cubic in cubics:
        for t in np.linspace(0, 1, 9):
            p = bezier.cubic_eval(cubic, np.asarray(t))
            np.testing.assert_allclose(np.linalg.norm(p - params[0]), 10.0, atol=2e-3)


# --- transforms -----------------------------------------------------------------
def test_transform_compose_and_invert():
    tr = Transform().translate(3, 4).rotate(0.5).scale(2, 3).skew(0.1, 0.2)
    pts = np.random.default_rng(0).uniform(-5, 5, (10, 2))
    round_trip = tr.invert(tr(pts))
    np.testing.assert_allclose(round_trip, pts, atol=1e-12)


def test_hull_bbox():
    pts = [[0, 0], [10, 0], [10, 5], [0, 5], [5, 2]]
    hull = ConvexHull(pts)
    assert len(hull.points) == 4
    x, y, w, h = hull.bbox(Transform())
    assert (x, y, w, h) == (0, 0, 10, 5)


def test_parse_merged_arc_flags():
    """SVG 1.1 grammar: arc flags are single [01] chars needing no
    separator — minified "a25 25 0 0175 25" must parse (the reference
    documents that it breaks here, svgrasterize.py:1372-1374)."""
    from svgrasterize_tpu.geom.path import Path

    spaced = Path.from_svg("M0 0 a25 25 0 0 1 75 25 Z")
    merged = Path.from_svg("M0 0 a25 25 0 0175 25 Z")
    assert repr(spaced) == repr(merged)

    # both flags merged with the x coordinate
    spaced2 = Path.from_svg("M10 10 A30 40 15 1 0 50 60")
    merged2 = Path.from_svg("M10 10A30 40 15 1050 60")
    assert repr(spaced2) == repr(merged2)

    # flag merged with a fractional number: flag '0', then x = .5
    spaced3 = Path.from_svg("M0 0 a5 5 0 0 0 .5 6")
    merged3 = Path.from_svg("M0 0 a5 5 0 00.5 6")
    assert repr(spaced3) == repr(merged3)

    import pytest

    with pytest.raises(ValueError):
        Path.from_svg("M0 0 a5 5 0 2 0 10 10")  # flag must be 0/1

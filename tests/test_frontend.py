"""Frontend tests: value parsers and scene building vs the reference oracle."""

import numpy as np
import pytest

from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.frontend import parsers
from svgrasterize_tpu.frontend.svg import (
    ellipse_path_data,
    rect_path_data,
    scene_from_str,
    viewbox_transform,
)


# ------------------------------------------------------------------------------
# parsers
# ------------------------------------------------------------------------------
COLORS = [
    "#fff",
    "#123456",
    "#12345678",
    "#abcd",
    "rgb(255, 0, 0)",
    "rgb(10%, 20%, 30%)",
    "rgba(255, 0, 0, 0.5)",
    "steelblue",
    "Tomato",
    "none-such-color",
]


def test_parse_color_matches_reference(reference):
    for text in COLORS:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ours = parsers.parse_color(text)
            theirs = reference.svg_color(text)
        if theirs is None:
            assert ours is None, text
        else:
            assert ours is not None, text
            np.testing.assert_allclose(ours, theirs, atol=1e-12, err_msg=text)


TRANSFORMS = [
    "translate(10, 20)",
    "translate(5)",
    "scale(2)",
    "scale(2, 3)",
    "rotate(45)",
    "rotate(30, 10, 10)",
    "skewX(10)",
    "skewY(-10)",
    "matrix(1, 2, 3, 4, 5, 6)",
    "translate(1,2) rotate(90) scale(3)",
]


def test_parse_transform_matches_reference(reference):
    for text in TRANSFORMS:
        ours = parsers.parse_transform(text)
        theirs = reference.svg_transform(text)
        np.testing.assert_allclose(ours.m, theirs.m, atol=1e-12, err_msg=text)


def test_parse_size_units(reference):
    for text in ["10", "10px", "1in", "2.54cm", "25.4mm", "72pt", "6pc", "2em", "4ex"]:
        assert parsers.parse_size(text) == pytest.approx(reference.svg_size(text))


def test_parse_float_percent():
    assert parsers.parse_float("50%") == 0.5
    assert parsers.parse_float("12px") == 12
    assert parsers.parse_float(None) is None


def test_viewbox_transform_matches_reference(reference):
    cases = [
        ((0, 0, 100, 50), (0, 0, 200, 100)),
        ((0, 0, 100, None), (0, 0, 200, 100)),
        ((0, 0, None, None), (10, 10, 50, 50)),
        ((5, 5, 60, 60), (0, 0, 30, 40)),
    ]
    for bbox, viewbox in cases:
        ours = viewbox_transform(bbox, viewbox)
        theirs = reference.svg_viewbox_transform(bbox, viewbox)
        np.testing.assert_allclose(ours.m, theirs.m, atol=1e-12)


# ------------------------------------------------------------------------------
# shape lowering
# ------------------------------------------------------------------------------
def _same_geometry(ours_data: str, ref_data: str):
    """Parse both path strings and compare segment structure + coordinates."""
    from svgrasterize_tpu.geom.path import Path

    ours = Path.from_svg(ours_data)
    ref = Path.from_svg(ref_data)
    assert len(ours.subpaths) == len(ref.subpaths)
    for sub_o, sub_r in zip(ours.subpaths, ref.subpaths):
        assert len(sub_o) == len(sub_r)
        for (k_o, pts_o), (k_r, pts_r) in zip(sub_o, sub_r):
            assert k_o == k_r
            if k_o == 3:  # ARC payload: (center, rx, ry, phi, eta, eta_delta)
                np.testing.assert_allclose(pts_o[0], pts_r[0], atol=1e-9)
                assert pts_o[1:] == pytest.approx(pts_r[1:])
            else:
                np.testing.assert_allclose(pts_o, pts_r, atol=1e-9)


def test_rect_path_data_matches_reference(reference):
    assert rect_path_data(1, 2, 30, 40) == reference.svg_rect_to_path(1, 2, 30, 40)
    _same_geometry(
        rect_path_data(0, 0, 10, 10, 2, 3), reference.svg_rect_to_path(0, 0, 10, 10, 2, 3)
    )


def test_ellipse_path_data_matches_reference(reference):
    _same_geometry(ellipse_path_data(5, 5, 3, 4), reference.svg_ellipse_to_path(5, 5, 3, 4))
    _same_geometry(ellipse_path_data(0, 0, 7, 7), reference.svg_ellipse_to_path(0, 0, 7, 7))


# ------------------------------------------------------------------------------
# scene building
# ------------------------------------------------------------------------------
SVG_DOC = """
<svg xmlns="http://www.w3.org/2000/svg" width="100" height="80" viewBox="0 0 50 40">
  <defs>
    <linearGradient id="lg" x1="0" y1="0" x2="1" y2="0">
      <stop offset="0" stop-color="red"/>
      <stop offset="1" stop-color="blue" stop-opacity="0.5"/>
    </linearGradient>
    <clipPath id="cp"><circle cx="25" cy="20" r="10"/></clipPath>
  </defs>
  <g transform="translate(5,5)" opacity="0.8">
    <rect x="0" y="0" width="20" height="10" fill="url(#lg)"/>
    <path d="M0 0 L10 0 L10 10 Z" fill="#0f0" clip-path="url(#cp)"/>
    <line x1="0" y1="0" x2="10" y2="10" stroke="black" stroke-width="2"/>
  </g>
  <use href="#missing"/>
</svg>
"""


def test_scene_structure_vs_reference(reference):
    import warnings

    scene, ids, size = scene_from_str(SVG_DOC)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_scene, ref_ids, ref_size = reference.svg_scene_from_str(SVG_DOC)
    assert size == tuple(ref_size)
    assert set(ids) == set(ref_ids)

    ours = repr(scene)
    # same node kinds in the same order (coordinates formatted the same way)
    import re

    def skeleton(text):
        return [line.split()[0] for line in text.splitlines() if line.strip()]

    assert skeleton(ours) == skeleton(repr(ref_scene))


def test_scene_gradient_registered():
    from svgrasterize_tpu.paint import GradLinear

    _scene, ids, _size = scene_from_str(SVG_DOC)
    assert isinstance(ids["lg"], GradLinear)
    assert len(ids["lg"].stops) == 2
    assert isinstance(ids["cp"], tuple)


def test_render_solid_doc_matches_reference(reference):
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="48" height="48">
      <rect x="4" y="4" width="24" height="20" fill="#336699"/>
      <path d="M8 40 L24 10 L40 40 Z" fill="green" fill-opacity="0.7"/>
    </svg>
    """
    scene, _ids, size = scene_from_str(doc)
    ref_scene, _rids, ref_size = reference.svg_scene_from_str(doc)

    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    layer, _hull = scene.render(tr, viewport=(0, 0, 48, 48))
    ref_tr = reference.Transform().matrix(0, 1, 0, 1, 0, 0)
    ref_layer, _ = ref_scene.render(ref_tr, viewport=[0, 0, 48, 48])

    ours = np.zeros((48, 48, 4))
    img = np.asarray(layer.convert(pre_alpha=True, linear_rgb=False).image)
    ours[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = img

    theirs = np.zeros((48, 48, 4))
    ref_layer = ref_layer.convert(pre_alpha=True, linear_rgb=False)
    x, y = ref_layer.offset
    theirs[x : x + ref_layer.image.shape[0], y : y + ref_layer.image.shape[1]] = ref_layer.image

    # interiors pixel-equal, AA edges within tolerance
    assert np.abs(ours - theirs).max() < 0.02


def test_symbol_via_use():
    # <symbol> renders only through <use>, scaled by its viewBox
    # (the reference lists symbol as NOT SUPPORTED)
    import numpy as np

    from svgrasterize_tpu.core.transform import Transform

    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
      <defs>
        <symbol id="s" viewBox="0 0 10 10">
          <rect x="1" y="1" width="8" height="8" fill="lime"/>
        </symbol>
      </defs>
      <use href="#s" x="8" y="8" width="40" height="40"/>
    </svg>
    """
    scene, _ids, _size = scene_from_str(doc)
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 64, 64)
    )
    img = np.zeros((64, 64, 4), np.float32)
    img[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = np.asarray(
        layer.convert(pre_alpha=False, linear_rgb=False).image
    )
    # 10-unit viewBox scaled into a 40px box at (8, 8): rect spans ~12..40
    assert img[24, 24, 1] > 0.9  # green interior
    assert img[24, 24, 3] > 0.9
    assert img[4, 4, 3] < 0.01  # outside the use box
    assert img[10, 10, 3] < 0.01  # inside use box, outside scaled rect


def test_markers_on_path():
    # markers are NOT SUPPORTED by the reference; placement per SVG 11.6.2
    import numpy as np

    from svgrasterize_tpu.core.transform import Transform

    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="120" height="80">
      <defs>
        <marker id="arrow" viewBox="0 0 10 10" refX="9" refY="5"
                markerWidth="6" markerHeight="6" orient="auto">
          <path d="M0 0 L10 5 L0 10 Z" fill="crimson"/>
        </marker>
        <marker id="dot" markerWidth="8" markerHeight="8" refX="4" refY="4"
                markerUnits="userSpaceOnUse">
          <circle cx="4" cy="4" r="3" fill="navy"/>
        </marker>
      </defs>
      <path d="M10 70 L50 20 L90 60 L110 10" fill="none" stroke="black"
            stroke-width="2" marker-start="url(#dot)" marker-mid="url(#dot)"
            marker-end="url(#arrow)"/>
    </svg>
    """
    scene, _ids, _size = scene_from_str(doc)
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 80, 120)
    )
    img = np.zeros((80, 120, 4), np.float32)
    img[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = np.asarray(
        layer.convert(pre_alpha=False, linear_rgb=False).image
    )
    # navy dots centered on the start and mid vertices
    assert img[70, 10, 2] > 0.4 and img[70, 10, 0] < 0.1
    assert img[20, 50, 2] > 0.4
    # crimson arrow near the end vertex, oriented along the last segment
    crimson = (img[..., 0] > 0.6) & (img[..., 1] < 0.3) & (img[..., 3] > 0.4)
    ys, xs = np.nonzero(crimson)
    assert len(xs) > 10
    assert abs(xs.mean() - 107) < 4 and abs(ys.mean() - 16) < 4


def test_marker_viewport_overflow_clip():
    # UA default overflow: hidden clips marker content to the viewport
    # (SVG 1.1 14.3.3); overflow="visible" opts out
    import numpy as np

    from svgrasterize_tpu.core.transform import Transform

    base = """
    <svg xmlns="http://www.w3.org/2000/svg" width="120" height="60">
      <defs>
        <marker id="m" markerWidth="6" markerHeight="6" refX="3" refY="3"
                markerUnits="userSpaceOnUse"{OV}>
          <circle cx="3" cy="3" r="8" fill="red"/>
        </marker>
      </defs>
      <path d="M20 30 L100 30" stroke="black" stroke-width="1"
            marker-start="url(#m)" marker-end="url(#m)"/>
    </svg>
    """

    def red_area(doc):
        scene, _ids, _size = scene_from_str(doc)
        layer, _ = scene.render(
            Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 60, 120)
        )
        img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
        return int((img[..., 0] > 0.2).sum())

    clipped = red_area(base.replace("{OV}", ""))
    visible = red_area(base.replace("{OV}", ' overflow="visible"'))
    assert abs(clipped - 2 * 36) < 20  # two 6x6 viewports
    assert visible > 4 * clipped


def test_preserve_aspect_ratio():
    # "none" stretches; alignment anchors; default stays centered meet
    import numpy as np

    from svgrasterize_tpu.frontend.svg import viewbox_transform

    vb = (0, 0, 10, 10)
    # wide box, default: uniform scale 2, centered horizontally
    tr = viewbox_transform((0, 0, 40, 20), vb)
    np.testing.assert_allclose(tr(np.array([0.0, 0.0])), [10, 0], atol=1e-9)
    np.testing.assert_allclose(tr(np.array([10.0, 10.0])), [30, 20], atol=1e-9)
    # none: non-uniform stretch fills the box
    tr = viewbox_transform((0, 0, 40, 20), vb, "none")
    np.testing.assert_allclose(tr(np.array([10.0, 10.0])), [40, 20], atol=1e-9)
    # xMinYMin meet anchors at the origin
    tr = viewbox_transform((0, 0, 40, 20), vb, "xMinYMin meet")
    np.testing.assert_allclose(tr(np.array([0.0, 0.0])), [0, 0], atol=1e-9)
    np.testing.assert_allclose(tr(np.array([10.0, 10.0])), [20, 20], atol=1e-9)
    # slice covers: scale 4, centered -> viewbox overflows horizontally
    tr = viewbox_transform((0, 0, 40, 20), vb, "xMidYMid slice")
    np.testing.assert_allclose(tr(np.array([0.0, 0.0])), [0, -10], atol=1e-9)
    np.testing.assert_allclose(tr(np.array([10.0, 10.0])), [40, 30], atol=1e-9)


def test_css_style_blocks():
    # <style> sheets with tag/.class/#id selectors (the reference ignores
    # <style> entirely); cascade: presentation attrs < CSS < inline style
    import io

    import numpy as np

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='64' height='32'>
    <style>/* comment */ .warm { fill: #d04020; }
    rect.cool { fill: #2060c0; }
    #special { fill: #20a040; opacity: 0.5; }</style>
    <rect class='warm' x='2' y='2' width='16' height='28'/>
    <rect class='cool' x='22' y='2' width='16' height='28' fill='black'/>
    <rect id='special' class='warm' x='42' y='2' width='16' height='28'
          style='opacity:1'/>
    </svg>"""
    scene, _ids, _size = scene_from_xml(io.StringIO(svg))
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 32, 64)
    )
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    full = np.zeros((32, 64, 4), np.float32)
    full[
        layer.x : layer.x + img.shape[0], layer.y : layer.y + img.shape[1]
    ] = img[:32, :64]
    assert full[16, 10, 0] > 0.7              # .warm red
    assert full[16, 30, 2] > 0.7              # rect.cool beats fill='black'
    assert full[16, 50, 1] > 0.5              # #special (higher specificity)
    assert full[16, 50, 3] > 0.9              # inline style beats CSS opacity


def test_image_element_raster():
    # <image> with a data-URI PNG (beyond the reference: unknown element
    # there); lowers to a single-cell raster pattern so both the
    # interpreter and the batched executor draw it identically
    import base64
    import io

    import numpy as np

    import svgrasterize_tpu.render_plan as rp
    from svgrasterize_tpu.core.png import write_png
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    tile = np.zeros((4, 4, 4), np.uint8)
    tile[:2, :2] = [255, 0, 0, 255]
    tile[2:, 2:] = [255, 0, 0, 255]
    tile[:2, 2:] = [0, 0, 255, 255]
    tile[2:, :2] = [0, 0, 255, 255]
    uri = "data:image/png;base64," + base64.b64encode(
        write_png(tile).getvalue()
    ).decode()
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='64' height='64'>"
        f"<image href='{uri}' x='8' y='8' width='32' height='32'/></svg>"
    )
    scene, _ids, _size = scene_from_xml(io.StringIO(svg))
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    layer, _ = scene.render(tr, viewport=(0, 0, 64, 64))
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    full = np.zeros((64, 64, 4), np.float32)
    full[
        layer.x : layer.x + img.shape[0], layer.y : layer.y + img.shape[1]
    ] = img[: 64 - layer.x, : 64 - layer.y]
    assert full[12, 12, 0] > 0.7    # top-left quadrant red
    assert full[12, 36, 2] > 0.7    # top-right blue
    assert full[36, 12, 2] > 0.7    # bottom-left blue
    assert full[42, 42, 3] < 0.1    # outside the image box

    out = rp.render_fast(scene, tr, (0, 0, 64, 64), False)
    assert out is not None, "image scenes must lower to the batched path"
    img2 = np.asarray(out[0].convert(pre_alpha=False, linear_rgb=False).image)
    assert np.abs(img2[:64, :64] - full).max() < 0.02


def test_image_element_rotated():
    """A rotated <image> must rotate its CONTENT: the raster samples by
    inverse-mapped bilinear gather and the single-cell pattern anchors
    with the full transform (anchored=True keeps the translation a
    rotation-about-a-point carries; the translation-free quirk is for
    real <pattern> grids only)."""
    import base64
    import io

    import numpy as np

    import svgrasterize_tpu.render_plan as rp
    from svgrasterize_tpu.core.png import write_png
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    tile = np.zeros((4, 4, 4), np.uint8)
    tile[:, :, 3] = 255
    tile[:2, :2] = [255, 0, 0, 255]   # png top-left red
    tile[:2, 2:] = [0, 255, 0, 255]   # top-right green
    tile[2:, :] = [0, 0, 255, 255]    # bottom blue
    uri = "data:image/png;base64," + base64.b64encode(
        write_png(tile).getvalue()
    ).decode()
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='64' height='64'>"
        "<g transform='rotate(90 24 24)'>"
        f"<image href='{uri}' x='8' y='8' width='32' height='32'/></g></svg>"
    )
    scene, _ids, _size = scene_from_xml(io.StringIO(svg))
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    out = rp.render_fast(scene, tr, (0, 0, 64, 64), False)
    assert out is not None
    layer = out[0]
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    full = np.zeros((64, 64, 4), np.float32)
    full[layer.x : layer.x + img.shape[0], layer.y : layer.y + img.shape[1]] = (
        img[: 64 - layer.x, : 64 - layer.y]
    )
    # +90deg screen rotation about the box center: old BL -> TL, TL -> TR
    assert full[14, 14, 2] > 0.7   # TL blue (was bottom-left)
    assert full[14, 34, 0] > 0.7   # TR red (was top-left)
    assert full[34, 14, 2] > 0.7   # BL blue
    assert full[34, 34, 1] > 0.7   # BR green (was top-right)


def test_dash_closure_join():
    # SVG 11.4: on a closed subpath the trailing dash wraps the seam and
    # joins the leading dash instead of taking two caps
    import numpy as np

    from svgrasterize_tpu.geom.path import PATH_CLOSED, PATH_UNCLOSED, Path

    square = Path.from_svg("M0 0 L10 0 L10 10 L0 10 Z")
    dashed = square.dash([6, 4], offset=3)  # start lands mid-dash

    def run_points(sub):
        return [seg[1][0] for seg in sub] + [sub[-2][1][1]]

    seam_runs = [
        s
        for s in dashed.subpaths
        if any(np.allclose(q, [0, 0]) for q in run_points(s)[1:-1])
    ]
    assert len(seam_runs) == 1  # one merged run passes THROUGH the seam

    # a pattern that never switches off keeps the subpath closed
    solid = square.dash([100, 0])
    assert len(solid.subpaths) == 1
    assert solid.subpaths[0][-1][0] == PATH_CLOSED

    # open paths keep plain capped runs
    open_runs = Path.from_svg("M0 0 L40 0").dash([6, 4], offset=3)
    assert all(s[-1][0] == PATH_UNCLOSED for s in open_runs.subpaths)


def test_stroke_dasharray():
    # stroke dashing is absent from the reference entirely
    import numpy as np

    from svgrasterize_tpu.core.transform import Transform

    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="120" height="30">
      <line x1="10" y1="15" x2="110" y2="15" stroke="black" stroke-width="4"
            stroke-dasharray="10 6"/>
    </svg>
    """
    scene, _ids, _size = scene_from_str(doc)
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 30, 120)
    )
    img = np.zeros((30, 120, 4), np.float32)
    img[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = np.asarray(
        layer.convert(pre_alpha=False, linear_rgb=False).image
    )
    row = img[15, :, 3] > 0.5
    edges = np.flatnonzero(np.diff(np.concatenate([[0], row.astype(int), [0]])))
    runs = np.diff(edges.reshape(-1, 2), axis=1).ravel()
    assert len(runs) == 7  # 100px at 10-on/6-off: 6 full dashes + 4px remnant
    assert all(abs(r - 10) <= 1 for r in runs[:-1]) and runs[-1] <= 5


def test_stroke_miterlimit():
    # stroke-miterlimit carries through as a ("miter", limit) linejoin;
    # limit=1 bevels the sharp apex that the default limit 4 miters
    import numpy as np

    from svgrasterize_tpu.core.transform import Transform

    base = """<svg xmlns='http://www.w3.org/2000/svg' width='64' height='64'>
    <path d='M8 56 L32 12 L56 56' fill='none' stroke='black'
          stroke-width='6'{ML}/></svg>"""

    def area(doc):
        scene, _ids, _size = scene_from_str(doc)
        layer, _ = scene.render(
            Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 64, 64)
        )
        img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
        return int((img[..., 3] > 0.5).sum())

    default = area(base.replace("{ML}", ""))
    limited = area(base.replace("{ML}", " stroke-miterlimit='1'"))
    assert limited < default
    assert area(base.replace("{ML}", " stroke-miterlimit='20'")) >= default


def test_percentage_lengths_viewport_relative():
    """Viewport-relative % lengths (SVG 1.1 7.10) — the reference warns
    and mis-scales these (svgrasterize.py:3546-3548)."""
    import warnings as _w

    from svgrasterize_tpu import scene_from_str

    pct = """<svg xmlns='http://www.w3.org/2000/svg' width='200' height='100'>
      <rect x='10%' y='20%' width='50%' height='30%' fill='red'/>
      <circle cx='50%' cy='50%' r='10%' fill='blue'/>
      <line x1='0%' y1='0%' x2='100%' y2='100%' stroke='black'/>
    </svg>"""
    import math

    diag = math.hypot(200, 100) / math.sqrt(2)
    explicit = f"""<svg xmlns='http://www.w3.org/2000/svg' width='200' height='100'>
      <rect x='20' y='20' width='100' height='30' fill='red'/>
      <circle cx='100' cy='50' r='{0.10 * diag}' fill='blue'/>
      <line x1='0' y1='0' x2='200' y2='100' stroke='black'/>
    </svg>"""
    with _w.catch_warnings():
        _w.simplefilter("error")  # no "percentage" warnings allowed
        scene_p, _ids, size_p = scene_from_str(pct)
    scene_e, _ids, size_e = scene_from_str(explicit)
    assert tuple(size_p) == tuple(size_e) == (200, 100)
    assert repr(scene_p) == repr(scene_e)


def test_percentage_root_svg_against_viewbox():
    """width='100%' on a standalone root resolves against its viewBox
    (rust.svg's header) instead of warning."""
    import warnings as _w

    from svgrasterize_tpu import scene_from_str

    doc = """<svg xmlns='http://www.w3.org/2000/svg' width='100%' height='100%'
      viewBox='0 0 400 300'><rect width='50%' height='50%' fill='green'/></svg>"""
    with _w.catch_warnings():
        _w.simplefilter("error")
        scene, _ids, size = scene_from_str(doc)
    assert tuple(size) == (400, 300)
    assert scene is not None


# ------------------------------------------------------------------------------
# display / visibility / <switch> conditional processing (beyond the reference)
# ------------------------------------------------------------------------------
def _scene_of(doc: str):
    scene, _ids, _size = scene_from_str(doc)
    return scene


def test_display_none_removes_subtree():
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect width="10" height="10" fill="red" display="none"/>
      <g style="display:none"><circle cx="5" cy="5" r="4" fill="blue"/></g>
      <rect x="12" width="10" height="10" fill="green"/>
    </svg>"""
    visible = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect x="12" width="10" height="10" fill="green"/>
    </svg>"""
    assert repr(_scene_of(doc)) == repr(_scene_of(visible))


def test_display_none_does_not_break_references():
    # display on definition elements must not stop their registration
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <defs style="display:none">
        <linearGradient id="lg"><stop offset="0" stop-color="red"/>
        <stop offset="1" stop-color="blue"/></linearGradient>
      </defs>
      <rect width="32" height="32" fill="url(#lg)"/>
    </svg>"""
    scene, ids, _size = scene_from_str(doc)
    assert scene is not None and "lg" in ids


def test_visibility_hidden_and_child_override():
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect width="10" height="10" fill="red" visibility="hidden"/>
      <g visibility="hidden">
        <rect x="12" width="10" height="10" fill="blue"/>
        <rect x="24" width="6" height="6" fill="green" visibility="visible"/>
      </g>
    </svg>"""
    visible = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <g>
        <rect x="24" width="6" height="6" fill="green" visibility="visible"/>
      </g>
    </svg>"""
    assert repr(_scene_of(doc)) == repr(_scene_of(visible))


def test_switch_picks_first_passing_child():
    # the Illustrator vector-fallback idiom: the first child requires an
    # unimplemented extension, the plain <g> fallback renders
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <switch>
        <title>pick one</title>
        <g requiredExtensions="http://ns.adobe.com/AdobeIllustrator/10.0/">
          <rect width="10" height="10" fill="red"/>
        </g>
        <g><rect x="12" width="10" height="10" fill="green"/></g>
        <g><rect x="24" width="6" height="6" fill="blue"/></g>
      </switch>
    </svg>"""
    visible = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <g><rect x="12" width="10" height="10" fill="green"/></g>
    </svg>"""
    assert repr(_scene_of(doc)) == repr(_scene_of(visible))


def test_switch_system_language():
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <switch>
        <rect width="8" height="8" fill="red" systemLanguage="fr,de"/>
        <rect x="10" width="8" height="8" fill="green" systemLanguage="en-US"/>
        <rect x="20" width="8" height="8" fill="blue"/>
      </switch>
    </svg>"""
    visible = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect x="10" width="8" height="8" fill="green" systemLanguage="en-US"/>
    </svg>"""
    assert repr(_scene_of(doc)) == repr(_scene_of(visible))


def test_conditional_attrs_outside_switch():
    from svgrasterize_tpu.frontend.svg import conditional_ok

    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect width="8" height="8" fill="red" systemLanguage="zh"/>
      <rect x="10" width="8" height="8" fill="green"
            requiredFeatures="http://www.w3.org/TR/SVG11/feature#Shape"/>
      <rect x="20" width="8" height="8" fill="blue" requiredFeatures=""/>
    </svg>"""
    visible = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect x="10" width="8" height="8" fill="green"/>
    </svg>"""
    assert repr(_scene_of(doc)) == repr(_scene_of(visible))
    assert conditional_ok({})
    assert not conditional_ok({"requiredExtensions": ""})
    assert conditional_ok({"systemLanguage": "en-GB"})
    assert not conditional_ok({"requiredFeatures": "urn:unknown"})


def test_anchor_renders_children():
    # <a> is a transparent container (the reference drops its children)
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <a href="https://example.org" transform="translate(2,2)">
        <rect width="10" height="10" fill="green"/>
      </a>
    </svg>"""
    visible = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <g transform="translate(2,2)">
        <rect width="10" height="10" fill="green"/>
      </g>
    </svg>"""
    assert repr(_scene_of(doc)) == repr(_scene_of(visible))


def test_forward_references_defs_at_end():
    # url(#)/href targets declared AFTER their use (defs-at-end exports);
    # the reference walks sequentially and drops all of them
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect width="16" height="16" fill="url(#lg)"/>
      <use href="#sym" x="16" y="16" width="16" height="16"/>
      <rect x="16" width="16" height="16" clip-path="url(#cp)" fill="green"/>
      <defs>
        <linearGradient id="lg"><stop offset="0" stop-color="red"/>
        <stop offset="1" stop-color="blue"/></linearGradient>
        <symbol id="sym" viewBox="0 0 8 8">
          <circle cx="4" cy="4" r="3" fill="black"/>
        </symbol>
        <clipPath id="cp"><rect x="18" width="8" height="8"/></clipPath>
      </defs>
    </svg>"""
    fwd, ids, _size = scene_from_str(doc)
    assert {"lg", "sym", "cp"} <= set(ids)
    reordered = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <defs>
        <linearGradient id="lg"><stop offset="0" stop-color="red"/>
        <stop offset="1" stop-color="blue"/></linearGradient>
        <symbol id="sym" viewBox="0 0 8 8">
          <circle cx="4" cy="4" r="3" fill="black"/>
        </symbol>
        <clipPath id="cp"><rect x="18" width="8" height="8"/></clipPath>
      </defs>
      <rect width="16" height="16" fill="url(#lg)"/>
      <use href="#sym" x="16" y="16" width="16" height="16"/>
      <rect x="16" width="16" height="16" clip-path="url(#cp)" fill="green"/>
    </svg>"""
    assert repr(fwd) == repr(_scene_of(reordered))


def test_forward_gradient_href_chain():
    # a gradient inheriting stops from one declared later in the document
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="16" height="16">
      <rect width="16" height="16" fill="url(#a)"/>
      <linearGradient id="a" href="#b" x1="0" x2="1"/>
      <linearGradient id="b"><stop offset="0" stop-color="red"/>
      <stop offset="1" stop-color="blue"/></linearGradient>
    </svg>"""
    scene, ids, _size = scene_from_str(doc)
    assert len(ids["a"].stops) == 2

    # the rect (earlier in document order) must hold the RESOLVED gradient,
    # not a stale 0-stop pre-pass registration
    from svgrasterize_tpu.scene import RENDER_FILL

    def first_fill_paint(node):
        kind, args = node
        if kind == RENDER_FILL:
            return args[1]
        for child in args:
            if isinstance(child, tuple) and len(child) == 2:
                found = first_fill_paint(child)
                if found is not None:
                    return found
        return None

    paint = first_fill_paint(scene)
    assert paint is not None and len(paint.stops) == 2


def test_forward_gradient_href_chain_deep():
    # depth-4 forward href chain a->b->c->d, all declared after the consumer:
    # the pre-pass must run one repair round per link (a fixed 2 rounds left
    # the consumer holding a stale 0-stop 'a' and rendered an empty scene)
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="16" height="16">
      <rect width="16" height="16" fill="url(#a)"/>
      <linearGradient id="a" href="#b" x1="0" x2="1"/>
      <linearGradient id="b" href="#c"/>
      <linearGradient id="c" href="#d"/>
      <linearGradient id="d"><stop offset="0" stop-color="red"/>
      <stop offset="1" stop-color="blue"/></linearGradient>
    </svg>"""
    scene, ids, _size = scene_from_str(doc)
    assert len(ids["a"].stops) == 2

    from svgrasterize_tpu.scene import RENDER_FILL

    def first_fill_paint(node):
        kind, args = node
        if kind == RENDER_FILL:
            return args[1]
        for child in args:
            if isinstance(child, tuple) and len(child) == 2:
                found = first_fill_paint(child)
                if found is not None:
                    return found
        return None

    paint = first_fill_paint(scene)
    assert paint is not None and len(paint.stops) == 2


def test_paint_order_stroke_first():
    # paint-order="stroke" paints the stroke UNDER the fill (SVG 2; the
    # outlined-text idiom).  Scene order must flip, nothing else.
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect width="16" height="16" fill="green" stroke="black"
            stroke-width="4" paint-order="stroke"/>
    </svg>"""
    normal = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <rect width="16" height="16" fill="green" stroke="black"
            stroke-width="4"/>
    </svg>"""
    from svgrasterize_tpu.scene import RENDER_FILL, RENDER_STROKE

    def kinds(scene):
        kind, args = scene
        if kind in (RENDER_FILL, RENDER_STROKE):
            return [kind]
        out = []
        for child in args:
            if isinstance(child, tuple) and len(child) == 2:
                out.extend(kinds(child))
        return out

    assert kinds(_scene_of(normal)) == [RENDER_FILL, RENDER_STROKE]
    assert kinds(_scene_of(doc)) == [RENDER_STROKE, RENDER_FILL]


def test_forward_use_of_plain_shape():
    # <use> of an id-bearing shape declared later, outside any <defs>
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <use href="#star" x="16"/>
      <path id="star" d="M4 12 L8 4 L12 12 Z" fill="purple"/>
    </svg>"""
    backward = """
    <svg xmlns="http://www.w3.org/2000/svg" width="32" height="32">
      <path id="star" d="M4 12 L8 4 L12 12 Z" fill="purple"/>
      <use href="#star" x="16"/>
    </svg>"""
    fwd = repr(_scene_of(doc))
    bwd = repr(_scene_of(backward))
    # same two draws, order swapped: compare sorted node lines
    assert sorted(fwd.splitlines()) == sorted(bwd.splitlines())

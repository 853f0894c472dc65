"""Batched whole-scene executor vs the per-path interpreter (oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svgrasterize_tpu.core.layer import merge_at
from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.frontend.svg import scene_from_str
from svgrasterize_tpu.render_plan import lower_scene, render_fast

TR = Transform().matrix(0, 1, 0, 1, 0, 0)


def _compare(doc: str, atol: float = 2e-3):
    scene, _ids, size = scene_from_str(doc)
    w, h = size
    viewport = (0, 0, int(h), int(w))

    result = render_fast(scene, TR, viewport)
    assert result is not None, "scene should lower to the batched plan"
    fast, _hull = result

    import svgrasterize_tpu.render_plan as rp

    rp.HYBRID_ENABLED = False  # pure per-path interpreter as the oracle
    try:
        slow, _hull = scene.render(TR, viewport=viewport)
    finally:
        rp.HYBRID_ENABLED = True
    canvas = jnp.zeros((int(h), int(w), 4), dtype=jnp.float32)
    canvas = merge_at(canvas, slow.convert(pre_alpha=True, linear_rgb=False).image, slow.offset)

    a = np.asarray(fast.image)
    b = np.asarray(canvas)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=atol)
    return a


def test_solid_shapes_match_interpreter():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <rect x="8" y="8" width="60" height="40" fill="#336699"/>
          <circle cx="60" cy="60" r="25" fill="red" fill-opacity="0.6"/>
          <path d="M10 90 L50 20 L90 90 Z" fill="green" stroke="black" stroke-width="3"/>
        </svg>
        """
    )


def test_multi_tile_spanning_shape():
    # a shape much larger than one 128px tile exercises the left-clamp carry
    img = _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="400" height="300">
          <rect x="20" y="20" width="360" height="260" fill="#112233"/>
          <circle cx="200" cy="150" r="120" fill="#ffaa00"/>
        </svg>
        """
    )
    # interior of the big circle must be fully covered (tests interior tiles)
    assert img[150, 200, 3] == pytest.approx(1.0)
    assert img[150, 200, 0] == pytest.approx(1.0)  # srgb of #ffaa00 red = 1


def test_gradients_match_interpreter():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="160" height="160">
          <defs>
            <linearGradient id="lg" x1="0" y1="0" x2="1" y2="1">
              <stop offset="0" stop-color="red"/>
              <stop offset="0.5" stop-color="#00ff00" stop-opacity="0.8"/>
              <stop offset="1" stop-color="blue"/>
            </linearGradient>
            <radialGradient id="rg" cx="0.5" cy="0.5" r="0.5" fx="0.3" fy="0.3">
              <stop offset="0" stop-color="white"/>
              <stop offset="1" stop-color="black"/>
            </radialGradient>
          </defs>
          <rect x="0" y="0" width="160" height="80" fill="url(#lg)"/>
          <circle cx="80" cy="120" r="38" fill="url(#rg)"/>
        </svg>
        """
    )


def test_clip_matches_interpreter():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="128" height="128">
          <defs>
            <clipPath id="cp"><circle cx="64" cy="64" r="40"/></clipPath>
          </defs>
          <rect x="0" y="0" width="128" height="128" fill="#884422" clip-path="url(#cp)"/>
          <rect x="40" y="40" width="80" height="30" fill="blue" clip-path="url(#cp)"/>
        </svg>
        """,
        # single-record clips keep the per-item multiply, which is exact
    )


def test_group_clip_aa_isolates_as_pass():
    """Overlapping translucent draws under ONE clip with AA edges: the
    reference composes the subtree first, then clips once (group-level,
    svgrasterize.py:698-715); the lowered plan must isolate it as a pass
    to match the interpreter exactly."""
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
      <defs><clipPath id="cp"><circle cx="48" cy="48" r="30.3"/></clipPath></defs>
      <g clip-path="url(#cp)">
        <rect x="10" y="10" width="60" height="60" fill="#884422"/>
        <circle cx="50" cy="50" r="28" fill="blue" fill-opacity="0.5"/>
      </g>
    </svg>"""
    _compare(doc)
    scene, _ids, _size = scene_from_str(doc)
    lowered = lower_scene(scene, TR, (0, 0, 96, 96), False)
    assert len(lowered.groups) == 1


def test_binary_clip_stays_single_program():
    """An integer axis-aligned clip rect has exactly 0/1 coverage, which
    distributes over composition: no isolation pass, one device program
    (material-design's 936 nested-svg viewport clips rely on this)."""
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
      <defs><clipPath id="cp"><rect x="16" y="16" width="64" height="64"/></clipPath></defs>
      <g clip-path="url(#cp)">
        <rect x="10" y="10" width="60" height="60" fill="#884422"/>
        <circle cx="50" cy="50" r="28" fill="blue" fill-opacity="0.5"/>
      </g>
    </svg>"""
    _compare(doc)
    scene, _ids, _size = scene_from_str(doc)
    lowered = lower_scene(scene, TR, (0, 0, 96, 96), False)
    assert len(lowered.groups) == 0


def test_evenodd_fill_rule():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <path d="M10 10 H86 V86 H10 Z M30 30 H66 V66 H30 Z"
                fill="purple" fill-rule="evenodd"/>
        </svg>
        """
    )


def test_evenodd_multi_path_clip_lowers():
    # evenodd fills in a MULTI-path clip: coverage is the per-part union
    # (host-precomputed), so mixed rules lower instead of falling back
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
      <defs>
        <clipPath id="c" clip-rule="evenodd">
          <path d="M0 0 H64 V64 H0 Z M16 16 H48 V48 H16 Z"/>
          <rect x="20" y="20" width="10" height="10"/>
        </clipPath>
      </defs>
      <rect x="8" y="8" width="48" height="48" fill="red" clip-path="url(#c)"/>
    </svg>
    """
    scene, _ids, size = scene_from_str(doc)
    assert lower_scene(scene, TR, (0, 0, 64, 64), False) is not None
    _compare(doc)


def test_opposite_orientation_multi_path_clip():
    # two overlapping clip paths wound in OPPOSITE directions: the union
    # mask keeps the overlap (the reference OVER-composes part masks);
    # a combined-winding approximation would cancel to a hole
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
      <defs>
        <clipPath id="c">
          <path d="M8 8 H40 V40 H8 Z"/>
          <path d="M24 24 V56 H56 V24 Z"/>
        </clipPath>
      </defs>
      <rect x="0" y="0" width="64" height="64" fill="#2040aa" clip-path="url(#c)"/>
    </svg>
    """
    _compare(doc)
    # the overlap (24..40)^2 must stay opaque
    scene, _ids, _size = scene_from_str(doc)
    layer = render_fast(scene, TR, (0, 0, 64, 64))
    img = np.asarray(layer[0].image)
    assert img[30, 30, 3] > 0.99


def test_evenodd_clip_single_path_batches():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs>
            <clipPath id="c" clip-rule="evenodd">
              <path d="M0 0 H64 V64 H0 Z M16 16 H48 V48 H16 Z"/>
            </clipPath>
          </defs>
          <rect x="8" y="8" width="48" height="48" fill="red" clip-path="url(#c)"/>
        </svg>
        """,
        atol=0.02,  # per-draw vs group clipping differs on AA edges
    )


def test_bbox_units_clip_and_mask():
    # objectBoundingBox clip/mask transforms resolve from the target hull
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="160" height="96">
          <defs>
            <clipPath id="c" clipPathUnits="objectBoundingBox">
              <circle cx="0.5" cy="0.5" r="0.5"/>
            </clipPath>
            <mask id="m" maskContentUnits="objectBoundingBox">
              <rect x="0.1" y="0.1" width="0.8" height="0.8" fill="white"/>
            </mask>
          </defs>
          <rect x="8" y="8" width="64" height="80" fill="#cc3311" clip-path="url(#c)"/>
          <rect x="88" y="8" width="64" height="80" fill="#1133cc" mask="url(#m)"/>
        </svg>
        """,
        atol=0.02,  # per-draw vs group clipping differs on AA edges
    )


def test_pattern_fill_batches():
    # patterns batch via the atlas + modular device gather
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="160" height="96">
          <defs>
            <pattern id="p" width="12" height="12" patternUnits="userSpaceOnUse">
              <rect width="6" height="6" fill="red"/>
              <rect x="6" y="6" width="6" height="6" fill="blue"/>
            </pattern>
            <pattern id="q" width="0.25" height="0.25">
              <circle cx="8" cy="8" r="6" fill="#00aa55"/>
            </pattern>
          </defs>
          <rect x="4" y="4" width="70" height="88" fill="url(#p)"/>
          <circle cx="120" cy="48" r="40" fill="url(#q)"/>
        </svg>
        """
    )


def test_compile_scene_repeated_renders():
    from svgrasterize_tpu import compile_scene

    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
      <defs><mask id="m"><rect x="8" y="8" width="80" height="80" fill="white"/></mask></defs>
      <rect x="4" y="4" width="88" height="88" fill="#336699" mask="url(#m)"/>
      <circle cx="48" cy="48" r="30" fill="orange"/>
    </svg>
    """
    scene, _ids, _size = scene_from_str(doc)
    compiled = compile_scene(scene, TR, (0, 0, 96, 96))
    assert compiled is not None
    a = np.asarray(compiled.render().image)
    b = np.asarray(compiled.render().image)
    np.testing.assert_array_equal(a, b)
    fast, _ = render_fast(scene, TR, (0, 0, 96, 96))
    np.testing.assert_allclose(a, np.asarray(fast.image), atol=1e-6)


def test_z_order_across_tiles():
    # overlapping shapes across tile boundaries must compose in paint order
    img = _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="256" height="130">
          <rect x="0" y="0" width="256" height="130" fill="black"/>
          <rect x="30" y="30" width="200" height="70" fill="red"/>
          <rect x="60" y="50" width="140" height="30" fill="lime"/>
        </svg>
        """
    )
    assert img[64, 128, 1] == pytest.approx(1.0)  # lime on top in the middle
    assert img[40, 128, 0] == pytest.approx(1.0)  # red above black


def test_group_opacity_isolation():
    # two overlapping opaque children under 50% group opacity: the overlap
    # must NOT double-darken (isolation pass semantics)
    img = _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <g opacity="0.5">
            <rect x="8" y="8" width="60" height="60" fill="red"/>
            <rect x="30" y="30" width="60" height="60" fill="red"/>
          </g>
        </svg>
        """
    )
    # overlap pixel and single-coverage pixel must have identical alpha
    assert abs(img[40, 40, 3] - img[16, 16, 3]) < 1e-5
    assert abs(img[40, 40, 3] - 0.5) < 1e-5


def test_nested_group_opacity():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <g opacity="0.6">
            <rect x="4" y="4" width="50" height="50" fill="blue"/>
            <g opacity="0.5">
              <circle cx="60" cy="60" r="25" fill="red"/>
              <circle cx="70" cy="50" r="20" fill="red"/>
            </g>
          </g>
        </svg>
        """
    )


def test_group_opacity_under_clip():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <defs><clipPath id="c"><rect x="20" y="20" width="56" height="56"/></clipPath></defs>
          <g opacity="0.5" clip-path="url(#c)">
            <rect x="0" y="0" width="96" height="48" fill="green"/>
            <rect x="0" y="40" width="96" height="48" fill="green"/>
          </g>
        </svg>
        """,
        atol=0.02,
    )


def test_mask_matches_interpreter():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="128" height="96">
          <defs>
            <mask id="m">
              <rect x="0" y="0" width="128" height="96" fill="white"/>
              <circle cx="64" cy="48" r="30" fill="black"/>
            </mask>
            <mask id="grad_m">
              <linearGradient id="mg"><stop offset="0" stop-color="white"/>
              <stop offset="1" stop-color="black"/></linearGradient>
              <rect x="0" y="0" width="128" height="96" fill="url(#mg)"/>
            </mask>
          </defs>
          <rect x="8" y="8" width="112" height="80" fill="tomato" mask="url(#m)"/>
          <circle cx="64" cy="48" r="20" fill="navy" mask="url(#grad_m)"/>
        </svg>
        """,
        atol=0.02,
    )


def test_mask_hides_outside_region():
    img = _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <defs><mask id="m"><rect x="0" y="0" width="48" height="96" fill="white"/></mask></defs>
          <rect x="0" y="0" width="96" height="96" fill="lime" mask="url(#m)"/>
        </svg>
        """,
        atol=0.02,
    )
    assert img[48, 24, 3] > 0.99   # inside the mask
    assert img[48, 72, 3] < 1e-6   # outside the mask: fully hidden


def test_filter_blur_matches_interpreter():
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="160" height="120">
          <defs>
            <filter id="b"><feGaussianBlur stdDeviation="3"/></filter>
            <filter id="o"><feOffset dx="6" dy="4"/></filter>
          </defs>
          <rect x="30" y="30" width="60" height="40" fill="#2266aa" filter="url(#b)"/>
          <circle cx="120" cy="60" r="22" fill="tomato" filter="url(#o)"/>
        </svg>
        """,
        atol=0.02,
    )


def test_filter_drop_shadow_composite():
    # merge of a blurred alpha shadow under the source: a classic chain
    _compare(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="128" height="128">
          <defs>
            <filter id="ds">
              <feGaussianBlur in="SourceAlpha" stdDeviation="2" result="blur"/>
              <feOffset in="blur" dx="4" dy="4" result="shadow"/>
              <feMerge><feMergeNode in="shadow"/><feMergeNode in="SourceGraphic"/></feMerge>
            </filter>
          </defs>
          <rect x="24" y="24" width="64" height="64" fill="gold" filter="url(#ds)"/>
        </svg>
        """,
        atol=0.02,
    )


def test_occlusion_cull_bit_exact(monkeypatch):
    """Records under a full-tile opaque solid are culled at pack time with
    bit-identical output (render_plan._Builder._cull_occluded)."""
    doc = """
        <svg xmlns="http://www.w3.org/2000/svg" width="320" height="320">
          <defs><linearGradient id="g">
            <stop offset="0" stop-color="#123456"/>
            <stop offset="1" stop-color="#654321"/>
          </linearGradient></defs>
          <circle cx="100" cy="100" r="80" fill="#ff0000" fill-opacity="0.5"/>
          <rect x="40" y="40" width="240" height="240" fill="url(#g)"/>
          <rect x="0" y="0" width="320" height="320" fill="#224488"/>
          <circle cx="220" cy="220" r="60" fill="#00ff00" fill-opacity="0.7"/>
        </svg>
        """
    scene, _ids, size = scene_from_str(doc)
    w, h = size
    viewport = (0, 0, int(h), int(w))

    counts, images = {}, {}
    # collapse off: since round 4 gradient runs collapse too, so the whole
    # stack would precompose into one field per tile with or without the
    # cull and the count comparison below would be vacuous (9 == 9)
    monkeypatch.setenv("SVGR_COLLAPSE", "0")
    for cull in ("0", "1"):
        monkeypatch.setenv("SVGR_CULL", cull)
        lowered = lower_scene(scene, TR, viewport, False)
        assert lowered is not None
        nt = lowered.grid[0] * lowered.grid[1]
        counts[cull] = int((np.asarray(lowered.items["tile_id"]) < nt).sum())
        fast, _hull = render_fast(scene, TR, viewport)
        images[cull] = np.asarray(fast.image)

    # the opaque full-canvas rect occludes everything below it on every
    # interior tile: the culled stream must be strictly smaller
    assert counts["1"] < counts["0"]
    np.testing.assert_array_equal(images["0"], images["1"])


def test_lowering_is_deterministic_across_repeats():
    """Two lowers of one scene must produce identical plans.

    Round 5 found clip caches keyed by id(transform): clip transforms are
    temporaries that die between isolation passes, CPython reuses their
    ids, and a later different clip then hit a STALE cache entry —
    nondeterministically dropping (or inventing) tiles on pass-heavy
    scenes (the stress doc diverged by up to 0.5 premult units on a few
    tiles, sometimes against the oracle).  Keys now use the transform's
    matrix bytes.
    """
    import hashlib

    from svgrasterize_tpu.utils.stress import stress_doc

    scene, _i, size = scene_from_str(stress_doc(300))
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    w, h = int(size[0]), int(size[1])

    def plan_hash():
        lowered = lower_scene(scene, tr, (0, 0, h, w), False, tile=32)
        hsh = hashlib.sha1()
        for k in sorted(lowered.items):
            v = lowered.items[k]
            if hasattr(v, "tobytes"):
                hsh.update(k.encode())
                hsh.update(np.ascontiguousarray(v).tobytes())
        for g in lowered.groups:
            for k in sorted(g["items"]):
                v = g["items"][k]
                if hasattr(v, "tobytes"):
                    hsh.update(np.ascontiguousarray(v).tobytes())
            hsh.update(np.ascontiguousarray(g["clips"]).tobytes())
        return hsh.hexdigest()

    assert plan_hash() == plan_hash()

"""Fused Pallas executor vs the XLA executor (the in-repo oracle).

The fused path (ops/fused_exec.py) must produce the same canvas as
ops/batch_exec.execute_items for any lowered plan it accepts.  On CPU the
kernel runs in Pallas interpret mode (SVGR_FUSED=interp); the real-TPU
equivalence is covered by the golden demos, which route through the fused
path automatically on that backend.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import svgrasterize_tpu.render_plan as rp
from svgrasterize_tpu import scene_from_str
from svgrasterize_tpu.core.transform import Transform

TR = Transform().matrix(0, 1, 0, 1, 0, 0)


@pytest.fixture
def no_collapse(monkeypatch):
    # opt-in pin for tests that construct specific stack/mode scenarios
    # (solid stacks feeding big classes to chunk, per-item solid-skip
    # conds) that the static-run collapse would precompose into field
    # items before the scenario ever materializes.  Everything else runs
    # with the default-on collapse, so the equivalence suite covers the
    # collapsed plans too; collapse-specific coverage lives in
    # tests/test_collapse.py and the fuzz sweep.
    monkeypatch.setenv("SVGR_COLLAPSE", "0")


def _compare(svg: str, viewport, tol=1e-5, tile=None, vout=True):
    scene, _ids, _size = scene_from_str(svg)
    lowered = rp.lower_scene(scene, TR, viewport, False, tile=tile)
    assert lowered is not None, "scene must lower"
    prev = {k: os.environ.get(k) for k in ("SVGR_FUSED", "SVGR_FUSED_VOUT")}
    try:
        os.environ["SVGR_FUSED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        os.environ["SVGR_FUSED"] = "interp"
        if not vout:
            os.environ["SVGR_FUSED_VOUT"] = "0"
        got = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        feats = lowered.items["_device_cache"]["features"]
        assert feats is not None and ("vout" in feats) == vout, feats
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() <= tol, (
        f"fused executor diverges: {np.abs(ref - got).max()}"
    )


def test_solid_fills_rules_opacity():
    _compare(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <rect x='4' y='4' width='50' height='40' fill='#d04020'/>
        <circle cx='70' cy='32' r='20' fill='#2060c0' opacity='0.7'/>
        <path d='M10 50 L90 44 L50 62 Z M20 48 L80 48 L50 60 Z'
              fill='#20a040' fill-rule='evenodd'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_gradients_clips_carries():
    _compare(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs>
        <linearGradient id='lg' x1='0' y1='0' x2='1' y2='1' spreadMethod='reflect'>
        <stop offset='0' stop-color='#ff0000'/><stop offset='0.5' stop-color='#00ff00'/>
        <stop offset='1' stop-color='#0000ff'/></linearGradient>
        <radialGradient id='rg' cx='0.5' cy='0.5' r='0.5' fx='0.3' fy='0.3'>
        <stop offset='0' stop-color='#ffffff'/><stop offset='1' stop-color='#204080'/>
        </radialGradient>
        <clipPath id='c'><circle cx='30' cy='30' r='22'/></clipPath></defs>
        <rect x='4' y='4' width='50' height='40' fill='url(#rg)' clip-path='url(#c)'/>
        <rect x='56' y='6' width='36' height='20' fill='url(#lg)'/>
        <path d='M2 2 C 90 0, 4 60, 94 62 L 94 2 Z' fill='#208040' opacity='0.5'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_ring_kernel_gradients_clips_carries():
    """SVGR_FUSED_VOUT=0 keeps the ring-flush (v2) kernel covered now that
    small canvases default to the resident-canvas (v3) path."""
    _compare(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs>
        <linearGradient id='lg' x1='0' y1='0' x2='1' y2='1'>
        <stop offset='0' stop-color='#ff0000'/><stop offset='1' stop-color='#0000ff'/>
        </linearGradient>
        <clipPath id='c'><circle cx='30' cy='30' r='22'/></clipPath></defs>
        <rect x='4' y='4' width='50' height='40' fill='url(#lg)' clip-path='url(#c)'/>
        <path d='M2 2 C 90 0, 4 60, 94 62 L 94 2 Z' fill='#208040' opacity='0.5'/>
        </svg>""",
        (0, 0, 64, 96),
        vout=False,
    )


def test_vstore_off_matches():
    """SVGR_VSTORE=0 keeps the branchy compose tail of the kvec vout
    kernel covered now that the branch-free vstore path is the default;
    the scene mixes single-item and multi-item tile runs so both the
    run-continuation blend and the last-writer-wins stores are hit."""
    prev = os.environ.get("SVGR_VSTORE")
    try:
        os.environ["SVGR_VSTORE"] = "0"
        _compare(
            """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
            <rect x='4' y='4' width='88' height='56' fill='#d0d0d0'/>
            <rect x='10' y='10' width='40' height='40' fill='#d04020' opacity='0.8'/>
            <circle cx='30' cy='30' r='16' fill='#2060c0' opacity='0.7'/>
            <path d='M60 10 L90 10 L75 40 Z' fill='#20a040'/>
            </svg>""",
            (0, 0, 64, 96),
        )
    finally:
        if prev is None:
            os.environ.pop("SVGR_VSTORE", None)
        else:
            os.environ["SVGR_VSTORE"] = prev


def test_isolation_pool_tex_and_mask():
    _compare(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs><mask id='m'><rect x='0' y='0' width='96' height='64' fill='#606060'/>
        <circle cx='48' cy='32' r='18' fill='white'/></mask></defs>
        <g opacity='0.6'><rect x='8' y='8' width='40' height='30' fill='#c03020'/>
        <circle cx='40' cy='40' r='14' fill='#30a050'/></g>
        <rect x='30' y='10' width='60' height='44' fill='#2060c0' mask='url(#m)'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_pattern_paints():
    _compare(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs><pattern id='p' width='8' height='8' patternUnits='userSpaceOnUse'>
        <rect x='0' y='0' width='4' height='4' fill='#d04020'/>
        <rect x='4' y='4' width='4' height='4' fill='#2060c0'/></pattern></defs>
        <rect x='4' y='4' width='60' height='40' fill='url(#p)'/>
        <circle cx='75' cy='40' r='18' fill='url(#p)'/>
        <rect x='10' y='48' width='40' height='12' fill='#20a040'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_tile64_gradients_clips():
    # T=64 is the adaptive tile for 4K canvases: G = 2 edges per winding
    # pass and (64, 256) canvas blocks
    _compare(
        """<svg xmlns='http://www.w3.org/2000/svg' width='160' height='128'>
        <defs><linearGradient id='lg' x1='0' y1='0' x2='1' y2='1'>
        <stop offset='0' stop-color='#ff0000'/><stop offset='1' stop-color='#0000ff'/>
        </linearGradient>
        <clipPath id='c'><circle cx='60' cy='60' r='45'/></clipPath></defs>
        <rect x='8' y='8' width='100' height='90' fill='url(#lg)' clip-path='url(#c)'/>
        <path d='M10 100 C 150 10, 20 120, 150 120 L 10 120 Z' fill='#20a040'/>
        </svg>""",
        (0, 0, 128, 160),
        tile=64,
    )


@pytest.mark.parametrize("seed", [3, 4])
def test_random_featureful_equivalence(seed):
    """Random scenes mixing gradients, clips, patterns, and opacity."""
    rng = np.random.default_rng(seed)
    defs = """<defs>
    <linearGradient id='lg'><stop offset='0' stop-color='#f00'/>
    <stop offset='1' stop-color='#00f'/></linearGradient>
    <radialGradient id='rg'><stop offset='0' stop-color='#fff'/>
    <stop offset='1' stop-color='#137'/></radialGradient>
    <clipPath id='c'><circle cx='48' cy='32' r='26'/></clipPath>
    <pattern id='p' width='6' height='6' patternUnits='userSpaceOnUse'>
    <rect width='3' height='3' fill='#d04020'/></pattern></defs>"""
    fills = ["url(#lg)", "url(#rg)", "url(#p)", "#20a040", "#a02060"]
    parts = []
    for _ in range(14):
        fill = fills[rng.integers(0, len(fills))]
        clip = " clip-path='url(#c)'" if rng.random() < 0.3 else ""
        op = rng.uniform(0.4, 1.0)
        if rng.random() < 0.5:
            x, y = rng.uniform(0, 70, 2)
            w, h = rng.uniform(6, 40, 2)
            parts.append(
                f"<rect x='{x:.1f}' y='{y:.1f}' width='{w:.1f}'"
                f" height='{h:.1f}' fill='{fill}' opacity='{op:.2f}'{clip}/>"
            )
        else:
            cx, cy = rng.uniform(10, 85, 2)
            r = rng.uniform(5, 22)
            parts.append(
                f"<circle cx='{cx:.1f}' cy='{cy:.1f}' r='{r:.1f}'"
                f" fill='{fill}' opacity='{op:.2f}'{clip}/>"
            )
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>"
        + defs + "".join(parts) + "</svg>"
    )
    _compare(svg, (0, 0, 64, 96))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_scene_equivalence(seed):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(12):
        kind = rng.integers(0, 3)
        color = "#%02x%02x%02x" % tuple(rng.integers(0, 256, 3))
        op = rng.uniform(0.3, 1.0)
        if kind == 0:
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(5, 40, 2)
            parts.append(
                f"<rect x='{x:.1f}' y='{y:.1f}' width='{w:.1f}' height='{h:.1f}'"
                f" fill='{color}' opacity='{op:.2f}'/>"
            )
        elif kind == 1:
            cx, cy = rng.uniform(10, 85, 2)
            r = rng.uniform(4, 25)
            parts.append(
                f"<circle cx='{cx:.1f}' cy='{cy:.1f}' r='{r:.1f}'"
                f" fill='{color}' opacity='{op:.2f}'/>"
            )
        else:
            pts = rng.uniform(0, 96, (4, 2))
            d = "M" + " L".join(f"{p[0]:.1f} {p[1]:.1f}" for p in pts) + " Z"
            rule = "evenodd" if rng.random() < 0.5 else "nonzero"
            parts.append(
                f"<path d='{d}' fill='{color}' fill-rule='{rule}'"
                f" opacity='{op:.2f}'/>"
            )
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>"
        + "".join(parts)
        + "</svg>"
    )
    _compare(svg, (0, 0, 64, 96))


def test_vmem_chunked_execution(no_collapse):
    """Over-budget stacks split into several fused launches over tile
    ranges instead of falling back to the XLA executor wholesale."""
    rng = np.random.default_rng(7)
    parts = []
    for i in range(8):
        cx, cy = 20 + i * 40, 32
        pts = []
        for k in range(40):
            ang = 2 * np.pi * k / 40
            r = 14 + 6 * rng.random()
            pts.append(f"{cx + r * np.cos(ang):.2f} {cy + r * np.sin(ang):.2f}")
        parts.append(
            f"<path d='M{' L'.join(pts)} Z' fill='#2060c0' opacity='0.8'/>"
        )
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='336' height='64'>"
        + "".join(parts) + "</svg>"
    )
    scene, _ids, _size = scene_from_str(svg)
    viewport = (0, 0, 64, 336)
    lowered = rp.lower_scene(scene, TR, viewport, False, tile=32)
    assert lowered is not None
    assert any(b.shape[0] for b in lowered.bigs), "paths must form big classes"

    prev = {k: os.environ.get(k)
            for k in ("SVGR_FUSED", "SVGR_VMEM_BUDGET", "SVGR_PREGATHER")}
    try:
        os.environ["SVGR_FUSED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        os.environ["SVGR_FUSED"] = "interp"
        # budget admits only a few resident rows -> the plan must chunk
        # (rows are lane-padded to 128 in the accounting).  Pregather mode
        # would sidestep residency entirely (covered elsewhere); pin it off
        # to exercise the chunking machinery.
        os.environ["SVGR_PREGATHER"] = "0"
        os.environ["SVGR_VMEM_BUDGET"] = str((8 + 2) * 32 * 128 * 4)
        got = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        cache = lowered.items["_device_cache"]
        assert cache["features"] is None, "whole plan must be over budget"
        chunks = cache.get("chunks")
        assert chunks and len(chunks) >= 2, "plan should split into chunks"
        fused_items = sum(c["n_items"] for c in chunks if c["features"] is not None)
        total_items = sum(c["n_items"] for c in chunks)
        assert fused_items / total_items >= 0.8, (fused_items, total_items)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() <= 1e-5


def test_canvas_chunked_vout_execution():
    """A canvas over the VMEM budget splits into resident-canvas (vout)
    launches over tile ranges — instead of the ring kernel plus the
    whole-canvas membership select — with untouched gaps emitted as
    zero rows.  The scene leaves the first and last tile columns
    untouched so the gap entries are exercised."""
    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='320' height='64'>
    <defs><linearGradient id='g'><stop offset='0' stop-color='red'/>
    <stop offset='1' stop-color='blue'/></linearGradient>
    <clipPath id='c'><circle cx='100' cy='32' r='24'/></clipPath></defs>
    <rect x='40' y='8' width='240' height='48' fill='url(#g)'/>
    <rect x='70' y='10' width='60' height='44' fill='#20a040'
          clip-path='url(#c)' opacity='0.8'/>
    <circle cx='200' cy='32' r='24' fill='#c03020' opacity='0.6'/>
    </svg>"""
    scene, _ids, _size = scene_from_str(svg)
    viewport = (0, 0, 64, 320)
    lowered = rp.lower_scene(scene, TR, viewport, False, tile=32)
    assert lowered is not None

    prev = {k: os.environ.get(k)
            for k in ("SVGR_FUSED", "SVGR_VMEM_BUDGET", "SVGR_CHUNK_VOUT")}
    try:
        os.environ["SVGR_FUSED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        os.environ["SVGR_FUSED"] = "interp"
        os.environ["SVGR_CHUNK_VOUT"] = "1"
        # admits ~3 canvas tiles per launch (plus streams/scratch)
        os.environ["SVGR_VMEM_BUDGET"] = str(4 * 32 * 128 * 4 + 2 * 32 * 128 * 4)
        got = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        cache = lowered.items["_device_cache"]
        assert cache["features"] is None and cache.get("chunks"), (
            "canvas-over-budget plan must chunk"
        )
        chunks = cache["chunks"]
        live = [c for c in chunks if "zero_rows" not in c]
        assert len(live) >= 2, chunks
        assert all("vout" in c["features"] for c in live), (
            "every live chunk must get the resident-canvas kernel"
        )
        assert any("zero_rows" in c for c in chunks), (
            "untouched tile gaps should emit zero rows"
        )
        assert sum(
            c.get("zero_rows", c.get("num_tiles", 0)) for c in chunks
        ) == lowered.grid[0] * lowered.grid[1]
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() <= 1e-5


def test_prepared_prep_matches_inline_prep():
    """The cached scene-static prep (prepare_fused, stored on the plan by
    _device_plan) must be byte-identical to inlining the prep into every
    call — guards the prepare/execute split staying in sync."""
    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
    <defs><linearGradient id='lg' x1='0' y1='0' x2='1' y2='1'>
    <stop offset='0' stop-color='#ff0000'/><stop offset='1' stop-color='#0000ff'/>
    </linearGradient>
    <clipPath id='c'><circle cx='30' cy='30' r='22'/></clipPath></defs>
    <rect x='4' y='4' width='50' height='40' fill='url(#lg)' clip-path='url(#c)'/>
    <path d='M2 2 C 90 0, 4 60, 94 62 L 94 2 Z' fill='#208040' opacity='0.5'/>
    </svg>"""
    scene, _ids, _size = scene_from_str(svg)
    viewport = (0, 0, 64, 96)
    prev = {k: os.environ.get(k) for k in ("SVGR_FUSED", "SVGR_PREPARED")}
    try:
        os.environ["SVGR_FUSED"] = "interp"
        lowered = rp.lower_scene(scene, TR, viewport, False)
        got = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        cache = lowered.items["_device_cache"]
        assert cache["prepared"] is not None, "plan must cache the prep"
        assert "edges" in cache["prepared"]
        os.environ["SVGR_PREPARED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        assert lowered.items["_device_cache"].get("prepared") is None
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() == 0.0, (
        f"prepared prep diverges from inline prep: {np.abs(ref - got).max()}"
    )


def test_resident_stack_mode_matches_pregather(no_collapse):
    """SVGR_PREGATHER=0 (VMEM-resident stacks + per-item dynamic row
    reads) and the default pregather mode (per-item fields as sequential
    pipeline blocks) must produce identical canvases."""
    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
    <defs><clipPath id='c'><circle cx='48' cy='32' r='28'/></clipPath></defs>
    <path d='M2 2 C 90 0, 4 60, 94 62 L 94 2 Z' fill='#208040'
          clip-path='url(#c)'/>
    <circle cx='30' cy='30' r='26' fill='#2060c0' opacity='0.7'/>
    </svg>"""
    scene, _ids, _size = scene_from_str(svg)
    viewport = (0, 0, 64, 96)
    prev = {k: os.environ.get(k) for k in ("SVGR_FUSED", "SVGR_PREGATHER")}
    try:
        os.environ["SVGR_FUSED"] = "interp"
        lowered = rp.lower_scene(scene, TR, viewport, False)
        got = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        feats = lowered.items["_device_cache"]["features"]
        assert feats is not None and "pregather" in feats, feats
        os.environ["SVGR_PREGATHER"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        feats = lowered.items["_device_cache"]["features"]
        assert feats is not None and "pregather" not in feats, feats
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() == 0.0, (
        f"pregather diverges from resident stacks: {np.abs(ref - got).max()}"
    )


def test_pregather_admits_stack_heavy_plan_unchunked(no_collapse):
    """A plan whose big stacks would blow the resident-VMEM budget runs as
    ONE fused launch under pregather (the fields stream per item instead
    of sitting resident), where resident mode must chunk."""
    from svgrasterize_tpu.ops.fused_exec import plan_features

    rng = np.random.default_rng(11)
    parts = []
    for i in range(8):
        cx, cy = 20 + i * 40, 32
        pts = []
        for k in range(40):
            ang = 2 * np.pi * k / 40
            r = 14 + 6 * rng.random()
            pts.append(f"{cx + r * np.cos(ang):.2f} {cy + r * np.sin(ang):.2f}")
        parts.append(
            f"<path d='M{' L'.join(pts)} Z' fill='#2060c0' opacity='0.8'/>"
        )
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='336' height='64'>"
        + "".join(parts) + "</svg>"
    )
    scene, _ids, _size = scene_from_str(svg)
    lowered = rp.lower_scene(scene, TR, (0, 0, 64, 336), False, tile=32)
    assert lowered is not None
    assert any(b.shape[0] for b in lowered.bigs)
    prev = {k: os.environ.get(k)
            for k in ("SVGR_FUSED", "SVGR_VMEM_BUDGET", "SVGR_PREGATHER")}
    try:
        os.environ["SVGR_FUSED"] = "interp"
        os.environ["SVGR_VMEM_BUDGET"] = str((8 + 2) * 32 * 128 * 4)
        os.environ["SVGR_PREGATHER"] = "0"
        gh, gw = lowered.grid
        assert plan_features(lowered.items, lowered.bigs, lowered.clips,
                             None, None, lowered.tile, gh * gw) is None
        os.environ["SVGR_PREGATHER"] = "1"
        feats = plan_features(lowered.items, lowered.bigs, lowered.clips,
                              None, None, lowered.tile, gh * gw)
        assert feats is not None and "pregather" in feats, feats
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_whole_plan_planar_pool():
    """The serving (whole-plan) program keeps the isolation pool
    channel-planar end-to-end (one scratch row baked in, tight capacity);
    both the fused interp path and the XLA fallback must consume it and
    match the per-stage interleaved-pool executor bit-for-bit."""
    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs><mask id='m'><rect x='0' y='0' width='96' height='64' fill='#606060'/>
        <circle cx='48' cy='32' r='18' fill='white'/></mask>
        <filter id='f'><feGaussianBlur stdDeviation='1.5'/></filter></defs>
        <g opacity='0.6'><rect x='8' y='8' width='40' height='30' fill='#c03020'/>
        <circle cx='40' cy='40' r='14' fill='#30a050'/></g>
        <rect x='30' y='10' width='60' height='44' fill='#2060c0' mask='url(#m)'/>
        <circle cx='76' cy='20' r='12' fill='#a0b020' filter='url(#f)'/>
        </svg>"""
    scene, _ids, _size = scene_from_str(svg)
    lowered = rp.lower_scene(scene, TR, (0, 0, 64, 96), False)
    assert lowered is not None and lowered.groups, "needs isolation passes"
    prev = os.environ.get("SVGR_FUSED")
    try:
        os.environ["SVGR_FUSED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, (0, 0), False, whole=False))
        xla_whole = np.asarray(
            rp.execute_lowered(lowered, (0, 0), False, whole=True)
        )
        os.environ["SVGR_FUSED"] = "interp"
        fused_whole = np.asarray(
            rp.execute_lowered(lowered, (0, 0), False, whole=True)
        )
    finally:
        if prev is None:
            os.environ.pop("SVGR_FUSED", None)
        else:
            os.environ["SVGR_FUSED"] = prev
    assert np.abs(ref - xla_whole).max() <= 1e-6
    assert np.abs(ref - fused_whole).max() <= 1e-5


def test_solid_skip_and_stop_guard_equivalence(no_collapse):
    """A launch mixing many solid fills with one long (9-stop) gradient:
    k_stops pads wide, activating both the per-item solid-skip cond and
    the "sguard" guarded stop unroll — output must match the XLA
    executor exactly (padded stops are numeric no-ops; the conds only
    skip them)."""
    stops = "".join(
        f"<stop offset='{i / 8}' stop-color='#{i:x}0{8 - i:x}0f0'/>"
        for i in range(9)
    )
    rects = "".join(
        f"<rect x='{4 + 7 * i}' y='{4 + 5 * (i % 4)}' width='6' height='6' "
        f"fill='#{i:x}060a0'/>" for i in range(12)
    )
    svg = f"""<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs>
        <linearGradient id='long'>{stops}</linearGradient>
        <linearGradient id='short' x1='0' y1='0' x2='0' y2='1'>
        <stop offset='0' stop-color='#ff2000'/>
        <stop offset='1' stop-color='#0020ff'/></linearGradient>
        </defs>
        {rects}
        <rect x='4' y='30' width='88' height='14' fill='url(#long)'/>
        <rect x='4' y='46' width='88' height='14' fill='url(#short)'/>
        </svg>"""
    scene, _ids, _size = scene_from_str(svg)
    lowered = rp.lower_scene(scene, TR, (0, 0, 64, 96), False)
    assert lowered is not None
    assert int(lowered.items["stop_offsets"].shape[1]) >= 8
    prev = {k: os.environ.get(k)
            for k in ("SVGR_FUSED", "SVGR_SOLID_SKIP", "SVGR_SGUARD",
                      "SVGR_PREGRAD")}
    try:
        os.environ["SVGR_FUSED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, (0, 0), False))
        # the conds default off (measured slower on v5e; pregrad replaces
        # in-kernel gradient math entirely); force the guarded in-kernel
        # path on so it stays equivalence-covered
        os.environ["SVGR_PREGRAD"] = "0"
        os.environ["SVGR_SOLID_SKIP"] = "1"
        os.environ["SVGR_SGUARD"] = "1"
        os.environ["SVGR_FUSED"] = "interp"
        got = np.asarray(rp.execute_lowered(lowered, (0, 0), False))
        feats = lowered.items["_device_cache"]["features"]
        assert feats is not None and "sguard" in feats, feats
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() <= 1e-5


# ---------------------------------------------------------------------------
# kvec: vectorized phase-1 K-items kernel (SVGR_KVEC)
# ---------------------------------------------------------------------------


def _compare_kvec(svg: str, viewport, expect_kvec=True, tol=1e-5, vout=True):
    """XLA executor vs the kvec kernel (interp), asserting kvec engaged.

    Lowers at tile 32 (the TPU default): the CPU default tile 128 cannot
    pack clip lanes into the wpack block, which disqualifies kvec for
    clipped scenes and would silently test the serial kernel instead."""
    scene, _ids, _size = scene_from_str(svg)
    lowered = rp.lower_scene(scene, TR, viewport, False, tile=32)
    assert lowered is not None, "scene must lower"
    prev = {k: os.environ.get(k)
            for k in ("SVGR_FUSED", "SVGR_KVEC", "SVGR_FUSED_VOUT")}
    try:
        os.environ["SVGR_FUSED"] = "0"
        ref = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        os.environ["SVGR_FUSED"] = "interp"
        os.environ["SVGR_KVEC"] = "1"
        if not vout:
            os.environ["SVGR_FUSED_VOUT"] = "0"
        got = np.asarray(rp.execute_lowered(lowered, viewport[:2], False))
        feats = lowered.items["_device_cache"]["features"]
        assert feats is not None and ("kvec" in feats) == expect_kvec, feats
        assert ("vout" in feats) == vout, feats
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert np.abs(ref - got).max() <= tol, (
        f"kvec kernel diverges: {np.abs(ref - got).max()}"
    )


def test_kvec_solids_rules_opacity_bigs():
    """Solid fills (no paint stream), fill rules, opacity, big classes."""
    _compare_kvec(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <rect x='4' y='4' width='50' height='40' fill='#d04020'/>
        <circle cx='70' cy='32' r='20' fill='#2060c0' opacity='0.7'/>
        <path d='M10 50 L90 44 L50 62 Z M20 48 L80 48 L50 60 Z'
              fill='#20a040' fill-rule='evenodd'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_kvec_gradients_clips_carries():
    """pregrad paint stream + clip lanes of the wpack block + carries."""
    _compare_kvec(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs>
        <linearGradient id='lg' x1='0' y1='0' x2='1' y2='1' spreadMethod='reflect'>
        <stop offset='0' stop-color='#ff0000'/><stop offset='0.5' stop-color='#00ff00'/>
        <stop offset='1' stop-color='#0000ff'/></linearGradient>
        <radialGradient id='rg' cx='0.5' cy='0.5' r='0.5' fx='0.3' fy='0.3'>
        <stop offset='0' stop-color='#ffffff'/><stop offset='1' stop-color='#204080'/>
        </radialGradient>
        <clipPath id='c'><circle cx='30' cy='30' r='22'/></clipPath></defs>
        <rect x='4' y='4' width='50' height='40' fill='url(#rg)' clip-path='url(#c)'/>
        <rect x='56' y='6' width='36' height='20' fill='url(#lg)'/>
        <path d='M2 2 C 90 0, 4 60, 94 62 L 94 2 Z' fill='#208040' opacity='0.5'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_kvec_isolation_pool_tex_and_mask():
    """Streamed pretex pool rows selected by the vpar tex/mask flags."""
    _compare_kvec(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs><mask id='m'><rect x='0' y='0' width='96' height='64' fill='#606060'/>
        <circle cx='48' cy='32' r='18' fill='white'/></mask></defs>
        <g opacity='0.6'><rect x='8' y='8' width='40' height='30' fill='#c03020'/>
        <circle cx='40' cy='40' r='14' fill='#30a050'/></g>
        <rect x='30' y='10' width='60' height='44' fill='#2060c0' mask='url(#m)'/>
        </svg>""",
        (0, 0, 64, 96),
    )


def test_kvec_patterns_fall_back():
    """Pattern paints keep the serial kernel (resident atlas scalar rows)."""
    _compare_kvec(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs><pattern id='p' width='8' height='8' patternUnits='userSpaceOnUse'>
        <rect x='0' y='0' width='4' height='4' fill='#d04020'/></pattern></defs>
        <rect x='4' y='4' width='60' height='40' fill='url(#p)'/>
        </svg>""",
        (0, 0, 64, 96),
        expect_kvec=False,
    )


@pytest.mark.parametrize("seed", [5, 6])
def test_kvec_random_featureful(seed):
    """Random mixed scenes through the kvec kernel (patterns excluded:
    they disqualify kvec launch-wide, which the fall-back test covers)."""
    rng = np.random.default_rng(1000 + seed)
    defs = """<defs>
    <linearGradient id='lg'><stop offset='0' stop-color='#f00'/>
    <stop offset='1' stop-color='#00f'/></linearGradient>
    <radialGradient id='rg'><stop offset='0' stop-color='#fff'/>
    <stop offset='1' stop-color='#137'/></radialGradient>
    <clipPath id='c'><circle cx='48' cy='32' r='26'/></clipPath></defs>"""
    fills = ["url(#lg)", "url(#rg)", "#20a040", "#a02060"]
    parts = []
    for _ in range(14):
        fill = fills[rng.integers(0, len(fills))]
        clip = " clip-path='url(#c)'" if rng.random() < 0.3 else ""
        op = rng.uniform(0.4, 1.0)
        if rng.random() < 0.5:
            x, y = rng.uniform(0, 70, 2)
            w, h = rng.uniform(6, 40, 2)
            parts.append(
                f"<rect x='{x:.1f}' y='{y:.1f}' width='{w:.1f}'"
                f" height='{h:.1f}' fill='{fill}' opacity='{op:.2f}'{clip}/>"
            )
        else:
            cx, cy = rng.uniform(10, 85, 2)
            r = rng.uniform(5, 22)
            parts.append(
                f"<circle cx='{cx:.1f}' cy='{cy:.1f}' r='{r:.1f}'"
                f" fill='{fill}' opacity='{op:.2f}'{clip}/>"
            )
    svg = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>"
        + defs + "".join(parts) + "</svg>"
    )
    _compare_kvec(svg, (0, 0, 64, 96))


def test_kvec_ring_kernel():
    """kvec phase 1 + the ring-flush compose path (canvas over budget)."""
    _compare_kvec(
        """<svg xmlns='http://www.w3.org/2000/svg' width='96' height='64'>
        <defs>
        <linearGradient id='lg'><stop offset='0' stop-color='#f00'/>
        <stop offset='1' stop-color='#00f'/></linearGradient>
        <clipPath id='c'><circle cx='30' cy='30' r='22'/></clipPath></defs>
        <rect x='4' y='4' width='50' height='40' fill='url(#lg)' clip-path='url(#c)'/>
        <circle cx='70' cy='32' r='20' fill='#2060c0' opacity='0.7'/>
        <path d='M2 2 C 90 0, 4 60, 94 62 L 94 2 Z' fill='#208040' opacity='0.5'/>
        </svg>""",
        (0, 0, 64, 96),
        vout=False,
    )


def test_tile64_multipass_stays_fused():
    """Multi-pass plans at tile 64 run fused with zero fallbacks.

    Round 4 measured an ~8x cliff: tile-64 serve plans blew the fused
    VMEM budget and fell back to the XLA executor wholesale (icons
    1.5 -> 12 ms).  The per-launch sub-pool accounting (vpool + the
    plan_features subpool_rows budget) has since removed it; this pins
    that a filter+mask+opacity multi-pass doc at tile 64 (a) keeps every
    stage on the fused executor (fallback audit clean) and (b) matches
    the XLA executor.
    """
    import os

    import numpy as np

    from svgrasterize_tpu.frontend.svg import scene_from_str
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.ops.fused_exec import fallback_audit
    from svgrasterize_tpu.render_plan import execute_lowered, lower_scene

    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="512" height="384">
      <defs>
        <mask id="m"><rect x="20" y="20" width="470" height="340"
          fill="white"/><circle cx="250" cy="190" r="90" fill="black"/></mask>
        <filter id="b"><feGaussianBlur stdDeviation="3"/></filter>
        <linearGradient id="g"><stop offset="0" stop-color="#d04020"/>
          <stop offset="1" stop-color="#2040d0"/></linearGradient>
      </defs>
      <rect x="8" y="8" width="496" height="368" fill="url(#g)"/>
      <g opacity="0.6"><rect x="40" y="40" width="200" height="150"
        fill="blue"/><circle cx="300" cy="120" r="70" fill="red"/></g>
      <rect x="100" y="60" width="340" height="260" fill="#00aa88"
        mask="url(#m)"/>
      <circle cx="120" cy="280" r="60" fill="purple" filter="url(#b)"/>
    </svg>
    """
    scene, _i, _s = scene_from_str(doc)
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    prev = os.environ.get("SVGR_FUSED")
    try:
        os.environ["SVGR_FUSED"] = "0"
        l_ref = lower_scene(scene, tr, (0, 0, 384, 512), False, tile=64)
        ref = np.asarray(execute_lowered(l_ref, (0, 0), False))
        os.environ["SVGR_FUSED"] = "interp"
        lowered = lower_scene(scene, tr, (0, 0, 384, 512), False, tile=64)
        assert lowered.groups, "doc should need isolation passes"
        launches0, log0 = fallback_audit()
        out = np.asarray(execute_lowered(lowered, (0, 0), False))
        launches1, log1 = fallback_audit()
    finally:
        if prev is None:
            os.environ.pop("SVGR_FUSED", None)
        else:
            os.environ["SVGR_FUSED"] = prev
    assert log1[len(log0):] == (), f"tile-64 fell back: {log1[len(log0):]}"
    assert launches1 - launches0 >= 1 + len(lowered.groups)
    np.testing.assert_allclose(out, ref, atol=1e-5)

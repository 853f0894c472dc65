"""Randomized fused-executor equivalence sweep (slow lane).

test_fuzz_parity anchors the INTERPRETER to the reference; this sweep
anchors the fused Pallas executor (interpret mode) to the XLA executor on
random documents, across the kernel feature axes the curated fused tests
hit only pointwise: vstore (branch-free vout compose), zout (ring path
with in-kernel zero fill), kres (resident-pool phase-2 blends), and the
serial kernels with every one of them disabled.  Reuses the fuzz
generators of test_fuzz_parity so the documents mix gradients, strokes,
masks, group opacity, and clips.
"""

import os

import numpy as np
import pytest

import test_fuzz_parity as F
from svgrasterize_tpu import scene_from_str
from svgrasterize_tpu.core.transform import Transform
import svgrasterize_tpu.render_plan as rp

TR = Transform().matrix(0, 1, 0, 1, 0, 0)

# (env overrides, expected feature present, expected feature absent)
MODES = [
    ({}, None, None),  # defaults: vout+vstore on small canvases
    ({"SVGR_FUSED_VOUT": "0"}, "zout", "vout"),  # ring + zout
    ({"SVGR_FUSED_VOUT": "0", "SVGR_ZOUT": "0"}, None, "vout"),  # plain ring
    ({"SVGR_VSTORE": "0"}, None, "vstore"),  # branchy vout tail
    ({"SVGR_KVEC": "0"}, None, "kvec"),  # serial kernels
    ({"SVGR_PRETEX": "0"}, None, "pretex"),  # kres where tex/mask appear
    # launch-local pool gather (remapped tex/mask rows + in-place DUS)
    ({"SVGR_PRETEX": "0", "SVGR_SUBPOOL": "1"}, None, "pretex"),
    # Kogge-Stone scan compose tail (fp-reassociated vstore)
    ({"SVGR_KSCAN": "1"}, "kscan", None),
]

N = int(os.environ.get("SVGR_FUZZ_SWEEP", "3"))


def _docs(base: int, count: int):
    rng = np.random.default_rng(0)
    for seed in range(base, base + count):
        rng = np.random.default_rng(seed)
        yield F._random_doc(rng)


def _pattern_doc(rng) -> str:
    """Overlapping pattern/solid stacks: exercises the pattern branch of
    the static-run collapse (render_plan._paint_fields_np)."""
    pw, ph = int(rng.integers(8, 20)), int(rng.integers(8, 20))
    defs = (
        f'<pattern id="p" width="{pw}" height="{ph}" '
        'patternUnits="userSpaceOnUse">'
        f'<rect width="{pw // 2}" height="{ph // 2}" '
        f'fill="rgb({rng.integers(0, 256)},{rng.integers(0, 256)},'
        f'{rng.integers(0, 256)})"/></pattern>'
        f'<pattern id="q" width="14" height="12" '
        f'patternUnits="userSpaceOnUse" '
        f'patternTransform="rotate({rng.uniform(-30, 30):.1f})">'
        f'<circle cx="7" cy="6" r="5" fill="rgb({rng.integers(0, 256)},'
        f'{rng.integers(0, 256)},{rng.integers(0, 256)})"/></pattern>'
    )
    body = []
    for i in range(int(rng.integers(4, 9))):
        paint = ("url(#p)", "url(#q)",
                 f"rgb({rng.integers(0, 256)},0,128)")[i % 3]
        body.append(
            f'<rect x="{rng.integers(0, 90)}" y="{rng.integers(0, 90)}" '
            f'width="{rng.integers(30, 70)}" height="{rng.integers(30, 70)}" '
            f'fill="{paint}" fill-opacity="{rng.uniform(0.4, 1):.2f}"/>'
        )
    return (
        '<svg xmlns="http://www.w3.org/2000/svg" width="160" height="160">'
        f"<defs>{defs}</defs>{''.join(body)}</svg>"
    )


@pytest.mark.slow
@pytest.mark.parametrize("overrides,want,veto", MODES,
                         ids=lambda v: str(v)[:40])
def test_fused_random_docs_match_xla(overrides, want, veto):
    prev = {k: os.environ.get(k)
            for k in ("SVGR_FUSED", "SVGR_FUSED_VOUT", "SVGR_ZOUT",
                      "SVGR_VSTORE", "SVGR_KVEC", "SVGR_PRETEX",
                      "SVGR_SUBPOOL", "SVGR_KSCAN")}
    seen_want = False
    try:
        for doc in _docs(7000, N):
            scene, _ids, size = scene_from_str(doc)
            if scene is None:
                continue
            w, h = int(size[0]), int(size[1])
            viewport = (0, 0, h, w)
            lowered = rp.lower_scene(scene, TR, viewport, False, tile=32)
            if lowered is None:
                continue
            os.environ["SVGR_FUSED"] = "0"
            for k in ("SVGR_FUSED_VOUT", "SVGR_ZOUT", "SVGR_VSTORE",
                      "SVGR_KVEC", "SVGR_PRETEX", "SVGR_SUBPOOL",
                      "SVGR_KSCAN"):
                os.environ.pop(k, None)
            ref = np.asarray(rp.execute_lowered(lowered, (0, 0), False))
            os.environ["SVGR_FUSED"] = "interp"
            os.environ.update(overrides)
            got = np.asarray(rp.execute_lowered(lowered, (0, 0), False))
            feats = lowered.items["_device_cache"]["features"]
            if feats is not None:
                if want is not None and want in feats:
                    seen_want = True
                if veto is not None:
                    assert veto not in feats, (veto, feats)
            err = np.abs(ref - got).max()
            assert err <= 2e-5, (err, sorted(map(str, feats or [])), doc[:160])
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    del seen_want  # feature presence varies per doc; the veto is the gate


@pytest.mark.slow
def test_collapse_random_docs(monkeypatch):
    """Static-run collapse on random documents: the collapsed plan must
    match the uncollapsed plan (XLA executor both sides; the host f32
    coverage batch admits ~1e-3), the fused kernel must match the XLA
    executor exactly on the collapsed plan, and at least one generated
    doc must actually produce field items — this is the randomized guard
    for the 'pass the field stack through whole' plumbing invariant
    (render_plan._collapse_runs; the round-2 phantom-pad bug class)."""
    seen_fields = 0
    pat_docs = [
        _pattern_doc(np.random.default_rng(s)) for s in range(7900, 7900 + 2)
    ]
    for doc in [*_docs(7500, max(N, 4)), *pat_docs]:
        scene, _ids, size = scene_from_str(doc)
        if scene is None:
            continue
        w, h = int(size[0]), int(size[1])
        viewport = (0, 0, h, w)
        monkeypatch.setenv("SVGR_COLLAPSE", "0")
        low0 = rp.lower_scene(scene, TR, viewport, False, tile=32)
        monkeypatch.setenv("SVGR_COLLAPSE", "1")
        low1 = rp.lower_scene(scene, TR, viewport, False, tile=32)
        monkeypatch.delenv("SVGR_COLLAPSE", raising=False)
        if low0 is None or low1 is None:
            continue
        fidx = low1.items.get("field_idx")
        n_fields = 0 if fidx is None else int((fidx >= 0).sum())
        seen_fields += n_fields
        monkeypatch.setenv("SVGR_FUSED", "0")
        ref = np.asarray(rp.execute_lowered(low0, (0, 0), False))
        a = np.asarray(rp.execute_lowered(low1, (0, 0), False))
        monkeypatch.setenv("SVGR_FUSED", "interp")
        b = np.asarray(rp.execute_lowered(low1, (0, 0), False))
        monkeypatch.delenv("SVGR_FUSED", raising=False)
        err01 = np.abs(ref - a).max()
        assert err01 <= 2e-3, (err01, n_fields, doc[:160])
        errf = np.abs(a - b).max()
        assert errf <= 2e-5, (errf, n_fields, doc[:160])
    assert seen_fields >= 1, "no generated doc produced field items"

"""Randomized cross-implementation parity: generated SVGs, ours vs reference.

Each case builds a random document from the shared feature surface (shapes,
paths, gradients, opacity, groups, transforms, clips), renders it through
BOTH the reference numpy implementation and this framework's batched
executor, and compares at AA tolerance.  Complements the fixed golden-image
suite with coverage of feature combinations nobody hand-picked.
"""

import numpy as np
import pytest

from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.frontend.svg import scene_from_str

TR = Transform().matrix(0, 1, 0, 1, 0, 0)
SIZE = 160


def _random_doc(rng: np.random.Generator) -> str:
    defs = []
    body = []
    n_grads = rng.integers(1, 3)
    for g in range(n_grads):
        stops = "".join(
            f'<stop offset="{o:.2f}" stop-color="rgb({rng.integers(0,256)},'
            f'{rng.integers(0,256)},{rng.integers(0,256)})" '
            f'stop-opacity="{rng.uniform(0.4, 1):.2f}"/>'
            for o in sorted(rng.uniform(0, 1, size=rng.integers(2, 5)))
        )
        if rng.random() < 0.5:
            defs.append(
                f'<linearGradient id="g{g}" x1="{rng.uniform(0,1):.2f}" '
                f'y1="{rng.uniform(0,1):.2f}" x2="{rng.uniform(0,1):.2f}" '
                f'y2="{rng.uniform(0,1):.2f}">{stops}</linearGradient>'
            )
        else:
            defs.append(
                f'<radialGradient id="g{g}" cx="{rng.uniform(0.3,0.7):.2f}" '
                f'cy="{rng.uniform(0.3,0.7):.2f}" r="{rng.uniform(0.3,0.8):.2f}">'
                f"{stops}</radialGradient>"
            )
    defs.append(
        f'<clipPath id="c0"><circle cx="{rng.integers(40, 120)}" '
        f'cy="{rng.integers(40, 120)}" r="{rng.integers(30, 70)}"/></clipPath>'
    )

    def paint():
        r = rng.random()
        if r < 0.5:
            return f"rgb({rng.integers(0,256)},{rng.integers(0,256)},{rng.integers(0,256)})"
        return f"url(#g{rng.integers(0, n_grads)})"

    for _ in range(int(rng.integers(4, 10))):
        kind = rng.random()
        attrs = f'fill="{paint()}" fill-opacity="{rng.uniform(0.5, 1):.2f}"'
        if rng.random() < 0.25:
            attrs += ' clip-path="url(#c0)"'
        if rng.random() < 0.3:
            attrs += f' transform="rotate({rng.uniform(-40, 40):.1f} 80 80)"'
        if kind < 0.3:
            body.append(
                f'<rect x="{rng.integers(0, 100)}" y="{rng.integers(0, 100)}" '
                f'width="{rng.integers(20, 60)}" height="{rng.integers(20, 60)}" {attrs}/>'
            )
        elif kind < 0.55:
            body.append(
                f'<circle cx="{rng.integers(20, 140)}" cy="{rng.integers(20, 140)}" '
                f'r="{rng.integers(10, 40)}" {attrs}/>'
            )
        elif kind < 0.8:
            pts = rng.integers(10, 150, size=(3, 2))
            d = f"M{pts[0][0]} {pts[0][1]} "
            d += f"Q{pts[1][0]} {pts[1][1]} {pts[2][0]} {pts[2][1]} "
            d += f"C{rng.integers(10,150)} {rng.integers(10,150)} "
            d += f"{rng.integers(10,150)} {rng.integers(10,150)} {pts[0][0]} {pts[0][1]} Z"
            rule = "evenodd" if rng.random() < 0.3 else "nonzero"
            body.append(f'<path d="{d}" fill-rule="{rule}" {attrs}/>')
        else:
            inner = (
                f'<rect x="{rng.integers(0, 100)}" y="{rng.integers(0, 100)}" '
                f'width="{rng.integers(20, 60)}" height="{rng.integers(20, 60)}" '
                f'fill="{paint()}"/>'
                f'<circle cx="{rng.integers(20, 140)}" cy="{rng.integers(20, 140)}" '
                f'r="{rng.integers(10, 40)}" fill="{paint()}"/>'
            )
            body.append(f'<g opacity="{rng.uniform(0.3, 0.9):.2f}">{inner}</g>')

    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{SIZE}" height="{SIZE}">'
        f"<defs>{''.join(defs)}</defs>{''.join(body)}</svg>"
    )


@pytest.mark.parametrize("seed", [*range(8), 217])
def test_random_scene_matches_reference(reference, seed):
    rng = np.random.default_rng(seed)
    doc = _random_doc(rng)

    ref_scene, _ids, _size = reference.svg_scene_from_str(doc)
    ref_layer = ref_scene.render(
        reference.Transform().matrix(0, 1, 0, 1, 0, 0),
        viewport=(0, 0, SIZE, SIZE),
    )
    ref_img = np.zeros((SIZE, SIZE, 4))
    if ref_layer is not None:
        layer, _hull = ref_layer
        layer = layer.convert(pre_alpha=False, linear_rgb=False)
        x, y = layer.offset
        ref_img[x : x + layer.height, y : y + layer.width] = layer.image

    scene, _ids, _size = scene_from_str(doc)
    result = scene.render(TR, viewport=(0, 0, SIZE, SIZE))
    img = np.zeros((SIZE, SIZE, 4), np.float32)
    if result is not None:
        out, _hull = result
        out = out.convert(pre_alpha=False, linear_rgb=False)
        img[out.x : out.x + out.height, out.y : out.y + out.width] = np.asarray(out.image)

    # straight-alpha comparison is unstable where alpha ~ 0; compare
    # premultiplied values and alpha separately
    ours = img[..., :3] * img[..., 3:]
    refp = ref_img[..., :3] * ref_img[..., 3:]
    bad = (np.abs(ours - refp).max(-1) > 16 / 255) | (
        np.abs(img[..., 3] - ref_img[..., 3]) > 16 / 255
    )
    # allow a small AA-edge budget (documented per-draw vs group clipping
    # and stroke-join differences)
    assert bad.mean() < 0.004, f"{bad.sum()} px differ (seed {seed})"


@pytest.mark.parametrize("seed", range(100, 104))
def test_random_strokes_match_reference(reference, seed):
    """Stroked paths: looser budget (join split heuristics differ, README)."""
    rng = np.random.default_rng(seed)
    body = []
    for _ in range(int(rng.integers(3, 7))):
        pts = rng.integers(15, 145, size=(4, 2))
        d = (
            f"M{pts[0][0]} {pts[0][1]} L{pts[1][0]} {pts[1][1]} "
            f"Q{pts[2][0]} {pts[2][1]} {pts[3][0]} {pts[3][1]}"
        )
        if rng.random() < 0.4:
            d += " Z"
        cap = ["butt", "round", "square"][rng.integers(0, 3)]
        join = ["miter", "round", "bevel"][rng.integers(0, 3)]
        body.append(
            f'<path d="{d}" fill="none" '
            f'stroke="rgb({rng.integers(0,256)},{rng.integers(0,256)},{rng.integers(0,256)})" '
            f'stroke-width="{rng.uniform(1.5, 8):.1f}" stroke-linecap="{cap}" '
            f'stroke-linejoin="{join}" stroke-opacity="{rng.uniform(0.6, 1):.2f}"/>'
        )
    doc = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{SIZE}" height="{SIZE}">'
        f"{''.join(body)}</svg>"
    )

    ref_scene, _ids, _size = reference.svg_scene_from_str(doc)
    ref_layer = ref_scene.render(
        reference.Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, SIZE, SIZE)
    )
    ref_img = np.zeros((SIZE, SIZE, 4))
    if ref_layer is not None:
        layer, _hull = ref_layer
        layer = layer.convert(pre_alpha=False, linear_rgb=False)
        ref_img[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = layer.image

    scene, _ids, _size = scene_from_str(doc)
    result = scene.render(TR, viewport=(0, 0, SIZE, SIZE))
    img = np.zeros((SIZE, SIZE, 4), np.float32)
    if result is not None:
        out, _hull = result
        out = out.convert(pre_alpha=False, linear_rgb=False)
        img[out.x : out.x + out.height, out.y : out.y + out.width] = np.asarray(out.image)

    ours = img[..., :3] * img[..., 3:]
    refp = ref_img[..., :3] * ref_img[..., 3:]
    bad = (np.abs(ours - refp).max(-1) > 24 / 255) | (
        np.abs(img[..., 3] - ref_img[..., 3]) > 24 / 255
    )
    assert bad.mean() < 0.015, f"{bad.sum()} px differ (seed {seed})"


@pytest.mark.parametrize("seed", range(200, 204))
def test_random_patterns_masks_match_reference(reference, seed):
    """Patterns, masks, and bbox-units clips — the advanced shared surface."""
    rng = np.random.default_rng(seed)
    pw, ph = int(rng.integers(8, 20)), int(rng.integers(8, 20))
    defs = (
        f'<pattern id="p" width="{pw}" height="{ph}" patternUnits="userSpaceOnUse">'
        f'<rect width="{pw//2}" height="{ph//2}" fill="rgb({rng.integers(0,256)},'
        f'{rng.integers(0,256)},{rng.integers(0,256)})"/>'
        f'<circle cx="{pw//2}" cy="{ph//2}" r="{min(pw,ph)//3}" fill="rgb('
        f'{rng.integers(0,256)},{rng.integers(0,256)},{rng.integers(0,256)})"/></pattern>'
        f'<mask id="m"><rect x="{rng.integers(5,30)}" y="{rng.integers(5,30)}" '
        f'width="{rng.integers(80,130)}" height="{rng.integers(80,130)}" '
        f'fill="rgb(200,200,200)"/></mask>'
        f'<clipPath id="cb" clipPathUnits="objectBoundingBox">'
        f'<circle cx="0.5" cy="0.5" r="{rng.uniform(0.35, 0.55):.2f}"/></clipPath>'
    )
    body = []
    for _ in range(int(rng.integers(3, 6))):
        r = rng.random()
        extra = ""
        if r < 0.33:
            extra = ' mask="url(#m)"'
        elif r < 0.66:
            extra = ' clip-path="url(#cb)"'
        body.append(
            f'<rect x="{rng.integers(0, 90)}" y="{rng.integers(0, 90)}" '
            f'width="{rng.integers(30, 70)}" height="{rng.integers(30, 70)}" '
            f'fill="url(#p)"{extra}/>'
        )
    doc = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{SIZE}" height="{SIZE}">'
        f"<defs>{defs}</defs>{''.join(body)}</svg>"
    )

    ref_scene, _ids, _size = reference.svg_scene_from_str(doc)
    ref_layer = ref_scene.render(
        reference.Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, SIZE, SIZE)
    )
    ref_img = np.zeros((SIZE, SIZE, 4))
    if ref_layer is not None:
        layer, _hull = ref_layer
        layer = layer.convert(pre_alpha=False, linear_rgb=False)
        ref_img[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = layer.image

    scene, _ids, _size = scene_from_str(doc)
    result = scene.render(TR, viewport=(0, 0, SIZE, SIZE))
    img = np.zeros((SIZE, SIZE, 4), np.float32)
    if result is not None:
        out, _hull = result
        out = out.convert(pre_alpha=False, linear_rgb=False)
        img[out.x : out.x + out.height, out.y : out.y + out.width] = np.asarray(out.image)

    ours = img[..., :3] * img[..., 3:]
    refp = ref_img[..., :3] * ref_img[..., 3:]
    bad = (np.abs(ours - refp).max(-1) > 16 / 255) | (
        np.abs(img[..., 3] - ref_img[..., 3]) > 16 / 255
    )
    assert bad.mean() < 0.006, f"{bad.sum()} px differ (seed {seed})"


@pytest.mark.parametrize("seed", [*range(300, 308), 308])
def test_random_filter_chains_match_reference(reference, seed):
    """Random chains of the reference-executed filter primitives (blur,
    offset, colorMatrix, morphology, composite, merge).  Budget 2%:
    morphology windows amplify sub-threshold AA differences on curved
    inputs into multi-pixel bands (single-op morphology on axis-aligned
    shapes is pixel-exact)."""
    rng = np.random.default_rng(seed)
    prims = []
    last = None
    for i in range(rng.integers(1, 4)):
        k = rng.integers(0, 5)
        if k == 0:
            prims.append(
                f"<feGaussianBlur stdDeviation='{rng.uniform(0.5, 3):.2f}' result='p{i}'/>"
            )
        elif k == 1:
            prims.append(
                f"<feOffset dx='{rng.integers(-6, 7)}' dy='{rng.integers(-6, 7)}' result='p{i}'/>"
            )
        elif k == 2:
            prims.append(
                f"<feColorMatrix type='saturate' values='{rng.uniform(0, 2):.2f}' result='p{i}'/>"
            )
        elif k == 3:
            prims.append(
                f"<feMorphology operator='{rng.choice(['erode', 'dilate'])}'"
                f" radius='{rng.integers(1, 3)}' result='p{i}'/>"
            )
        else:
            prims.append(
                f"<feComposite in2='SourceGraphic'"
                f" operator='{rng.choice(['over', 'in', 'atop', 'xor'])}' result='p{i}'/>"
            )
        last = f"p{i}"
    prims.append(
        f"<feMerge><feMergeNode in='{last}'/><feMergeNode in='SourceGraphic'/></feMerge>"
    )
    shapes = []
    for _ in range(3):
        cx, cy, r = rng.uniform(20, 76), rng.uniform(20, 76), rng.uniform(8, 20)
        col = "#%02x%02x%02x" % tuple(rng.integers(0, 256, 3))
        shapes.append(
            f"<circle cx='{cx:.0f}' cy='{cy:.0f}' r='{r:.0f}' fill='{col}'"
            f" opacity='{rng.uniform(0.5, 1):.2f}'/>"
        )
    doc = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='96' height='96'>"
        f"<defs><filter id='f'>{''.join(prims)}</filter></defs>"
        f"<g filter='url(#f)'>{''.join(shapes)}</g></svg>"
    )

    def paste(dst, src, x, y):
        H, W = dst.shape[:2]
        h, w = src.shape[:2]
        r0, c0 = max(x, 0), max(y, 0)
        r1, c1 = min(x + h, H), min(y + w, W)
        if r0 < r1 and c0 < c1:
            dst[r0:r1, c0:c1] = src[r0 - x : r1 - x, c0 - y : c1 - y]

    rs, _i, _s = reference.svg_scene_from_str(doc)
    ref_img = np.zeros((96, 96, 4))
    out = rs.render(
        reference.Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 96, 96)
    )
    if out is not None:
        layer, _ = out
        layer = layer.convert(pre_alpha=False, linear_rgb=False)
        paste(ref_img, np.asarray(layer.image), layer.offset[0], layer.offset[1])

    scene, _a, _b = scene_from_str(doc)
    img = np.zeros((96, 96, 4), np.float32)
    r2 = scene.render(TR, viewport=(0, 0, 96, 96))
    if r2 is not None:
        o, _ = r2
        o = o.convert(pre_alpha=False, linear_rgb=False)
        paste(img, np.asarray(o.image), o.x, o.y)

    ours = img[..., :3] * img[..., 3:]
    refp = ref_img[..., :3] * ref_img[..., 3:]
    bad = (np.abs(ours - refp).max(-1) > 16 / 255) | (
        np.abs(img[..., 3] - ref_img[..., 3]) > 16 / 255
    )
    assert bad.mean() < 0.02, f"{bad.sum()} px differ (seed {seed})"

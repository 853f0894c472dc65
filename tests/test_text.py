"""Font subsystem tests: shaping parity with the reference implementation."""

import numpy as np
import pytest

from svgrasterize_tpu.text.fonts import DEFAULT_FONTS, FontsDB, font_weight


@pytest.fixture(scope="module")
def db():
    db = FontsDB()
    db.register_file(DEFAULT_FONTS)
    return db


@pytest.fixture(scope="module")
def ref_db(reference):
    db = reference.FontsDB()
    db.register_file("/root/reference/fonts.svgz")
    return db


def test_font_weight_parsing():
    assert font_weight(None) == 400
    assert font_weight("normal") == 400
    assert font_weight("bold") == 700
    assert font_weight("550") == 550


def test_resolve_families(db):
    mono = db.resolve("monospace")
    assert mono is not None and ("code" in mono.family.lower() or "iosevka" in mono.family.lower())
    assert db.resolve("sans") is not None
    assert db.resolve(None) is not None  # defaults to serif
    # unknown family falls back by generic classification
    assert "sans" in db.resolve("Helvetica Neue Sans").family.lower()


def test_resolve_weight_and_style():
    from svgrasterize_tpu.text.fonts import Font, FontsDB, Glyph

    def mk(weight, style):
        return Font("Fam", weight, style, 800, -200, 1000, {}, None, {})

    db = FontsDB()
    for w, s in [(400, "normal"), (700, "normal"), (400, "italic")]:
        db.register(mk(w, s))
    assert db.resolve("fam", 700).weight == 700
    assert db.resolve("fam", 500).weight == 400
    assert db.resolve("fam", 400, "italic").style == "italic"
    assert db.resolve("fam", 700, "oblique").style == "normal"  # style fallback


def test_shaping_matches_reference(db, ref_db):
    for family, text, size in [
        ("monospace", "Hello, World!", 16),
        ("sans", "affluent fjord", 20),  # ligature-rich
        ("Iosevka", "a=>b |> c", 14),
        ("serif", "AV To Wa", 12),  # kerning pairs
    ]:
        ours_font = db.resolve(family)
        ref_font = ref_db.resolve(family)
        assert ours_font.family == ref_font.family

        ours_path, ours_adv = ours_font.str_to_path(size, text)
        ref_path, ref_adv = ref_font.str_to_path(size, text)
        assert ours_adv == pytest.approx(ref_adv)
        assert len(ours_path.subpaths) == len(ref_path.subpaths)
        for sub_o, sub_r in zip(ours_path.subpaths, ref_path.subpaths):
            assert len(sub_o) == len(sub_r)
            for (k_o, pts_o), (k_r, pts_r) in zip(sub_o, sub_r):
                assert k_o == k_r
                np.testing.assert_allclose(pts_o, pts_r, atol=1e-9)


def test_missing_glyph_fallback(db):
    font = db.resolve("monospace")
    path, adv = font.str_to_path(16, "中")  # CJK char not in the font
    assert adv >= 0  # missing glyph renders its box (or nothing) without crashing


def test_text_path_layout(db):
    """textPath: glyphs follow the referenced curve with tangent rotation
    (beyond the reference, which lists textPath as not supported)."""
    import io

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='200' height='120'>
    <defs><path id='curve' d='M 20 100 C 60 20, 140 20, 180 100'/></defs>
    <text font-size='16' fill='black'>
      <textPath href='#curve'>Curved text!</textPath></text>
    </svg>"""
    scene, _ids, _size = scene_from_xml(io.StringIO(svg), fonts=db)
    assert scene is not None
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 120, 200)
    )
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    cov = img[..., 3] > 0.3
    assert cov.sum() > 200
    ys, xs = np.nonzero(cov)
    xs = xs + layer.y
    ys = ys + layer.x
    # the run starts at the curve start (bottom-left) and climbs the slope
    assert ys[xs < 35].mean() > ys[xs > 60].mean() + 15

    # startOffset=50% starts the run mid-curve (top): placement shifts right
    svg2 = svg.replace("<textPath ", "<textPath startOffset='50%' ")
    scene2, _i, _s = scene_from_xml(io.StringIO(svg2), fonts=db)
    layer2, _ = scene2.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 120, 200)
    )
    img2 = np.asarray(layer2.convert(pre_alpha=False, linear_rgb=False).image)
    ys2, xs2 = np.nonzero(img2[..., 3] > 0.3)
    assert (xs2 + layer2.y).min() > xs.min() + 40


@pytest.mark.parametrize("seed", range(4))
def test_random_text_matches_reference(db, ref_db, reference, seed):
    """End-to-end rasterized <text> parity (families, sizes, anchors,
    ligature-bearing strings) against the reference renderer."""
    import io

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    words = ["Alpha", "fi flow", "TPU raster!", "quick brown fox", "We offer AVATAR"]
    r = np.random.default_rng(seed)
    parts = []
    for _ in range(4):
        x, y = r.uniform(5, 120), r.uniform(15, 60)
        size = r.uniform(8, 20)
        fam = r.choice(["Source Sans Pro", "Source Serif Pro", "Source Code Pro"])
        anchor = r.choice(["start", "middle", "end"])
        t = words[r.integers(0, len(words))]
        parts.append(
            f"<text x='{x:.0f}' y='{y:.0f}' font-size='{size:.1f}'"
            f" font-family='{fam}' text-anchor='{anchor}'>{t}</text>"
        )
    doc = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='160' height='80'>"
        + "".join(parts)
        + "</svg>"
    )

    rs, _i, _s = reference.svg_scene_from_str(doc, fonts=ref_db)
    ref_img = np.zeros((80, 160, 4))
    out = rs.render(
        reference.Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 80, 160)
    )
    if out is not None:
        layer, _ = out
        layer = layer.convert(pre_alpha=False, linear_rgb=False)
        ref_img[
            layer.offset[0] : layer.offset[0] + layer.height,
            layer.offset[1] : layer.offset[1] + layer.width,
        ] = layer.image

    sc, _a, _b = scene_from_xml(io.StringIO(doc), fonts=db)
    img = np.zeros((80, 160, 4), np.float32)
    r2 = sc.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 80, 160)
    )
    if r2 is not None:
        o, _ = r2
        o = o.convert(pre_alpha=False, linear_rgb=False)
        img[o.x : o.x + o.height, o.y : o.y + o.width] = np.asarray(o.image)

    bad = np.abs(img[..., 3] - ref_img[..., 3]) > 16 / 255
    assert bad.mean() < 0.001, f"{bad.sum()} px differ (seed {seed})"


def test_text_path_stretch(db):
    """method="stretch" warps glyph outlines along the path instead of
    rigid per-glyph rotation; both methods must put ink on the curve."""
    import io

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    base = """<svg xmlns='http://www.w3.org/2000/svg' width='200' height='120'>
    <defs><path id='curve' d='M 20 100 C 60 20, 140 20, 180 100'/></defs>
    <text font-size='16' fill='black'>
      <textPath href='#curve' method='METHOD' spacing='auto'>Wavy words</textPath>
    </text></svg>"""
    imgs = {}
    for method in ("align", "stretch"):
        svg = base.replace("METHOD", method)
        scene, _ids, _size = scene_from_xml(io.StringIO(svg), fonts=db)
        assert scene is not None, method
        layer, _ = scene.render(
            Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 120, 200)
        )
        img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
        cov = img[..., 3] > 0.3
        assert cov.sum() > 200, method
        ys, xs = np.nonzero(cov)
        xs = xs + layer.y
        ys = ys + layer.x
        # ink follows the curve: the left end sits lower than the middle
        lo, hi = xs.min(), xs.max()
        left = ys[xs < lo + (hi - lo) / 4].mean()
        mid = ys[np.abs(xs - (lo + hi) / 2) < (hi - lo) / 6].mean()
        assert left > mid + 8, (method, left, mid)
        imgs[method] = cov
    # the two methods are genuinely different renderings
    a, b = imgs["align"], imgs["stretch"]
    assert a.shape != b.shape or (a != b).any()


def test_text_path_styled_tspans(db):
    """tspan children of a textPath are styled runs: each cascades its
    own fill/font-size and continues the pen along the arc (beyond the
    reference, which does not support textPath at all)."""
    import io

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    svg = """<svg xmlns='http://www.w3.org/2000/svg' width='200' height='80'>
    <defs><path id='c' d='M10 60 Q100 0 190 60'/></defs>
    <text font-size='16'><textPath href='#c'>Red <tspan fill='red'
    font-size='24'>BIG</tspan> tail</textPath></text></svg>"""
    scene, _ids, _size = scene_from_xml(io.StringIO(svg), fonts=db)
    assert scene is not None
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 80, 200)
    )
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    red = (img[..., 3] > 0.3) & (img[..., 0] > 0.5) & (img[..., 1] < 0.2)
    black = (img[..., 3] > 0.3) & (img[..., 0] < 0.05)
    assert red.sum() > 50, "styled tspan run must render in red"
    assert black.sum() > 50, "parent-styled runs must render in black"
    # the runs advance along the same arc: red ink sits between the
    # black 'Red' prefix and the black 'tail' suffix
    _, red_xs = np.nonzero(red)
    _, black_xs = np.nonzero(black)
    assert black_xs.min() < red_xs.min() < red_xs.max() < black_xs.max()


def test_xml_space_preserve():
    # xml:space="preserve" keeps space runs verbatim (beyond the reference);
    # default handling collapses them, so the preserved line must be wider
    from svgrasterize_tpu.frontend.svg import scene_from_str
    from svgrasterize_tpu.core.transform import Transform

    def text_width(body: str) -> float:
        doc = (
            '<svg xmlns="http://www.w3.org/2000/svg" width="400" height="40">'
            f"{body}</svg>"
        )
        from svgrasterize_tpu.text.fonts import DEFAULT_FONTS, FontsDB

        fonts = FontsDB()
        fonts.register_file(DEFAULT_FONTS)
        scene, _ids, _size = scene_from_str(doc, fonts=fonts)
        assert scene is not None
        _layer, hull = scene.render(
            Transform(), viewport=(0, 0, 40, 400)
        )
        pts = hull.raw_points
        return float(pts[:, 0].max() - pts[:, 0].min())

    plain = text_width('<text x="4" y="20" font-size="16">a   b</text>')
    kept = text_width(
        '<text x="4" y="20" font-size="16" xml:space="preserve">a   b</text>'
    )
    assert kept > plain + 1.0


def test_fonts_register_once():
    # the definition pre-pass must not duplicate <font> registrations
    # (fonts.svgz is <defs> wrapping the font elements)
    from svgrasterize_tpu.text.fonts import DEFAULT_FONTS, FontsDB

    db = FontsDB()
    db.register_file(DEFAULT_FONTS)
    fonts = db.all_fonts()
    assert len(fonts) == len({id(f) for f in fonts})
    by_key = {}
    for f in fonts:
        key = (f.family, f.weight, f.style)
        assert key not in by_key, f"duplicate registration: {key}"
        by_key[key] = f


def test_text_x_list_per_character(db):
    # x/dx lists position each character individually (SVG 1.1 10.5; the
    # reference crashes on list-valued x).  Each glyph must land in its
    # own column, and exhausted lists continue the pen normally.
    import io

    import numpy as np

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    doc = """<svg xmlns='http://www.w3.org/2000/svg' width='160' height='40'>
    <text x="10 60 110" y="24" font-size="16" font-family="monospace">iii</text>
    </svg>"""
    scene, _ids, _size = scene_from_xml(io.StringIO(doc), fonts=db)
    assert scene is not None
    layer, _ = scene.render(
        Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 40, 160)
    )
    img = np.zeros((40, 160), np.float32)
    a = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)[..., 3]
    img[layer.x : layer.x + layer.height, layer.y : layer.y + layer.width] = a
    cols = np.nonzero(img.max(axis=0) > 0.3)[0]
    # three well-separated clusters near x=10, 60, 110
    assert cols.min() >= 8 and cols.max() <= 125
    gaps = np.diff(cols)
    assert (gaps > 20).sum() == 2, f"expected 3 clusters, cols={cols}"


def test_tspan_display_visibility(db):
    # ADVICE r2: display/visibility were ignored on <tspan> (build_text has
    # its own walk).  visibility:hidden hides glyphs but keeps the pen
    # advance; display:none prunes the subtree INCLUDING its advance.
    import io

    from svgrasterize_tpu.frontend.svg import scene_from_xml

    def scene_of(body: str):
        doc = (
            "<svg xmlns='http://www.w3.org/2000/svg' width='300' height='40'>"
            f"{body}</svg>"
        )
        scene, _ids, _size = scene_from_xml(io.StringIO(doc), fonts=db)
        return scene

    plain = scene_of('<text x="4" y="24" font-size="16">ab<tspan>XY</tspan>cd</text>')
    hidden = scene_of(
        '<text x="4" y="24" font-size="16">ab'
        '<tspan visibility="hidden">XY</tspan>cd</text>'
    )
    display_none = scene_of(
        '<text x="4" y="24" font-size="16">ab'
        '<tspan display="none">XY</tspan>cd</text>'
    )
    gone = scene_of('<text x="4" y="24" font-size="16">ab<tspan/>cd</text>')
    no_tspan = scene_of('<text x="4" y="24" font-size="16">abcd</text>')

    # hidden tspan: XY's glyphs vanish but cd stays where it was (layout kept)
    assert repr(hidden) != repr(plain)
    assert repr(hidden) == repr(scene_of(
        '<text x="4" y="24" font-size="16">ab<tspan> </tspan>'
        '<tspan visibility="hidden">XY</tspan>'
        '<tspan visibility="hidden"> </tspan>cd</text>'
    )) or repr(hidden) != repr(gone)  # layout differs from full removal
    # display:none: identical to the tspan being empty (runs still split at
    # the element boundary, so it is not byte-identical to no tspan at all)
    assert repr(display_none) == repr(gone)
    assert repr(display_none) != repr(plain)
    del no_tspan
    # a nested tspan can reset visibility back to visible
    reset = scene_of(
        '<text x="4" y="24" font-size="16">ab<tspan visibility="hidden">X'
        '<tspan visibility="visible">Y</tspan></tspan>cd</text>'
    )
    assert repr(reset) != repr(hidden) and repr(reset) != repr(plain)


def test_text_path_tspan_repositioning(db):
    """x on a tspan inside textPath re-anchors the pen's arc position
    (SVG 1.1 10.13.2); dy shifts the baseline along the path normal.
    Closes the last documented text-layout gap (round-2 verdict #8)."""
    import io

    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.frontend.svg import scene_from_xml

    def cov_of(body: str):
        svg = (
            "<svg xmlns='http://www.w3.org/2000/svg' width='220' height='80'>"
            "<defs><path id='c' d='M10 40 L210 40'/></defs>"
            f"<text font-size='16'>{body}</text></svg>"
        )
        scene, _ids, _size = scene_from_xml(io.StringIO(svg), fonts=db)
        assert scene is not None
        layer, _ = scene.render(
            Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 80, 220)
        )
        img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
        cov = np.zeros((80, 220), bool)
        sub = img[..., 3] > 0.3
        cov[layer.x:layer.x + layer.height, layer.y:layer.y + layer.width] = sub
        return cov

    # x=120 re-anchors the second run far right of where the pen would be
    plain = cov_of("<textPath href='#c'>ab<tspan>cd</tspan></textPath>")
    moved = cov_of("<textPath href='#c'>ab<tspan x='120'>cd</tspan></textPath>")
    assert plain.any() and moved.any()
    assert moved.sum(0).nonzero()[0].max() > plain.sum(0).nonzero()[0].max() + 60

    # startOffset equivalence: re-anchoring to x=120 places 'cd' where a
    # startOffset=120 textPath places it (straight path from x=10: arc 120
    # lands at user x=130)
    anchored = cov_of(
        "<textPath href='#c' startOffset='120'>cd</textPath>"
    )
    moved_only = moved & ~plain  # the 'cd' ink (ab overlaps plain)
    a_cols = anchored.sum(0).nonzero()[0]
    m_cols = moved_only.sum(0).nonzero()[0]
    assert abs(int(a_cols.min()) - int(m_cols.min())) <= 2

    # x+y together: the new POINT projects onto the path (closest point).
    # The path starts at user x=10, so projecting (120, 70) re-anchors to
    # arc 110 — 10 px left of the arc-offset-120 anchor (x alone is a new
    # absolute offset ALONG the path per SVG 1.1 10.13.2, not a user-space
    # coordinate)
    proj = cov_of(
        "<textPath href='#c'>ab<tspan x='120' y='70'>cd</tspan></textPath>"
    )
    p_cols = (proj & ~plain).sum(0).nonzero()[0]
    assert abs(int(p_cols.min()) - (int(m_cols.min()) - 10)) <= 2

    # dy shifts the baseline off the path; rows move down
    dy = cov_of("<textPath href='#c'>ab<tspan dy='20'>cd</tspan></textPath>")
    dy_rows = (dy & ~plain).sum(1).nonzero()[0]
    base_rows = (moved_only).sum(1).nonzero()[0]
    assert dy_rows.max() > base_rows.max() + 10

"""Filter primitives beyond the reference's executed set.

The reference declares FE_FLOOD/FE_TILE/FE_COMPONENT_TRANSFER/FE_TURBULENCE
but has no interpreter cases for them (svgrasterize.py:1718-1732 vs
:1834-1900), so these are semantic tests rather than golden comparisons.
"""

import numpy as np
import pytest

from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.frontend.svg import scene_from_str

TR = Transform().matrix(0, 1, 0, 1, 0, 0)


def _render(doc: str):
    scene, _ids, size = scene_from_str(doc)
    w, h = int(size[0]), int(size[1])
    layer, _hull = scene.render(TR, viewport=(0, 0, h, w))
    out = layer.convert(pre_alpha=False, linear_rgb=False)
    img = np.zeros((h, w, 4), np.float32)
    r0, c0 = out.offset
    img[r0 : r0 + out.height, c0 : c0 + out.width] = np.asarray(out.image)
    return img


def test_fe_flood_fills_region():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f"><feFlood flood-color="lime" flood-opacity="0.5"/></filter></defs>
          <rect x="8" y="8" width="48" height="48" fill="red" filter="url(#f)"/>
        </svg>
        """
    )
    # the flood replaces the source over its extent: green at half opacity
    center = img[32, 32]
    assert center[1] > 0.9 and center[0] < 0.1
    assert abs(center[3] - 0.5) < 0.02


def test_fe_component_transfer_linear_and_table():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f"><feComponentTransfer>
            <feFuncR type="linear" slope="0.5" intercept="0.25"/>
            <feFuncG type="table" tableValues="1 0"/>
            <feFuncB type="gamma" amplitude="1" exponent="2" offset="0"/>
          </feComponentTransfer></filter></defs>
          <rect width="64" height="64" fill="rgb(255,255,128)" filter="url(#f)"/>
        </svg>
        """
    )
    center = img[32, 32]
    # linear: 1 * 0.5 + 0.25 = 0.75 (in linear RGB, read back through sRGB)
    import svgrasterize_tpu.core.color as color_ops

    lin = color_ops.srgb_to_linear(np.asarray(center, np.float64))[:3]
    assert abs(lin[0] - 0.75) < 0.02
    # table [1, 0] inverts: green 1 -> 0
    assert lin[1] < 0.02
    # gamma with exponent 2 squares the channel
    in_b = color_ops.srgb_to_linear(np.array([128 / 255, 1.0]))[0]
    assert abs(lin[2] - in_b**2) < 0.02


def test_fe_component_transfer_discrete():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f"><feComponentTransfer>
            <feFuncA type="discrete" tableValues="0.2 0.9"/>
          </feComponentTransfer></filter></defs>
          <rect width="64" height="64" fill="black" fill-opacity="0.9" filter="url(#f)"/>
        </svg>
        """
    )
    assert abs(img[32, 32, 3] - 0.9) < 0.02


def test_fe_tile_repeats_input():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f" filterUnits="userSpaceOnUse" x="0" y="0" width="64" height="64">
            <feTile/></filter></defs>
          <rect x="0" y="0" width="8" height="8" fill="blue" filter="url(#f)"/>
        </svg>
        """
    )
    # the 8x8 source tiles across its own extent: trivially identity here,
    # but must not crash and must preserve the source where defined
    assert img[4, 4, 2] > 0.9


def test_fe_turbulence_deterministic_and_bounded():
    doc = """
    <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
      <defs><filter id="f"><feTurbulence baseFrequency="0.1" numOctaves="2" seed="{seed}" type="{kind}"/></filter></defs>
      <rect width="64" height="64" fill="white" filter="url(#f)"/>
    </svg>
    """
    a = _render(doc.format(seed=5, kind="turbulence"))
    b = _render(doc.format(seed=5, kind="turbulence"))
    c = _render(doc.format(seed=7, kind="turbulence"))
    d = _render(doc.format(seed=5, kind="fractalNoise"))
    np.testing.assert_allclose(a, b)  # deterministic
    assert np.abs(a - c).max() > 0.01  # seed changes the field
    assert np.abs(a - d).max() > 0.01  # mode changes the field
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.std() > 0.01  # non-constant noise


def test_fe_turbulence_matches_spec_lattice():
    # the spec PRNG: first values from seed 1 are deterministic
    from svgrasterize_tpu.ops.turbulence import _random, lattice_tables

    assert _random(1) == 16807
    assert _random(16807) == 282475249
    selector, gradient = lattice_tables(1)
    assert sorted(selector[:256].tolist()) == list(range(256))
    assert np.allclose(np.linalg.norm(gradient[:, :256], axis=-1), 1.0, atol=1e-6)
    np.testing.assert_array_equal(selector[256:258], selector[:2])


def test_fe_convolve_matrix_identity_and_shift():
    base = """
    <svg xmlns="http://www.w3.org/2000/svg" width="48" height="48">
      <defs><filter id="f"><feConvolveMatrix order="3" kernelMatrix="{k}" edgeMode="none"/></filter></defs>
      <rect x="8" y="8" width="32" height="32" fill="rgb(64,128,192)" filter="url(#f)"/>
    </svg>
    """
    ident = _render(base.format(k="0 0 0 0 1 0 0 0 0"))
    plain = _render(base.format(k="0 0 0 0 1 0 0 0 0").replace(' filter="url(#f)"', ""))
    np.testing.assert_allclose(ident[12:36, 12:36], plain[12:36, 12:36], atol=0.02)
    # kernel with 1 in a corner shifts the image by one pixel
    shifted = _render(base.format(k="0 0 0 0 0 0 0 0 1"))
    np.testing.assert_allclose(
        shifted[13:35, 13:35], plain[12:34, 12:34], atol=0.02
    )


def test_fe_displacement_map():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f">
            <feFlood flood-color="rgb(255,128,128)" result="map"/>
            <feDisplacementMap in="SourceGraphic" in2="map" scale="20"
              xChannelSelector="R" yChannelSelector="G"/>
          </filter></defs>
          <rect x="16" y="16" width="32" height="32" fill="blue" filter="url(#f)"/>
        </svg>
        """
    )
    # channel values live in the filter's linear-RGB space: R(sRGB 255) -> 1.0
    # displaces user x by +10 (sampling col+10: content shifts LEFT, clipped
    # to the source layer extent); G(sRGB 128) -> ~0.216 displaces user y by
    # ~-5.7 (content shifts DOWN ~6 rows)
    assert img[32, 20, 2] > 0.9  # inside displaced content
    assert img[32, 42, 3] < 0.1  # old right edge now empty
    assert img[46, 32, 2] > 0.9  # shifted down
    assert img[18, 32, 3] < 0.1  # old top rows now empty


def test_fe_diffuse_lighting_distant():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="48" height="48">
          <defs><filter id="f">
            <feDiffuseLighting surfaceScale="1" diffuseConstant="1" lighting-color="white">
              <feDistantLight azimuth="0" elevation="30"/>
            </feDiffuseLighting></filter></defs>
          <rect x="4" y="4" width="40" height="40" fill="black" filter="url(#f)"/>
        </svg>
        """
    )
    import svgrasterize_tpu.core.color as color_ops

    # flat interior: N = (0,0,1), N.L = sin(30deg) = 0.5 in linear RGB
    lin = color_ops.srgb_to_linear(np.asarray(img[24, 24], np.float64))[:3]
    np.testing.assert_allclose(lin, 0.5, atol=0.02)
    assert img[24, 24, 3] > 0.99  # diffuse lighting alpha = 1


def test_fe_specular_lighting_point():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="48" height="48">
          <defs><filter id="f">
            <feSpecularLighting surfaceScale="4" specularConstant="1"
                specularExponent="8" lighting-color="white">
              <fePointLight x="24" y="24" z="20"/>
            </feSpecularLighting></filter></defs>
          <circle cx="24" cy="24" r="18" fill="black" fill-opacity="0.9" filter="url(#f)"/>
        </svg>
        """
    )
    # highlight under the light is brighter than the rim
    assert img[24, 24, 3] > img[24, 38, 3]
    assert img[24, 24, 0] > 0.5


def test_fe_drop_shadow():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="96" height="96">
          <defs><filter id="f"><feDropShadow dx="12" dy="12" stdDeviation="1"
            flood-color="blue" flood-opacity="0.8"/></filter></defs>
          <rect x="16" y="16" width="40" height="40" fill="red" filter="url(#f)"/>
        </svg>
        """
    )
    assert img[32, 32, 0] > 0.9  # original on top
    # shadow visible offset by (12, 12) beyond the rect's lower-right corner
    shadow = img[62, 62]
    assert shadow[2] > 0.5 and shadow[0] < 0.4
    assert shadow[3] > 0.5


def test_fe_image_fragment():
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs>
            <g id="frag"><circle cx="12" cy="12" r="10" fill="lime"/></g>
            <filter id="f">
              <feImage href="#frag" result="im"/>
              <feComposite in="im" in2="SourceGraphic" operator="over"/>
            </filter>
          </defs>
          <rect x="24" y="24" width="36" height="36" fill="blue" filter="url(#f)"/>
        </svg>
        """
    )
    assert img[12, 12, 1] > 0.9  # fragment circle rendered by the filter
    assert img[40, 40, 2] > 0.9  # source rect still beneath


def test_fe_image_data_uri_raster():
    # external resources: a base64 data: PNG stretched onto its subregion
    import base64

    from svgrasterize_tpu.core.png import write_png

    tile = np.zeros((4, 4, 4), np.uint8)
    tile[:2, :2] = [255, 0, 0, 255]
    tile[2:, 2:] = [255, 0, 0, 255]
    tile[:2, 2:] = [0, 0, 255, 255]
    tile[2:, :2] = [0, 0, 255, 255]
    uri = "data:image/png;base64," + base64.b64encode(
        write_png(tile).getvalue()
    ).decode()
    img = _render(
        f"""
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f" x="0" y="0" width="64" height="64"
                        filterUnits="userSpaceOnUse">
            <feImage href="{uri}" x="8" y="8" width="32" height="32"/>
          </filter></defs>
          <rect x="0" y="0" width="64" height="64" fill="green" filter="url(#f)"/>
        </svg>
        """
    )
    assert img[12, 12, 0] > 0.8 and img[12, 12, 2] < 0.2   # red quadrant
    assert img[12, 36, 2] > 0.8 and img[12, 36, 0] < 0.2   # blue quadrant
    assert img[50, 50, 3] < 0.05                           # outside the box


def test_fe_image_data_uri_svg():
    import base64

    inner = (
        "<svg xmlns='http://www.w3.org/2000/svg' width='64' height='64'>"
        "<circle cx='16' cy='16' r='12' fill='red'/></svg>"
    )
    uri = "data:image/svg+xml;base64," + base64.b64encode(inner.encode()).decode()
    img = _render(
        f"""
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
          <defs><filter id="f">
            <feImage href="{uri}" result="im"/>
            <feComposite in="im" in2="SourceGraphic" operator="over"/>
          </filter></defs>
          <rect x="32" y="32" width="30" height="30" fill="blue" filter="url(#f)"/>
        </svg>
        """
    )
    assert img[16, 16, 0] > 0.8   # embedded SVG circle
    assert img[48, 48, 2] > 0.8   # source rect beneath


def test_vertex_frames_arcs():
    from svgrasterize_tpu.geom.path import Path

    path = Path.from_svg("M10 20 A10 10 0 0 1 30 20 L40 35")
    frames = path.vertex_frames()
    assert len(frames) == 1 and len(frames[0]) == 3
    p0, d_in0, d_out0 = frames[0][0]
    assert d_in0 is None
    np.testing.assert_allclose(p0, [10, 20], atol=1e-6)
    # the arc starts sweeping upward (negative y) from the left endpoint
    assert d_out0[1] < 0
    p2, d_in2, d_out2 = frames[0][2]
    np.testing.assert_allclose(p2, [40, 35], atol=1e-6)
    assert d_out2 is None


def test_primitive_subregion_clips_result():
    # x/y/width/height on any primitive clip its result (SVG 15.7.5);
    # the reference ignores subregions entirely
    img = _render(
        """
        <svg xmlns="http://www.w3.org/2000/svg" width="64" height="32">
          <defs><filter id="f" x="0" y="0" width="64" height="32"
                        filterUnits="userSpaceOnUse">
            <feGaussianBlur stdDeviation="2" x="0" y="0" width="28"
                            height="32" result="b"/>
            <feMerge><feMergeNode in="b"/>
            <feMergeNode in="SourceGraphic"/></feMerge>
          </filter></defs>
          <rect x="4" y="8" width="56" height="16" fill="red" filter="url(#f)"/>
        </svg>
        """
    )
    assert img[6, 10, 3] > 0.05   # blur halo inside the subregion
    assert img[6, 50, 3] < 0.01   # no halo where the subregion clipped it


def test_color_interpolation_filters_srgb():
    """color-interpolation-filters="sRGB" runs the filter chain in sRGB
    space (Inkscape's default export; the reference only does linearRGB):
    a blur between saturated colors mixes darker in sRGB than in linear."""
    import numpy as np

    from svgrasterize_tpu import scene_from_str
    from svgrasterize_tpu.core.layer import merge_at
    from svgrasterize_tpu.core.transform import Transform

    base = """<svg xmlns='http://www.w3.org/2000/svg' width='64' height='32'>
    <defs><filter id='b'{attr}><feGaussianBlur stdDeviation='3'/></filter></defs>
    <g filter='url(#b)'>
      <rect x='0' y='0' width='32' height='32' fill='#ff0000'/>
      <rect x='32' y='0' width='32' height='32' fill='#00ff00'/>
    </g></svg>"""

    def render(attr):
        scene, _i, _s = scene_from_str(base.format(attr=attr))
        layer, _ = scene.render(
            Transform().matrix(0, 1, 0, 1, 0, 0), viewport=(0, 0, 32, 64)
        )
        canvas = np.zeros((32, 64, 4), np.float32)
        li = layer.convert(pre_alpha=False, linear_rgb=False)
        return np.asarray(merge_at(canvas, li.image, li.offset))

    lin = render("")
    srgb = render(" color-interpolation-filters='sRGB'")
    # at the seam both channels mix 50/50; linear-space mixing then
    # converting to sRGB gives ~0.735 per channel, sRGB-space gives 0.5
    seam_lin = lin[16, 31:33, :2].mean()
    seam_srgb = srgb[16, 31:33, :2].mean()
    assert seam_lin > 0.65, seam_lin
    assert seam_srgb < 0.60, seam_srgb
    # in the interior (away from the seam AND the outer alpha ramp) the
    # halves are identical in both modes
    assert np.abs(lin[16, 16] - srgb[16, 16]).max() < 1e-3

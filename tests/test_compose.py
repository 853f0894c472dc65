"""Porter-Duff operators and blend modes: identities and reference parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from svgrasterize_tpu.ops import compose as co


@pytest.fixture()
def imgs():
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 1, size=(6, 7, 4)).astype(np.float32)
    b = rng.uniform(0, 1, size=(6, 7, 4)).astype(np.float32)
    # premultiply
    a[..., :3] *= a[..., 3:]
    b[..., :3] *= b[..., 3:]
    return jnp.asarray(a), jnp.asarray(b)


def test_porter_duff_identities(imgs):
    dst, src = imgs
    zero = jnp.zeros_like(dst)
    # OVER with transparent src/dst
    np.testing.assert_allclose(co.compose(co.COMPOSE_OVER, dst, zero), dst, atol=1e-6)
    np.testing.assert_allclose(co.compose(co.COMPOSE_OVER, zero, src), src, atol=1e-6)
    # IN against opaque dst is src
    opaque = jnp.ones_like(dst)
    np.testing.assert_allclose(co.compose(co.COMPOSE_IN, opaque, src), src, atol=1e-6)
    # XOR with itself on alpha: a*(1-a)*2 formula sanity via direct eval
    out = co.compose(co.COMPOSE_XOR, dst, src)
    expect = src * (1 - dst[..., -1:]) + dst * (1 - src[..., -1:])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_arithmetic_mode(imgs):
    dst, src = imgs
    out = co.compose((0.5, 0.25, 0.25, 0.1), dst, src)
    expect = np.clip(0.5 * src * dst + 0.25 * src + 0.25 * dst + 0.1, 0, 1)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_blend_modes_reduce_to_over_when_transparent_dst(imgs):
    _dst, src = imgs
    zero = jnp.zeros_like(src)
    for mode in ("multiply", "screen", "darken", "lighten"):
        out = co.compose(mode, zero, src)
        np.testing.assert_allclose(out, src, atol=1e-6, err_msg=mode)


def test_blend_modes_opaque_semantics():
    # opaque solid colors: blend modes must match their straight definitions
    dst = jnp.asarray([[[0.5, 0.25, 0.8, 1.0]]], dtype=jnp.float32)
    src = jnp.asarray([[[0.4, 0.9, 0.2, 1.0]]], dtype=jnp.float32)
    cases = {
        "multiply": dst[..., :3] * src[..., :3],
        "screen": dst[..., :3] + src[..., :3] - dst[..., :3] * src[..., :3],
        "darken": jnp.minimum(dst[..., :3], src[..., :3]),
        "lighten": jnp.maximum(dst[..., :3], src[..., :3]),
    }
    for mode, expect in cases.items():
        out = co.compose(mode, dst, src)
        np.testing.assert_allclose(out[..., :3], expect, atol=1e-6, err_msg=mode)
        np.testing.assert_allclose(out[..., 3], 1.0, atol=1e-6)


def test_fe_blend_dispatch():
    from svgrasterize_tpu.core.layer import Layer
    from svgrasterize_tpu.filter import Filter

    base = Filter.empty().blend(None, None, "multiply")
    src = Layer(
        jnp.full((4, 4, 4), 0.5, dtype=jnp.float32), (0, 0), pre_alpha=True, linear_rgb=True
    )
    out = base(None, src)
    assert out.image.shape == (4, 4, 4)

"""The dense closed-form coverage kernel must match the reference's
scanline-accumulate-then-cumsum algorithm to numerical precision."""

import numpy as np
import pytest

from svgrasterize_tpu.ops import coverage, fill_rule


def reference_winding(ref, lines, h, w):
    trace = np.zeros((h, w), dtype=np.float64)
    for line in lines:
        ref.line_signed_coverage(trace, line.reshape(2, 2))
    return np.cumsum(trace, axis=1)


def run_case(ref, lines, h, w):
    lines = np.asarray(lines, dtype=np.float64)
    expected = reference_winding(ref, lines, h, w)
    got = np.asarray(coverage.winding(coverage.pad_lines(lines), h, w))
    np.testing.assert_allclose(got, expected, atol=5e-5)


def test_simple_triangle(reference):
    lines = [
        [1.0, 1.0, 9.0, 2.0],
        [9.0, 2.0, 5.0, 9.0],
        [5.0, 9.0, 1.0, 1.0],
    ]
    run_case(reference, lines, 12, 12)


def test_horizontal_lines_ignored(reference):
    lines = [[3.0, 1.0, 3.0, 9.0]]
    run_case(reference, lines, 8, 12)


def test_steep_and_shallow(reference):
    lines = [
        [0.2, 0.7, 7.9, 0.9],      # nearly vertical (in row direction)
        [1.0, 0.0, 2.0, 11.5],     # very shallow
        [6.5, 11.0, 0.5, 3.0],     # reversed direction
    ]
    run_case(reference, lines, 8, 12)


def test_out_of_bounds_clipping(reference):
    lines = [
        [-3.0, -4.0, 5.0, 2.0],    # starts above-left of canvas
        [2.0, -5.0, 9.0, -1.0],    # fully left: full winding contribution
        [1.0, 20.0, 7.0, 25.0],    # fully right: dropped
        [-5.0, 3.0, 20.0, 4.0],    # spans rows beyond canvas
    ]
    run_case(reference, lines, 10, 10)


def test_random_fuzz(reference):
    rng = np.random.default_rng(42)
    for _ in range(6):
        n = int(rng.integers(1, 40))
        lines = rng.uniform(-5, 25, size=(n, 4))
        run_case(reference, lines, 20, 24)


def test_subpixel_geometry(reference):
    rng = np.random.default_rng(7)
    lines = rng.uniform(3.0, 4.0, size=(30, 4))
    run_case(reference, lines, 8, 8)


def test_fill_rules(reference):
    # two overlapping CCW squares -> winding 2 in the middle
    def square(r0, c0, r1, c1):
        return [
            [r0, c0, r0, c1],
            [r0, c1, r1, c1],
            [r1, c1, r1, c0],
            [r1, c0, r0, c0],
        ]

    lines = np.array(square(1, 1, 8, 8) + square(4, 4, 11, 11), dtype=np.float64)
    wind = coverage.winding(coverage.pad_lines(lines), 14, 14)
    nz = np.asarray(fill_rule.apply(wind, "nonzero"))
    eo = np.asarray(fill_rule.apply(wind, "evenodd"))
    assert nz[5, 5] == pytest.approx(1.0)
    assert eo[5, 5] == pytest.approx(0.0)   # winding 2 -> even -> empty
    assert nz[2, 2] == pytest.approx(1.0)
    assert eo[2, 2] == pytest.approx(1.0)
    assert nz[12, 12] == pytest.approx(0.0)

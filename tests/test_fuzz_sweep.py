"""Extended fresh-seed fuzz sweep (slow; run with -m slow).

Re-runs the four generators of test_fuzz_parity.py on seed ranges beyond
the default suite's fixed lists.  SVGR_FUZZ_SWEEP widens the per-generator
seed count (default 5 per generator keeps the slow lane quick; a 90-seed
sweep of ranges 20-50/120-140/220-240/320-340 passed clean on 2026-08-17).
"""

import os

import pytest

import test_fuzz_parity as F

N = int(os.environ.get("SVGR_FUZZ_SWEEP", "5"))

SWEEPS = [
    (F.test_random_scene_matches_reference, 20),
    (F.test_random_strokes_match_reference, 120),
    (F.test_random_patterns_masks_match_reference, 220),
    (F.test_random_filter_chains_match_reference, 320),
]


@pytest.mark.slow
@pytest.mark.parametrize("case,base", SWEEPS, ids=lambda v: getattr(v, "__name__", v))
def test_extended_sweep(reference, case, base):
    for seed in range(base, base + N):
        case(reference, seed)

"""Quantified parity against the REFERENCE'S OWN shipped renders
(VERDICT r2 item 4): not self-goldens (tests/test_goldens.py covers
drift) but the reference repo's published images, located inside their
desktop screenshots by tools/parity.py's cross-correlation alignment.

Pure numpy — compares the committed render evidence in docs/images/
against /root/reference/assets/. Thresholds are set from the measured
round-3 values with headroom (alignment score is the canary: if the
panel localization ever breaks, the score collapses long before the
error rows drift)."""

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
ASSETS = pathlib.Path("/root/reference/assets")


def _imread(p):
    iio = pytest.importorskip("imageio.v2")
    return iio.imread(p)[..., :3].astype(np.float32)


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets absent")
def test_cornell_2048spp_matches_reference_golden():
    """Our converged Cornell render vs the reference's 2048-spp
    screenshot (README.md:563): the render panel sits 1:1 in the
    screenshot; after alignment the converged MEANS must agree — 16x16
    box means within a few 8-bit counts (both renders carry independent
    Monte-Carlo noise, so per-pixel equality is not expected)."""
    from tools.parity import aligned_pair, find_alignment, metrics

    ref = _imread(ASSETS / "path-tracing-2048spp.png")
    ours = _imread(REPO / "docs" / "images" / "cornell_1024_2048spp.png")
    score, scale, oy, ox = find_alignment(ref, ours, [1.0])
    assert score > 0.5, f"panel localization degenerated: {score}"
    o, r = aligned_pair(ref, ours, scale, oy, ox)
    m = metrics(o, r, 16)
    # measured r3: channel_mean_abs_diff=2.44, box16_mean=4.96,
    # box16_p99=40.1 (u8 counts of 255)
    assert m["channel_mean_abs_diff"] <= 5.0, m
    assert m["box16_mean_abs_err"] <= 8.0, m
    assert m["box16_p99"] <= 60.0, m

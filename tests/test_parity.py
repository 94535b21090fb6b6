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


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets absent")
def test_whitted_glass_matches_reference_golden():
    """Our whitted render of the main.cpp demo vs the reference's
    `raytracing_glass_reflectandrefract.png` desktop capture.

    Two reference quirks enter the comparison:
      * the capture shows R and B SWAPPED — the reference fills R,G,B
        planes (Render.hpp:121-129) but displays them via cv::imshow,
        which reads Mat data as BGR (Render.cpp:61-63);
      * the GUI demo spins the cow/crate 10 deg/frame; the screenshot
        caught frame 27 — a 270-deg sweep-fit of our render minimizes
        the cow-region error (4.2/255 vs 40+/255 at wrong angles).
    docs/images/whitted_glass_270deg_1024.png is rendered at that angle
    (examples/whitted_demo.py scene, spp=16, the RayTracing.hpp:12
    default). Whitted is deterministic given the emitter pick, so the
    residual is panel rescaling (the capture is ~1.67x display-scaled)
    plus the engine's f32-vs-f64 shading differences."""
    from tools.parity import aligned_pair, find_alignment, metrics

    ref = _imread(ASSETS / "raytracing_glass_reflectandrefract.png")
    ref = ref[..., ::-1].copy()  # undo the imshow BGR swap
    ours = _imread(REPO / "docs" / "images" / "whitted_glass_270deg_1024.png")
    score, scale, oy, ox = find_alignment(ref, ours, [1.67])
    assert score > 0.4, f"panel localization degenerated: {score}"
    o, r = aligned_pair(ref, ours, scale, oy, ox)
    m = metrics(o, r, 16)
    # measured r3: channel_mean_abs_diff=2.33, box16_mean=1.89,
    # box16_p90=3.1, box16_p99=19.5 (u8 counts of 255)
    assert m["channel_mean_abs_diff"] <= 5.0, m
    assert m["box16_mean_abs_err"] <= 4.0, m
    assert m["box16_p99"] <= 40.0, m

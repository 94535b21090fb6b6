"""Quantified parity vs the reference's SHIPPED renders (VERDICT r2 #4).

The reference publishes its renders only as full-desktop screenshots
(`/root/reference/assets/path-tracing-2048spp.png`,
`raytracing_glass_reflectandrefract.png`; README.md:563-599), so a
numeric comparison must first LOCATE the render panel: this tool finds
the (scale, offset) that maximizes FFT cross-correlation between the
screenshot luminance and our render, then reports per-channel mean
error and block-downsampled error percentiles over the overlap.

Block downsampling (default 16x16 box) is the right metric for the
stochastic pipelines: two converged-but-differently-seeded Monte-Carlo
renders differ per pixel by shot noise; their local MEANS must agree.
Scale-resampling of the screenshot (Windows display scaling) softens
edges, which the percentile rows absorb.

Usage:
    python tools/parity.py --ref /root/reference/assets/path-tracing-2048spp.png \
        --ours docs/images/cornell_1024_2048spp.png --scales 1.0
Prints one JSON line; PARITY.md records the per-asset results.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _imread(path):
    import imageio.v2 as iio

    return iio.imread(path)[..., :3].astype(np.float32)


def find_alignment(ref, ours, scales):
    """Best (score, scale, oy, ox) placing scaled `ours` inside `ref`.

    Offsets may be negative / run past the edge (the reference window is
    clipped by the screenshot); scoring uses mean-removed luminance
    cross-correlation, exact up to FFT rounding."""
    from numpy.fft import irfft2, rfft2

    r = ref.mean(-1)
    rm = r - r.mean()
    h, w = r.shape
    best = None
    side = ours.shape[0]
    for s in scales:
        n = int(round(side * s))
        idx = (np.arange(n) / s).astype(int).clip(0, side - 1)
        o = ours.mean(-1)[np.ix_(idx, idx)]
        o = o[: min(n, h), : min(n, w)]
        h0, w0 = o.shape
        om = o - o.mean()
        f = rfft2(rm, (h + h0, w + w0))
        g = rfft2(om[::-1, ::-1], (h + h0, w + w0))
        corr = irfft2(f * g, (h + h0, w + w0))
        i, j = np.unravel_index(np.argmax(corr), corr.shape)
        v = float(corr[i, j] / np.sqrt((rm ** 2).sum() * (om ** 2).sum()))
        cand = (v, s, int(i - h0 + 1), int(j - w0 + 1))
        if best is None or v > best[0]:
            best = cand
    return best


def aligned_pair(ref, ours, scale, oy, ox, trim: int = 8):
    """Overlapping (ours, ref) crops at the found placement, `trim`
    pixels shaved from each overlap edge (window borders / resampling
    ringing sit exactly on the panel boundary)."""
    side = ours.shape[0]
    n = int(round(side * scale))
    idx = (np.arange(n) / scale).astype(int).clip(0, side - 1)
    o = ours[np.ix_(idx, idx)]
    y0, x0 = max(0, oy), max(0, ox)
    y1 = min(ref.shape[0], oy + n)
    x1 = min(ref.shape[1], ox + n)
    o = o[y0 - oy + trim: y1 - oy - trim, x0 - ox + trim: x1 - ox - trim]
    r = ref[y0 + trim: y1 - trim, x0 + trim: x1 - trim]
    return o, r


def box(x, k):
    h, w, c = x.shape
    return x[: h // k * k, : w // k * k].reshape(
        h // k, k, w // k, k, c
    ).mean((1, 3))


def metrics(o, r, k: int = 16):
    d = np.abs(box(o, k) - box(r, k))
    return {
        "overlap_px": int(o.shape[0] * o.shape[1]),
        "mean_ours": [round(float(v), 2) for v in o.mean((0, 1))],
        "mean_ref": [round(float(v), 2) for v in r.mean((0, 1))],
        "channel_mean_abs_diff": round(
            float(np.abs(o.mean((0, 1)) - r.mean((0, 1))).max()), 2
        ),
        f"box{k}_mean_abs_err": round(float(d.mean()), 2),
        f"box{k}_p90": round(float(np.percentile(d, 90)), 1),
        f"box{k}_p99": round(float(np.percentile(d, 99)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[1.0, 1.25, 1.5, 1.6, 1.66, 1.75, 2.0])
    ap.add_argument("--trim", type=int, default=8)
    ap.add_argument("--box", type=int, default=16)
    ap.add_argument("--swap-rb", action="store_true",
                    help="reverse the screenshot's R/B channels first: the "
                    "reference fills R,G,B planes (Render.hpp:121-129) but "
                    "displays them through cv::imshow, which reads BGR "
                    "(Render.cpp:61-63) — the whitted/raster desktop "
                    "captures ship with red and blue swapped")
    args = ap.parse_args()

    ref = _imread(args.ref)
    if args.swap_rb:
        ref = ref[..., ::-1].copy()
    ours = _imread(args.ours)
    score, scale, oy, ox = find_alignment(ref, ours, args.scales)
    o, r = aligned_pair(ref, ours, scale, oy, ox, args.trim)
    out = {
        "ref": args.ref,
        "ours": args.ours,
        "align_score": round(score, 4),
        "scale": scale,
        "offset": [oy, ox],
    }
    out.update(metrics(o, r, args.box))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

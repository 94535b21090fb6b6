"""Native C++ runtime library vs pure-Python implementations
(native/srt_native.cpp; builds on demand via make)."""

import subprocess

import numpy as np
import pytest

from software_rasterizer_tpu.ops import bvh as B
from software_rasterizer_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.available():
        try:
            subprocess.run(["make", "-C", "native"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pytest.skip("native toolchain unavailable")
        native._TRIED = False  # re-probe after build
        if not native.available():
            pytest.skip("native library failed to load")


def _tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 1, 3))
    return (base + rng.normal(0, 0.4, (n, 3, 3))).astype(np.float32)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 100, 1000])
def test_native_bvh_matches_python(n):
    tris = _tris(n)
    lo, hi = B.primitive_bounds(tris[:, 0], tris[:, 1], tris[:, 2])
    areas = B.triangle_areas(tris[:, 0], tris[:, 1], tris[:, 2])
    nat = B.build_bvh(lo, hi, areas, use_native=True)
    py = B.build_bvh(lo, hi, areas, use_native=False)
    np.testing.assert_array_equal(nat.left, py.left)
    np.testing.assert_array_equal(nat.right, py.right)
    np.testing.assert_array_equal(nat.prim, py.prim)
    np.testing.assert_array_equal(nat.bb_min, py.bb_min)
    np.testing.assert_array_equal(nat.bb_max, py.bb_max)
    np.testing.assert_allclose(nat.area, py.area, rtol=1e-6)


def test_native_obj_parse_matches_python():
    from software_rasterizer_tpu.scenes.cornell import _SMALL, _LARGE, _FLOOR

    for src in (_FLOOR, _SMALL, _LARGE):
        out = native.parse_obj_native(src)
        assert out is not None
        pos, nrm, uv, corners = out

        # python reference parse of the same fields
        ppos, pnrm, puv, pcorners = [], [], [], []
        for line in src.splitlines():
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                ppos.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vn":
                pnrm.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vt":
                puv.append([float(x) for x in parts[1:3]])
            elif parts[0] == "f":
                cs = []
                for tok in parts[1:]:
                    fs = tok.split("/")
                    vi = int(fs[0]) - 1
                    ti = int(fs[1]) - 1 if len(fs) > 1 and fs[1] else -1
                    ni = int(fs[2]) - 1 if len(fs) > 2 and fs[2] else -1
                    cs.append((vi, ti, ni))
                for k in range(1, len(cs) - 1):
                    pcorners += [cs[0], cs[k], cs[k + 1]]

        np.testing.assert_allclose(pos, np.asarray(ppos, np.float32))
        np.testing.assert_allclose(nrm, np.asarray(pnrm, np.float32))
        assert uv.shape[0] == len(puv)
        np.testing.assert_array_equal(corners, np.asarray(pcorners, np.int32))


def test_native_obj_parse_real_asset(models_dir):
    path = models_dir / "spot" / "spot_triangulated_good.obj"
    if not path.exists():
        pytest.skip("spot asset missing")
    text = path.read_text(errors="replace")
    out = native.parse_obj_native(text)
    assert out is not None
    pos, nrm, uv, corners = out
    assert pos.shape[0] > 1000 and corners.shape[0] % 3 == 0
    assert (corners[:, 0] >= 0).all() and (corners[:, 0] < pos.shape[0]).all()

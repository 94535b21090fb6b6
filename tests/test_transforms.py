"""Unit tests for camera/model matrices vs. hand-computed glm oracles."""

import numpy as np
import pytest

from software_rasterizer_tpu.utils import transforms as tf


def test_look_at_lh_properties():
    eye = np.array([0.0, 0.0, -0.9], np.float32)
    center = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    m = tf.look_at_lh(eye, center, up)
    # eye maps to origin
    assert np.allclose(tf.transform_points_h(m, eye[None])[0], 0.0, atol=1e-6)
    # center is straight ahead on +z (left-handed forward)
    c = tf.transform_points_h(m, center[None])[0]
    assert np.allclose(c[:2], 0.0, atol=1e-6)
    assert c[2] > 0
    # rigid: preserves distances
    pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    out = (m[:3, :3] @ pts.T).T + m[:3, 3]
    d_in = np.linalg.norm(pts[0] - pts[1])
    d_out = np.linalg.norm(out[0] - out[1])
    assert np.isclose(d_in, d_out, rtol=1e-5)


def test_look_at_lh_identity_frame():
    # Looking down +z from origin with +y up: identity rotation.
    m = tf.look_at_lh([0, 0, 0], [0, 0, 1], [0, 1, 0])
    assert np.allclose(m, np.eye(4), atol=1e-7)


def test_perspective_lh_no_oracle():
    # glm::perspectiveLH_NO formula check at an untruncated fov.
    fovy, aspect, near, far = 1.0, 2.0, 0.1, 100.0
    m = tf.perspective_lh_no(fovy, aspect, near, far)
    th = np.tan(fovy / 2)
    assert np.isclose(m[0, 0], 1 / (aspect * th), rtol=1e-6)
    assert np.isclose(m[1, 1], 1 / th, rtol=1e-6)
    assert np.isclose(m[2, 2], (far + near) / (far - near), rtol=1e-6)
    assert np.isclose(m[2, 3], -2 * far * near / (far - near), rtol=1e-6)
    assert m[3, 2] == 1.0 and m[3, 3] == 0.0
    # depth range: z=near -> -1, z=far -> +1 (NO convention)
    for z, want in [(near, -1.0), (far, 1.0)]:
        p = tf.transform_points_h(m, np.array([[0, 0, z]], np.float32))[0]
        assert np.isclose(p[2], want, atol=1e-4)


def test_ndc_matrix_quirk():
    # Scene.cpp:329 — x scale = width/2 * aspect (quirk), y not flipped.
    m = tf.ndc_to_screen(1024, 512)
    assert m[0, 0] == 1024 / 2 * 2.0
    assert m[1, 1] == 256.0
    assert m[0, 3] == 512.0 and m[1, 3] == 256.0


def test_model_trs_order():
    # T*R*S: scale first, then rotate, then translate.
    m = tf.model_trs([0, 1, 0], 90.0, [1.0, 2.0, 3.0], [2.0, 2.0, 2.0])
    p = tf.transform_points_h(m, np.array([[1.0, 0.0, 0.0]]))[0]
    # scale -> (2,0,0); rotate 90 about y (glm: x->-z... check via matrix)
    r = tf.rotate_axis_angle([0, 1, 0], np.pi / 2)
    expected = (r[:3, :3] @ np.array([2.0, 0.0, 0.0])) + np.array([1, 2, 3])
    assert np.allclose(p, expected, atol=1e-5)


def test_rotate_axis_angle_matches_rodrigues():
    rng = np.random.RandomState(1)
    axis = rng.randn(3)
    angle = 0.7
    m = tf.rotate_axis_angle(axis, angle)[:3, :3]
    # Rodrigues oracle
    k = axis / np.linalg.norm(axis)
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    oracle = np.eye(3) + np.sin(angle) * kx + (1 - np.cos(angle)) * kx @ kx
    assert np.allclose(m, oracle, atol=1e-6)
    assert np.isclose(np.linalg.det(m), 1.0, atol=1e-6)


def test_normal_transforms_differ_between_paths():
    # Raster path divides by w (Scene.cpp:939 quirk); RT path is mat3 + normalize.
    model = tf.model_trs([0, 1, 0], 30.0, [0.1, 0.2, 0.3], [2.0, 1.0, 0.5])
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    raster_n = tf.transform_normals_raster(model, n)
    rt_n = tf.transform_normals_rt(model, n)
    assert np.isclose(np.linalg.norm(rt_n[0]), 1.0, atol=1e-5)
    # For a nonuniform scale + translation they must not coincide.
    assert not np.allclose(raster_n, rt_n, atol=1e-4)


def test_rt_normals_nonuniform_scale_oracle():
    # Normals under nonuniform scale must use inverse-transpose.
    model = np.diag([2.0, 1.0, 1.0, 1.0]).astype(np.float32)
    n = np.array([[1.0, 1.0, 0.0]], np.float32) / np.sqrt(2)
    out = tf.transform_normals_rt(model, n)[0]
    # Surface x+2y=c scaled by x'=2x has normal (0.5, 1)/|.|
    expected = np.array([0.5, 1.0, 0.0]) / np.linalg.norm([0.5, 1.0, 0.0])
    assert np.allclose(out, expected, atol=1e-5)


def test_z_remap_and_raster_vertex_transform():
    scale, offset = tf.z_remap_params(0.1, 100.0)
    assert np.isclose(scale, 49.95) and np.isclose(offset, 50.05)
    # full raster stage runs and lands inside the screen for a visible point
    w = h = 64
    view = tf.look_at_lh([0, 0, -0.9], [0, 0, 0], [0, 1, 0])
    proj = tf.perspective_lh_no(45.0, 1.0, 0.1, 100.0)  # reference quirk: 45 raw
    ndc = tf.ndc_to_screen(w, h)
    model = tf.model_trs([0, 1, 0], 0.0, [0, 0, 0], [0.1, 0.1, 0.1])
    pos = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]], np.float32)
    nrm = np.array([[0, 0, -1], [0, 1, 0]], np.float32)
    p, n = tf.raster_vertex_transform(pos, nrm, model, view, proj, ndc, 0.1, 100.0)
    assert p.shape == (2, 3) and n.shape == (2, 3)
    # the origin point projects to screen center
    assert np.allclose(p[0, :2], [w / 2, h / 2], atol=1e-3)
    # z remap keeps depth in [near, far] band
    assert 0.0 < p[0, 2] < 100.5


def test_decompose_max_scale():
    m = tf.model_trs([0, 0, 1], 33.0, [1, 2, 3], [0.2, 0.5, 0.3])
    assert np.isclose(tf.decompose_max_scale(m), 0.5, atol=1e-6)

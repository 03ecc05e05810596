"""Geometry unit tests: world<->image round trips, rigid conventions.

These pin the IRTK conventions (the highest-risk layer per SURVEY.md §7):
i2w = T(origin) R(axes) S(spacing) T(-(n-1)/2), Euler-degree rigid matrices,
region/resample grid bookkeeping.
"""
import numpy as np
import pytest

from fetalreconstruction_tpu.core.geometry import (
    ImageAttributes, rigid_matrix, matrix_to_params, invert_rigid,
    rigid_matrix_jax, invert_rigid_jax)


def make_attr():
    a = ImageAttributes(x=32, y=40, z=24, dx=1.25, dy=1.25, dz=2.5)
    a.xorigin, a.yorigin, a.zorigin = 10.0, -5.0, 3.5
    # a rotated but orthonormal axis set
    th = np.deg2rad(30.0)
    a.xaxis = (np.cos(th), np.sin(th), 0.0)
    a.yaxis = (-np.sin(th), np.cos(th), 0.0)
    a.zaxis = (0.0, 0.0, 1.0)
    return a


def test_i2w_w2i_inverse():
    a = make_attr()
    assert np.allclose(a.i2w() @ a.w2i(), np.eye(4), atol=1e-10)


def test_centre_maps_to_origin():
    a = make_attr()
    centre = np.array([(a.x - 1) / 2, (a.y - 1) / 2, (a.z - 1) / 2])
    w = a.image_to_world(centre)
    assert np.allclose(w, [a.xorigin, a.yorigin, a.zorigin], atol=1e-12)


def test_round_trip_points():
    a = make_attr()
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 30, size=(100, 3))
    w = a.image_to_world(pts)
    back = a.world_to_image(w)
    assert np.allclose(back, pts, atol=1e-9)


def test_spacing_scales_world_distance():
    a = make_attr()
    p0 = a.image_to_world([0, 0, 0])
    p1 = a.image_to_world([1, 0, 0])
    assert np.isclose(np.linalg.norm(p1 - p0), a.dx)
    p2 = a.image_to_world([0, 0, 1])
    assert np.isclose(np.linalg.norm(p2 - p0), a.dz)


def test_rigid_identity():
    m = rigid_matrix([0, 0, 0, 0, 0, 0])
    assert np.allclose(m, np.eye(4))


def test_rigid_matrix_reference_values():
    # rx=90deg: IRTK convention has R[1,2]=sin(rx)*cos(ry)=1
    m = rigid_matrix([0, 0, 0, 90, 0, 0])
    assert np.isclose(m[1, 2], 1.0)
    assert np.isclose(m[2, 1], -1.0)
    assert np.isclose(m[0, 0], 1.0)
    # ry=90: R[0,2] = -sin(ry) = -1
    m = rigid_matrix([0, 0, 0, 0, 90, 0])
    assert np.isclose(m[0, 2], -1.0)
    # rz=90: R[0,1] = cos(ry)*sin(rz) = 1
    m = rigid_matrix([0, 0, 0, 0, 0, 90])
    assert np.isclose(m[0, 1], 1.0)


def test_params_matrix_round_trip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        p = np.concatenate([rng.uniform(-20, 20, 3),
                            rng.uniform(-80, 80, 3)])
        m = rigid_matrix(p)
        p2 = matrix_to_params(m)
        assert np.allclose(rigid_matrix(p2), m, atol=1e-10)
        assert np.allclose(p2, p, atol=1e-8)


def test_rigid_matrix_is_rotation():
    p = [1.0, -2.0, 3.0, 10.0, 20.0, 30.0]
    m = rigid_matrix(p)
    r = m[:3, :3]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(r), 1.0)


def test_invert_rigid():
    p = [1.0, -2.0, 3.0, 10.0, 20.0, 30.0]
    m = rigid_matrix(p)
    assert np.allclose(invert_rigid(m) @ m, np.eye(4), atol=1e-12)


def test_jax_rigid_matches_numpy():
    rng = np.random.default_rng(2)
    params = np.concatenate([rng.uniform(-20, 20, (8, 3)),
                             rng.uniform(-80, 80, (8, 3))], axis=1)
    mj = np.asarray(rigid_matrix_jax(params.astype(np.float32)))
    for i in range(8):
        assert np.allclose(mj[i], rigid_matrix(params[i]), atol=1e-4)
    inv = np.asarray(invert_rigid_jax(mj))
    for i in range(8):
        assert np.allclose(inv[i] @ mj[i], np.eye(4), atol=1e-4)


def test_region_preserves_world_positions():
    a = make_attr()
    sub = a.region(4, 6, 2, 20, 30, 14)
    # voxel (0,0,0) of region == voxel (4,6,2) of original
    w_sub = sub.image_to_world([0, 0, 0])
    w_orig = a.image_to_world([4, 6, 2])
    assert np.allclose(w_sub, w_orig, atol=1e-9)
    w_sub = sub.image_to_world([5, 5, 5])
    w_orig = a.image_to_world([9, 11, 7])
    assert np.allclose(w_sub, w_orig, atol=1e-9)


def test_with_spacing_grid():
    a = ImageAttributes(x=64, y=64, z=20, dx=1.0, dy=1.0, dz=3.0)
    b = a.with_spacing(2.0, 2.0, 2.0)
    # matches irtkResampling: int(n*old/new)
    assert (b.x, b.y, b.z) == (32, 32, 30)
    # world centre preserved
    assert np.allclose(b.origin, a.origin)

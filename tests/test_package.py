"""Package splitting geometry tests."""
import numpy as np

from fetalreconstruction_tpu.core.geometry import ImageAttributes
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.register.package import (
    split_image, split_image_even_odd, split_image_even_odd_half, half_image)


def make_stack(nz=12):
    a = ImageAttributes(x=6, y=5, z=nz, dx=1.0, dy=1.0, dz=2.0)
    a.xorigin, a.yorigin, a.zorigin = 4.0, -3.0, 7.0
    data = np.zeros(a.shape_zyx, np.float32)
    for k in range(nz):
        data[k] = k  # slice index as value
    return Image(data, a)


def test_split_image_interleave_and_geometry():
    img = make_stack(12)
    packs = split_image(img, 2)
    assert len(packs) == 2
    assert packs[0].attr.z == 6 and packs[1].attr.z == 6
    assert packs[0].attr.dz == 4.0
    # package 0 holds even slices, package 1 odd
    assert np.all(packs[0].data[:, 0, 0] == [0, 2, 4, 6, 8, 10])
    assert np.all(packs[1].data[:, 0, 0] == [1, 3, 5, 7, 9, 11])
    # world positions preserved: package voxel (0,0,k) == stack (0,0,2k+l)
    for l, p in enumerate(packs):
        for k in range(p.attr.z):
            w_pkg = p.attr.image_to_world([0, 0, k])
            w_stk = img.attr.image_to_world([0, 0, 2 * k + l])
            assert np.allclose(w_pkg, w_stk, atol=1e-9), (l, k)


def test_split_image_uneven():
    img = make_stack(13)
    packs = split_image(img, 2)
    assert packs[0].attr.z == 7 and packs[1].attr.z == 6
    w_pkg = packs[0].attr.image_to_world([0, 0, 6])
    w_stk = img.attr.image_to_world([0, 0, 12])
    assert np.allclose(w_pkg, w_stk, atol=1e-9)


def test_split_even_odd_and_half():
    img = make_stack(16)
    packs = split_image_even_odd(img, 2)
    assert len(packs) == 4
    assert sum(p.attr.z for p in packs) == 16
    # even/odd of package 0 (slices 0,2,..,14): evens 0,4,8,12
    assert np.all(packs[0].data[:, 0, 0] == [0, 4, 8, 12])
    halves = half_image(packs[0])
    assert len(halves) == 2
    assert halves[0].attr.z == 2 and halves[1].attr.z == 2
    deep = split_image_even_odd_half(img, 2, 1)
    assert sum(p.attr.z for p in deep) == 16
    # all world positions still map to original slices
    for p in deep:
        for k in range(p.attr.z):
            w = p.attr.image_to_world([0, 0, k])
            z = img.attr.world_to_image(w)[2]
            assert abs(z - round(z)) < 1e-6
            assert p.data[k, 0, 0] == round(z)

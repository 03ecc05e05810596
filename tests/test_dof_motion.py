"""Tests for .dof interop and the motion estimator."""
import numpy as np

from fetalreconstruction_tpu.core.geometry import rigid_matrix
from fetalreconstruction_tpu.io.dof import (read_dof, write_dof,
                                            save_transformations,
                                            read_transformations)
from fetalreconstruction_tpu.utils.motion import (evaluate_stack_motion,
                                                  select_template)
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.core.geometry import ImageAttributes


def test_dof_round_trip(tmp_path):
    p = [2.0, -1.5, 3.0, 10.0, -5.0, 7.5]
    m = rigid_matrix(p)
    path = str(tmp_path / "t.dof")
    write_dof(path, m)
    back = read_dof(path)
    assert np.allclose(back, m, atol=1e-10)
    # gz variant
    path2 = str(tmp_path / "t.dof.gz")
    write_dof(path2, m)
    assert np.allclose(read_dof(path2), m, atol=1e-10)


def test_transform_folder_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    ts = np.stack([rigid_matrix(np.concatenate(
        [rng.uniform(-5, 5, 3), rng.uniform(-20, 20, 3)]))
        for _ in range(7)])
    folder = str(tmp_path / "dofs")
    save_transformations(folder, ts)
    back = read_transformations(folder, 7)
    assert np.allclose(back, ts, atol=1e-10)


def test_motion_score_ranks_stacks():
    rng = np.random.default_rng(1)
    a = ImageAttributes(x=24, y=24, z=12, dx=1.0, dy=1.0, dz=3.0)
    base = rng.uniform(0, 100, (24, 24)).astype(np.float32)
    # still stack: identical slices (rank ~1)
    still = Image(np.repeat(base[None], 12, axis=0), a)
    # moving stack: each slice shifted (high rank)
    moving_data = np.stack([np.roll(base, (k, 2 * k), axis=(0, 1))
                            for k in range(12)])
    moving = Image(moving_data.astype(np.float32), a.copy())
    s_still = evaluate_stack_motion(still)
    s_moving = evaluate_stack_motion(moving)
    assert s_still < s_moving, (s_still, s_moving)
    assert select_template([moving, still]) == 1

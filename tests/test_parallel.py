"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
the TPU analogue of a fake-NCCL backend)."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gaitlab.parallel import make_mesh, param_shardings, shard_params


def test_mesh_shape():
    mesh = make_mesh(8, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh.axis_names == ("data", "model")


def test_param_shardings_split_large_replicate_small():
    mesh = make_mesh(8, model=2)
    tree = {
        "big": np.zeros((256, 512), np.float32),
        "small": np.zeros((3,), np.float32),
        "odd": np.zeros((7, 11, 13), np.float32),  # nothing divisible by 2
    }
    sh = param_shardings(tree, mesh, min_elems=1024)
    assert sh["big"].spec == P(None, "model")
    assert sh["small"].spec == P()
    assert sh["odd"].spec == P()
    placed = shard_params(tree, mesh, min_elems=1024)
    np.testing.assert_array_equal(np.asarray(placed["big"]), tree["big"])


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    kp3d, theta = jax.jit(fn)(*args)
    assert kp3d.shape[0] == 1 and kp3d.shape[-1] == 3
    assert theta.shape[-1] == 85
    assert np.all(np.isfinite(np.asarray(kp3d)))


def test_gait_loss():
    import jax.numpy as jnp

    from gaitlab.training import gait_loss

    b, t = 2, 5
    avg = jnp.ones((b, 3))
    phase = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 1.0]), (b, t, 1))
    total, m = gait_loss(avg, phase, avg, phase)
    assert float(total) < 1e-6  # perfect prediction -> zero loss
    # orthogonal phase -> cos loss of 1 per pair
    phase_bad = jnp.tile(jnp.asarray([0.0, 1.0, 1.0, 0.0]), (b, t, 1))
    total2, _ = gait_loss(avg, phase_bad, avg, phase)
    assert float(total2) == pytest.approx(2.0, rel=1e-4)


def test_train_step_decreases_loss():
    import optax

    from gaitlab import training
    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore

    module = GRNetCore()
    batch = training.synthetic_batch(2, img=64)
    params = module.init(jax.random.PRNGKey(0), batch["images"][:1])
    smpl = body_smpl.synthetic_smpl_params()
    opt = optax.adam(1e-3)
    state = training.create_train_state(params, opt)
    # Random-init weak-perspective scale sits near the projection
    # singularity, so supervise the smooth 3D/pose/shape terms only.
    weights = training.LossWeights(kp_2d=0.0, kp_3d=300.0, pose=60.0, shape=1.0)
    step = jax.jit(training.make_train_step(module, smpl, opt, weights=weights))

    state, m0 = step(state, batch)
    for _ in range(4):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 5

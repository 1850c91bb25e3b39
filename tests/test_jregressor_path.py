"""vp_regress external-J_regressor path (reference pare.py:70-76: H36M
regressor over vertices, J14 subset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaitlab.body import smpl as body_smpl
from gaitlab.core import geometry
from gaitlab.nn.grnet import vp_regress


def test_vp_regress_with_external_regressor(rng):
    params = body_smpl.synthetic_smpl_params()
    n = 3
    aa = rng.normal(size=(n, 24, 3)).astype(np.float32) * 0.2
    rotmat = geometry.axis_angle_to_rotmat(
        jnp.asarray(aa.reshape(-1, 3))).reshape(n, 24, 3, 3)
    patt = {
        "pred_pose": rotmat,
        "pred_shape": jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32)
                                  * 0.03),
        "pred_cam": jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (n, 1)),
    }
    # synthetic 17-row H36M-style regressor
    jr = rng.random((17, params.v_template.shape[0])).astype(np.float32) ** 6
    jr = jr / jr.sum(1, keepdims=True)

    out = vp_regress(params, patt, batch_size=1,
                     J_regressor=jnp.asarray(jr))[0]
    assert out["kp_3d"].shape == (1, n, 14, 3)  # H36M_TO_J14 subset
    # matches direct regression + gather
    direct = jnp.einsum("jv,nvk->njk", jnp.asarray(jr), out["verts"][0])
    expect = np.asarray(direct)[:, list(body_smpl.H36M_TO_J14)]
    np.testing.assert_allclose(np.asarray(out["kp_3d"][0]), expect,
                               rtol=2e-4, atol=1e-5)

    # default path keeps the 29-joint spin2 output
    out2 = vp_regress(params, patt, batch_size=1)[0]
    assert out2["kp_3d"].shape == (1, n, 29, 3)

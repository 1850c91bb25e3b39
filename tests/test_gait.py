"""Tests: gait-feature encoder, TS-attention corrector, GRNet gait wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_bigru_matches_torch():
    """Flax BiGRU == torch nn.GRU(bidirectional=True) with imported weights."""
    import torch

    from gaitlab.nn.gait import BiGRU

    b, t, d, h, layers = 2, 7, 12, 5, 2
    x = np.random.default_rng(0).normal(size=(b, t, d)).astype(np.float32)

    tg = torch.nn.GRU(input_size=d, hidden_size=h, num_layers=layers,
                      batch_first=True, bidirectional=True)
    with torch.no_grad():
        t_out, t_h = tg(torch.from_numpy(x))
    t_h = t_h.permute(1, 0, 2).reshape(b, -1)

    model = BiGRU(hidden_size=h, num_layers=layers)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # import torch GRU weights: torch stacks gates [r|z|n] rows
    params = variables["params"]

    def set_cell(cell, w_ih, w_hh, b_ih, b_hh):
        wr, wz, wn = np.split(w_ih, 3, axis=0)
        ur, uz, un = np.split(w_hh, 3, axis=0)
        br, bz, bn = np.split(b_ih, 3)
        hbr, hbz, hbn = np.split(b_hh, 3)
        cell["ir"]["kernel"] = jnp.asarray(wr.T)
        cell["iz"]["kernel"] = jnp.asarray(wz.T)
        cell["in"]["kernel"] = jnp.asarray(wn.T)
        cell["ir"]["bias"] = jnp.asarray(br + 0)
        cell["iz"]["bias"] = jnp.asarray(bz + 0)
        cell["in"]["bias"] = jnp.asarray(bn + 0)
        cell["hr"]["kernel"] = jnp.asarray(ur.T)
        cell["hz"]["kernel"] = jnp.asarray(uz.T)
        cell["hn"]["kernel"] = jnp.asarray(un.T)
        cell["hn"]["bias"] = jnp.asarray(hbn + 0)
        # flax GRUCell has no hr/hz bias; torch's b_hr/b_hz fold into the
        # input biases because they are added pre-sigmoid identically
        cell["ir"]["bias"] = jnp.asarray(br + hbr)
        cell["iz"]["bias"] = jnp.asarray(bz + hbz)

    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    for layer in range(layers):
        for direction, name in [(0, f"l{layer}_fwd"), (1, f"l{layer}_bwd")]:
            sfx = f"_l{layer}" + ("_reverse" if direction else "")
            set_cell(params[name], sd[f"weight_ih{sfx}"],
                     sd[f"weight_hh{sfx}"], sd[f"bias_ih{sfx}"],
                     sd[f"bias_hh{sfx}"])

    out, h_final = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_final), t_h.numpy(), atol=2e-5)


def test_positional_encoding_matches_reference():
    import math

    import torch

    from gaitlab.nn.gait import add_positional_encoding, positional_encoding

    d_model, max_len = 32, 20
    pe = torch.zeros(max_len, d_model)
    position = torch.arange(0, max_len).unsqueeze(1)
    div = torch.exp(torch.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    got = np.asarray(positional_encoding(max_len, d_model))
    np.testing.assert_allclose(got, pe.numpy(), atol=1e-5)

    x = jnp.ones((2, max_len, d_model))
    out = np.asarray(add_positional_encoding(x))
    np.testing.assert_allclose(out, 1.0 + np.broadcast_to(
        pe.numpy()[None], out.shape), atol=1e-5)


def test_gait_encoder_shapes():
    from gaitlab.nn.gait import GaitFeatEncoder

    b, t, j, c = 2, 10, 24, 16
    enc = GaitFeatEncoder(num_joints=j, feat_dim=c, h_size=8, fc_size=6)
    x = jnp.ones((b, t, j, c))
    cp = jnp.ones((b, t, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, cp)
    avg, phase, xc = enc.apply(variables, x, cp)
    assert avg.shape == (b, 3)
    assert phase.shape == (b, t, 4)
    assert xc.shape == (b, t, j, c)
    assert np.all(np.abs(np.asarray(phase)) <= 1.0)  # tanh


@pytest.mark.parametrize("use_jwff", [False, True])
def test_feat_corrector_shapes(use_jwff):
    from gaitlab.nn.gait import FeatCorrector

    b, t, j, c = 1, 12, 24, 16
    fc = FeatCorrector(num_joints=j, feat_dim=c, h_size=64, num_heads=4,
                       use_jwff=use_jwff)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, j, c))
    cp = jnp.ones((b, t, 3)) * 0.5
    variables = fc.init(jax.random.PRNGKey(0), x, cp)
    corrected, avg, phase = fc.apply(variables, x, cp)
    assert corrected.shape == (b, t, j, c)
    assert avg.shape == (b, 3) and phase.shape == (b, t, 4)
    # residual design: correction shifts, not replaces
    assert np.all(np.isfinite(np.asarray(corrected)))


def test_camera_reparam_matches_reference_formula():
    from gaitlab.nn.gait import camera_reparam

    rng = np.random.default_rng(0)
    n = 6
    cam = rng.normal(size=(n, 3)).astype(np.float32) * 0.1 + np.array(
        [0.9, 0, 0], np.float32)
    bbox = np.abs(rng.normal(size=(n, 4))).astype(np.float32) * 100 + 100
    cimg = np.full((n, 2), 160.0, np.float32)
    got = np.asarray(camera_reparam(jnp.asarray(cam), jnp.asarray(bbox),
                                    jnp.asarray(cimg)))
    bs = bbox[:, 2] / 224.0
    t_bb = bbox[:, :2] - cimg
    scale = bs[:, None] * cam[:, 0:1]
    ref = np.concatenate([scale, t_bb / scale / 112.0 + cam[:, 1:]], axis=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_grnet_gait_forward():
    from gaitlab.nn.grnet import GRNet

    model = GRNet.create(use_gait_feat=True, featcorr_h_size=64)
    n = 4
    images = jnp.zeros((n, 64, 64, 3))
    bbox = jnp.ones((n, 4)) * 150.0
    cimg = jnp.ones((n, 2)) * 120.0
    out = model.forward(images, bbox=bbox, cimg=cimg)[0]
    assert out["theta"].shape == (1, n, 85)
    assert out["pred_avg"].shape == (1, 3)
    assert out["pred_phase"].shape == (1, n, 4)
    assert out["pred_cparam"].shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out["theta"])))

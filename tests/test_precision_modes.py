"""Precision-mode qualification (VERDICT r1 next-step #2): the runner's
default precision must be a mode the committed TPU study measured inside
the 0.5 mm MPJPE budget, and the mode must actually thread into the jitted
forward. The study itself (scripts/precision_study.py) runs on the real
chip and writes docs/PRECISION.json; this test pins the contract between
that artifact and the production default."""

import json
import os.path as osp

import numpy as np
import pytest

PRECISION_JSON = osp.join(osp.dirname(__file__), "..", "docs",
                          "PRECISION.json")


def _study():
    with open(PRECISION_JSON) as f:
        return json.load(f)


def test_study_artifact_is_sane():
    study = _study()
    # the oracle must have been input-sensitive, else MPJPE is vacuous
    assert study["oracle_joint_spread_mm"] > 10.0
    modes = {r["mode"]: r for r in study["results"]}
    assert "float32" in modes and "high" in modes
    # exact-parity mode must be essentially exact even worst-case
    assert modes["float32"]["mpjpe_mm"] < 0.01


def test_runner_default_mode_is_qualified():
    from gaitlab.pipeline.runner import GRNetRunner

    fields = GRNetRunner.__dataclass_fields__
    default_mode = fields["precision"].default
    head_default = fields["head_precision"].default
    # the deployed default = global precision + head_precision="auto"
    # (head at single-pass bf16 under "high") + the HR upsample head at
    # the 2-pass w2x decomposition (round 4); the study row for that
    # exact combination is "bb_high+head_default+smpl_high+heads_w2x"
    study_mode = default_mode
    if default_mode == "high" and head_default == "auto":
        from gaitlab.nn.grnet import GRNet
        from gaitlab.pipeline.runner import GRNetRunner as R

        runner = R(GRNet.create(init_img=32), buckets=(4,), crop_size=32)
        assert runner.resolved_region_precision() == (("heads", "w2x"),)
        assert runner.resolved_resize_precision() == "high"
        # float32 parity must keep bit-faithful resizes and no regions
        parity = R(GRNet.create(init_img=32), buckets=(4,), crop_size=32,
                   precision="float32")
        assert parity.resolved_region_precision() == ()
        assert parity.resolved_resize_precision() == "highest"
        study_mode = "bb_high+head_default+smpl_high+heads_w2x+resize_high"
    modes = {r["mode"]: r for r in _study()["results"]}
    assert study_mode in modes, study_mode
    r = modes[study_mode]
    assert r["mpjpe_mm"] <= 0.5, (
        f"runner default '{study_mode}' measured {r['mpjpe_mm']} mm "
        f"worst-case MPJPE — outside the 0.5 mm budget")
    # and it must be a real speedup over exact parity, not a rename
    assert r["fps_per_chip"] > 1.5 * modes["float32"]["fps_per_chip"]


def test_precision_threads_into_forward(monkeypatch, rng):
    """The precision string reaches jax.default_matmul_precision inside
    the jitted forward (structural check; CPU executes f32 either way)."""
    import jax

    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    seen = []
    real = jax.default_matmul_precision

    def spy(p):
        seen.append(p)
        return real(p)

    monkeypatch.setattr(jax, "default_matmul_precision", spy)
    model = GRNet.create()
    runner = GRNetRunner(model, buckets=(4,), precision="high")
    frames = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([32.0, 32.0, 40.0, 40.0], np.float32), (2, 1))
    runner.run_track(frames, bboxes)
    assert "high" in seen
    # head_precision="auto" under "high" puts the PARE head in a nested
    # single-pass-bf16 context (the qualified mixed mode)
    assert "default" in seen


def test_parity_mode_keeps_head_inherited(monkeypatch, rng):
    """precision='float32' (parity) must NOT silently drop the head to
    bf16: head_precision='auto' only activates under 'high'."""
    import jax

    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    seen = []
    real = jax.default_matmul_precision

    def spy(p):
        seen.append(p)
        return real(p)

    monkeypatch.setattr(jax, "default_matmul_precision", spy)
    model = GRNet.create()
    runner = GRNetRunner(model, buckets=(4,), precision="float32")
    frames = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([32.0, 32.0, 40.0, 40.0], np.float32), (2, 1))
    runner.run_track(frames, bboxes)
    assert "float32" in seen
    assert "default" not in seen


def test_inherit_clears_module_override():
    """A module built with an explicit head_precision override must be
    cloned BACK to inherit when the runner resolves head precision to
    None — otherwise precision='float32' parity runs keep the PARE head
    at single-pass bf16 (round-3 review finding)."""
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create(init_img=32, head_precision="default")
    assert model.module.head_precision == "default"

    parity = GRNetRunner(model, buckets=(4,), crop_size=32,
                         precision="float32")
    assert parity.resolved_head_precision() is None
    assert parity._resolved_module().head_precision is None

    # the qualified default keeps / sets the bf16 head
    prod = GRNetRunner(model, buckets=(4,), crop_size=32)
    assert prod.resolved_head_precision() == "default"
    assert prod._resolved_module().head_precision == "default"

    # explicit runner override wins over both
    forced = GRNetRunner(model, buckets=(4,), crop_size=32,
                         precision="float32", head_precision="highest")
    assert forced._resolved_module().head_precision == "highest"


def test_conv_w2x_matches_conv_and_param_paths(rng):
    """conv_w2x (2-pass kernel decomposition, layers.py) is numerically
    the plain convolution on CPU (DEFAULT precision executes f32 there,
    and k_hi + k_lo == k exactly for these magnitudes), and switching the
    'heads' region to w2x must not change the backbone's variable tree —
    torch weight import stays mechanical."""
    import jax
    import jax.numpy as jnp

    from gaitlab.nn import hrnet as hrnet_mod
    from gaitlab.nn.layers import conv_w2x

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 4)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    got = conv_w2x(x, k)
    # k_hi + k_lo carries ~16-17 mantissa bits (k_lo is itself bf16), so
    # the kernel-side relative error is ~2^-17 — far below bf16's 2^-9
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=1e-4)

    cfg_std = hrnet_mod.HRNetCfg.w(8, modules=(1, 1, 1), blocks=1)
    cfg_w2x = hrnet_mod.HRNetCfg.w(8, modules=(1, 1, 1), blocks=1,
                                   region_precision=(("heads", "w2x"),
                                                     ("stage4", "w2x"),
                                                     ("layer1", "w2x")))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    m_std = hrnet_mod.PoseHighResolutionNet(cfg_std)
    m_w2x = hrnet_mod.PoseHighResolutionNet(cfg_w2x)
    v_std = m_std.init(jax.random.PRNGKey(0), img)
    v_w2x = m_w2x.init(jax.random.PRNGKey(0), img)
    paths_std = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(v_std)}
    paths_w2x = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(v_w2x)}
    assert paths_std == paths_w2x

    # identical params -> near-identical output on CPU (w2x active in
    # blocks, transitions, fuse layers, and the upsample head)
    out_std = m_std.apply(v_std, img + 0.5)
    out_w2x = m_w2x.apply(v_std, img + 0.5)
    np.testing.assert_allclose(np.asarray(out_w2x), np.asarray(out_std),
                               rtol=1e-3, atol=1e-4)


def test_bf16_store_and_conv_w2x_bf16_path(rng):
    """layers.bf16_store rounds exactly like a hardware f32->bf16 convert
    (RNE) while staying simplifier-proof, and conv_w2x's bf16-input path
    computes the same 2-pass product as the f32 path's math — the layer1
    activation-storage probe (docs/PRECISION.json `+l1act16`)."""
    import jax
    import jax.numpy as jnp

    from gaitlab.nn.layers import _bf16_hi, bf16_store, conv_w2x

    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    k = rng.normal(size=(3, 3, 16, 8)).astype(np.float32)

    xs = bf16_store(jnp.asarray(x))
    assert xs.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(xs, np.float32),
        np.asarray(jnp.asarray(x).astype(jnp.bfloat16), np.float32))

    got = conv_w2x(xs, jnp.asarray(k))
    assert got.dtype == jnp.float32
    k_hi = np.asarray(_bf16_hi(k))
    k_lo = np.asarray(_bf16_hi(k - k_hi))
    ref = jax.lax.conv_general_dilated(
        np.asarray(xs, np.float32), k_hi + k_lo, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=1e-4)


def test_bench_golden_sane():
    """bench.py's accuracy-tripwire golden (committed fixture): right
    shape, finite, and input-SENSITIVE (joint spread across frames >>0 —
    a degenerate golden would make the tripwire comparison vacuous,
    CLAUDE.md BN-calibration note)."""
    g = np.load(osp.join(osp.dirname(__file__), "golden",
                         "bench_golden.npz"))
    gold, theta = g["kp_3d"], g["theta"]
    assert gold.ndim == 3 and gold.shape[0] == 8 and gold.shape[2] == 3
    assert theta.shape[0] == 8
    assert np.isfinite(gold).all() and np.isfinite(theta).all()
    spread_mm = float(np.linalg.norm(
        gold - gold.mean(0), axis=-1).mean() * 1000.0)
    spread_th = float(np.abs(theta - theta.mean(0)).mean())
    # same guards as bench.py/make_bench_golden.py: the probe function
    # must vary with the input well above the regression tolerances
    assert spread_mm > 3.0 and spread_th > 0.03, (spread_mm, spread_th)


@pytest.mark.slow
def test_bench_golden_fresh():
    """Recompute the golden from the deterministic recipe and compare to
    the committed fixture — catches silent drift of the bench setup
    (seeds, init, calibration recipe) without a TPU."""
    import sys

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "scripts"))
    from make_bench_golden import golden_kp3d

    gold = np.load(osp.join(osp.dirname(__file__), "golden",
                            "bench_golden.npz"))
    fresh = golden_kp3d(backend="")  # conftest already forced CPU
    err_mm = float(np.linalg.norm(
        fresh["kp_3d"] - gold["kp_3d"], axis=-1).mean() * 1000.0)
    err_th = float(np.abs(fresh["theta"] - gold["theta"]).mean())
    assert err_mm < 0.1 and err_th < 0.002, (
        f"committed bench golden is {err_mm:.3f} mm / {err_th:.5f} from "
        f"the recipe — regenerate with scripts/make_bench_golden.py")


def test_act_store_layer1(rng):
    """HRNetCfg.act_store=('layer1','bfloat16'): the variable tree is
    unchanged (torch import untouched), bf16 genuinely enters layer1's
    convolutions (jaxpr-level — the storage intent XLA must honor), and
    the output stays close to the plain model (only bf16 activation
    rounding at 5 block boundaries separates them)."""
    import jax
    import jax.numpy as jnp

    from gaitlab.nn import hrnet as hrnet_mod

    cfg_std = hrnet_mod.HRNetCfg.w(8, modules=(1, 1, 1), blocks=1)
    cfg_act = hrnet_mod.HRNetCfg.w(
        8, modules=(1, 1, 1), blocks=1,
        region_precision=(("layer1", "w2x"),),
        act_store=(("layer1", "bfloat16"),))
    m_std = hrnet_mod.PoseHighResolutionNet(cfg_std)
    m_act = hrnet_mod.PoseHighResolutionNet(cfg_act)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    v = m_std.init(jax.random.PRNGKey(0), img)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                m_act.init(jax.random.PRNGKey(0), img)))

    jaxpr = str(jax.make_jaxpr(lambda v, x: m_act.apply(v, x))(v, img))
    assert "bf16[" in jaxpr, "no bf16 arrays in the act_store graph"

    out_std = np.asarray(m_std.apply(v, img))
    out_act = np.asarray(m_act.apply(v, img))
    assert np.isfinite(out_act).all()
    np.testing.assert_allclose(out_act, out_std, rtol=0.1, atol=0.05)
    assert np.abs(out_act - out_std).max() > 0, (
        "act_store changed nothing — the bf16 storage was optimized away "
        "at trace level")

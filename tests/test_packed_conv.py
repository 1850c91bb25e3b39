"""Space-to-depth packed convolution equivalence tests (nn/layers.py).

The packed path must compute the SAME values as the standard BasicBlock
chain (zero-structured kernel: every nonzero MAC is one of the original
ones), so packed and unpacked backbones are weight-interchangeable.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_s2d_d2s_roundtrip(rng):
    from gaitlab.nn.layers import depth_to_space, space_to_depth

    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_packed_kernel_matches_conv(rng):
    """Raw conv3x3 (stride 1, pad 1) == packed conv on the s2d grid."""
    from gaitlab.nn.layers import (
        depth_to_space,
        packed_conv3x3_kernel,
        space_to_depth,
    )

    c, k, h, w = 3, 5, 10, 14
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, c, k)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    packed = jax.lax.conv_general_dilated(
        space_to_depth(x), packed_conv3x3_kernel(kern), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(depth_to_space(packed), ref,
                               rtol=0, atol=1e-5)


def test_packed_basic_block_matches_standard(rng):
    """PackedBasicBlock == BasicBlock with the same variables (shared
    paths), including non-trivial BN running stats."""
    from gaitlab.nn.hrnet import BasicBlock
    from gaitlab.nn.layers import (
        PackedBasicBlock,
        depth_to_space,
        space_to_depth,
    )

    planes = 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, planes)).astype(np.float32))
    std = BasicBlock(planes)
    variables = std.init(jax.random.PRNGKey(0), x)
    # non-trivial running stats so the BN path is actually exercised
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.3 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        / v.size, variables)

    ref = std.apply(variables, x)
    packed = PackedBasicBlock(planes).apply(variables, space_to_depth(x))
    np.testing.assert_allclose(depth_to_space(packed), ref,
                               rtol=0, atol=2e-5)


def test_packed_block_variable_paths_match(rng):
    """Init through either block yields the identical variable tree
    (paths, shapes, and values — flax derives param RNG from the path)."""
    from gaitlab.nn.hrnet import BasicBlock
    from gaitlab.nn.layers import PackedBasicBlock, space_to_depth

    planes = 4
    x = jnp.asarray(rng.normal(size=(1, 8, 8, planes)).astype(np.float32))
    v_std = BasicBlock(planes).init(jax.random.PRNGKey(7), x)
    v_pck = PackedBasicBlock(planes).init(jax.random.PRNGKey(7),
                                          space_to_depth(x))
    flat_std = jax.tree_util.tree_leaves_with_path(v_std)
    flat_pck = jax.tree_util.tree_leaves_with_path(v_pck)
    assert [p for p, _ in flat_std] == [p for p, _ in flat_pck]
    for (_, a), (_, b) in zip(flat_std, flat_pck):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_packed_hrnet_backbone_matches(rng):
    """Full backbone with pack_low_channel=32 == unpacked, same weights."""
    from gaitlab.nn.hrnet import HRNetCfg, PoseHighResolutionNet

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    net0 = PoseHighResolutionNet(HRNetCfg.w(32))
    netp = PoseHighResolutionNet(HRNetCfg.w(32, pack_low_channel=32))
    variables = net0.init(jax.random.PRNGKey(1), x)
    # randomize BN stats a little so BN isn't an identity
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype
                                        ).reshape(v.shape) / max(v.size, 1),
        variables)
    ref = net0.apply(variables, x)
    out = netp.apply(variables, x)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)


def test_stem_s2d_matches_standard_conv(rng):
    """StemConvS2D == nn.Conv(F,(3,3),(2,2),pad 1) with the SAME 'kernel'
    param (name/shape-compatible): every nonzero packed MAC is one of the
    original 27 taps, zero-padding covers the rest."""
    import flax.linen as nn

    from gaitlab.nn.hrnet import StemConvS2D

    f, h, w = 8, 20, 28
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    std = nn.Conv(f, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                  use_bias=False)
    v = std.init(jax.random.PRNGKey(3), x)
    ref = std.apply(v, x)
    out = StemConvS2D(f).apply(v, x)
    assert out.shape == ref.shape == (2, h // 2, w // 2, f)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_stem_s2d_backbone_matches(rng):
    """Full backbone with stem_s2d=True == standard, same variables."""
    from gaitlab.nn.hrnet import HRNetCfg, PoseHighResolutionNet

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    net0 = PoseHighResolutionNet(HRNetCfg.w(32))
    nets = PoseHighResolutionNet(HRNetCfg.w(32, stem_s2d=True))
    variables = net0.init(jax.random.PRNGKey(1), x)
    # the stem itself matches to 1e-5 (test above); through the ~100-conv
    # stack the f32 summation-order difference amplifies to ~2e-3 on
    # ~3e2-magnitude activations
    np.testing.assert_allclose(nets.apply(variables, x),
                               net0.apply(variables, x), rtol=1e-3,
                               atol=5e-3)

"""Gait branch: GaitFeat encoder (bidirectional GRU) + temporal-spatial
attention pose-feature corrector.

Re-design of the reference gait modules — BidirectionalModel
(/root/reference/lib/models/layers/gait_feat_encoder.py:10-103),
TSAttnBlock/MultiAttention (attention_utils.py:132-272) and FeatCorrector
(feature_correction.py:18-157). The reference FeatCorrector is dead code
and broken as written (reads 9 undefined names in __init__ and an
undefined `N` in forward — SURVEY.md §2A), so this is a clean
reimplementation from the config surface (MODEL.FEAT_CORR.{AVG_DIM,
ESTIM_PHASE, NUM_LAYERS, H_SIZE, NUM_HEADS, USE_JWFF}, lib/core/config.py:
54-60) and the module intent:

  estimate per-track gait parameters (walk speed, 2 step params) and a
  per-frame 4-d gait phase from the pose-feature sequence, embed them as
  tokens, and correct the per-joint pose features with parallel temporal
  (over frames) + spatial (over 24 joint tokens + 1 gait token) attention,
  mixed by a learned per-channel softmax, residual into the PARE head.

GRU recurrences run as `lax.scan` inside one jitted program; attention is
plain batched MHA (fine at <=400 frames and 25 tokens — no blockwise
machinery needed, SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaitlab.nn.layers import LocallyConnected

Array = jax.Array


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.05)


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU (torch nn.GRU(batch_first=True,
    bidirectional=True) semantics, gait_feat_encoder.py:51-57).

    Returns (outputs (B,T,2H), final_states (B, num_layers*2*H) ordered
    [l0_fwd, l0_bwd, l1_fwd, l1_bwd, ...] like torch h_n)."""

    hidden_size: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: Array, seq_lengths: Optional[Array] = None):
        """x (B,T,C); seq_lengths (B,) optional valid-frame counts — padded
        tail frames then neither feed the backward pass nor pollute the
        final states (runner tail-padding, pipeline/runner.py)."""
        finals = []
        for layer in range(self.num_layers):
            # nn.RNN is scope-transparent: name the cells themselves
            fwd = nn.RNN(nn.GRUCell(self.hidden_size, name=f"l{layer}_fwd"))
            bwd = nn.RNN(nn.GRUCell(self.hidden_size, name=f"l{layer}_bwd"))
            if seq_lengths is None:
                y_f = fwd(x)
                y_b = bwd(x[:, ::-1, :])[:, ::-1, :]
                f_fwd, f_bwd = y_f[:, -1], y_b[:, 0]
            else:
                f_fwd, y_f = fwd(x, seq_lengths=seq_lengths,
                                 return_carry=True)
                f_bwd, y_b = bwd(x, seq_lengths=seq_lengths,
                                 return_carry=True, reverse=True,
                                 keep_order=True)
            x = jnp.concatenate([y_f, y_b], axis=-1)
            finals.extend([f_fwd, f_bwd])
        return x, jnp.concatenate(finals, axis=-1)


class GaitFeatEncoder(nn.Module):
    """BidirectionalModel with use_pareFeat=True (the GRNet wiring).

    Input: pose features (B, T, J, C) and camera params (B, T, 3).
    Outputs: pred_avg (B, num_outputs) walk-speed + step params,
    pred_phase (B, T, 4) tanh phase, xc (B, T, J, C) cparam embedding.
    """

    num_joints: int = 24
    feat_dim: int = 128      # per-joint feature size
    num_outputs: int = 3     # AVG_DIM: 1 speed + 2 step params
    estim_phase: bool = True
    h_size: int = 300        # use_pareFeat=True => 300 (encoder.py:31)
    fc_size: int = 100
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: Array, cparams: Array,
                 seq_lengths: Optional[Array] = None):
        b, t, j, c = x.shape
        # camera-parameter embedding: per-joint unshared 3->C map, residual
        # (gait_feat_encoder.py:81-86)
        xc = LocallyConnected(num_tokens=self.num_joints, features=c,
                              name="cparam_mlp")(
            jnp.broadcast_to(cparams[:, :, None, :], (b, t, j, 3)))
        x = x + xc

        seq, h = BiGRU(self.h_size, self.num_layers, name="rnn")(
            x.reshape(b, t, j * c), seq_lengths=seq_lengths)

        pred_avg = None
        if self.num_outputs > 0:
            y1 = nn.Dense(1, name="speed_out")(
                _leaky(nn.Dense(self.fc_size, name="speed_fc")(h)))
            y2 = nn.Dense(2, name="step_out")(
                _leaky(nn.Dense(self.fc_size, name="step_fc")(h)))
            pred_avg = jnp.concatenate([y1, y2], axis=-1)

        pred_phase = None
        if self.estim_phase:
            pred_phase = jnp.tanh(nn.Dense(4, name="phase_out")(
                _leaky(nn.Dense(self.fc_size, name="phase_fc")(seq))))
        return pred_avg, pred_phase, xc


def positional_encoding(t: int, d_model: int, dtype=jnp.float32) -> Array:
    """Sin/cos positional-encoding table (T, d_model) — reference
    PositionalEncoding (attention_utils.py:32-54), as a pure function."""
    position = jnp.arange(t, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * -(jnp.log(10000.0) / d_model))
    pe = jnp.zeros((t, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div[: d_model // 2]))
    return pe


def add_positional_encoding(x: Array) -> Array:
    """x: (B, T, D) -> x + PE[:T] (attention_utils.py:51-54)."""
    return x + positional_encoding(x.shape[1], x.shape[2], x.dtype)[None]


class TSAttention(nn.Module):
    """Parallel temporal + spatial attention with learned per-channel
    mixing (reference MultiAttention, attention_utils.py:132-218).

    x: (B, T, J+1, C) tokens (24 joints + 1 gait token).
    Temporal attention runs over frames on the flattened token dim;
    spatial attention runs over the J+1 tokens per frame.
    """

    encode_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array,
                 frame_mask: Optional[Array] = None) -> Array:
        """frame_mask (B,T) bool, True = real frame: padded tail frames are
        then excluded as temporal-attention keys and from the mixing mean."""
        b, t, nt, c = x.shape
        d = self.encode_dim - self.encode_dim % self.num_heads
        flat = x.reshape(b, t, nt * c)

        # temporal: frames attend to (valid) frames
        tmask = (frame_mask[:, None, None, :] if frame_mask is not None
                 else None)  # (B,1,Tq:any,Tk)
        x_t = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, out_features=nt * c,
            name="temporal")(flat, flat, mask=tmask)
        # spatial: tokens attend to tokens, per frame
        tok = x.reshape(b * t, nt, c)
        x_s = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, out_features=c,
            name="spatial")(tok, tok).reshape(b, t, nt * c)

        # learned per-channel softmax mixing (attention_utils.py:183-188);
        # the mixing statistic averages over valid frames only
        cat = jnp.concatenate([x_t, x_s], axis=-1)
        if frame_mask is None:
            alpha = cat.mean(axis=1, keepdims=True)
        else:
            w = frame_mask[..., None].astype(cat.dtype)
            alpha = ((cat * w).sum(axis=1, keepdims=True)
                     / jnp.maximum(w.sum(axis=1, keepdims=True), 1.0))
        alpha = nn.Dense(2 * nt * c, name="ts_attn")(alpha)
        alpha = jax.nn.softmax(alpha.reshape(b, 1, nt * c, 2), axis=-1)
        return (x_t * alpha[..., 0] + x_s * alpha[..., 1]).reshape(b, t, nt, c)


class TSAttnBlock(nn.Module):
    """Attention + FFN block with post-norm residuals
    (attention_utils.py:220-272)."""

    encode_dim: int
    num_heads: int
    use_jwff: bool = False
    num_tokens: int = 25

    @nn.compact
    def __call__(self, x: Array,
                 frame_mask: Optional[Array] = None) -> Array:
        b, t, nt, c = x.shape
        attn = TSAttention(self.encode_dim, self.num_heads,
                           name="mulattn")(x, frame_mask=frame_mask)
        x = nn.LayerNorm(name="norm1")(x + attn)
        if self.use_jwff:
            # joint-wise FFN: per-token unshared weights
            h = LocallyConnected(num_tokens=nt, features=c // 2,
                                 use_bias=True, name="jwff1")(x)
            h = nn.gelu(h)
            out = LocallyConnected(num_tokens=nt, features=c,
                                   use_bias=True, name="jwff2")(h)
        else:
            h = nn.Dense(c // 2, name="pwff1")(x)
            h = nn.gelu(h)
            out = nn.Dense(c, name="pwff2")(h)
        return nn.LayerNorm(name="norm2")(x + out)


class FeatCorrector(nn.Module):
    """Pose-feature correction from estimated gait features
    (feature_correction.py intent; clean rebuild).

    __call__(x (B,T,J,C) pose features, cparams (B,T,3)) ->
    (corrected (B,T,J,C), pred_avg (B,3), pred_phase (B,T,4)).

    Operating envelope (docs/GAIT_ROBUSTNESS.json, scripts/
    gait_robustness.py): under the corruption the clinical pipeline
    actually produces, a trained corrector degrades gracefully — phase
    error 0.057 clean -> 0.25 at 40% occlusion-dropout (frozen frames),
    is insensitive to bbox-jitter-style per-frame gain/offset noise, and
    holds to 0.12 on tracks truncated to 12 frames via `seq_lengths`; all
    cells stay far below the untrained baseline (~0.95). Validation is on
    SYNTHETIC gait-labeled sequences + rendered walker clips
    (tests/test_gait_training.py) — no clinical data exists in this
    environment, same caveat as gaitlab/gait/classify.py."""

    num_joints: int = 24
    feat_dim: int = 128
    num_avg_gfeat: int = 3        # FEAT_CORR.AVG_DIM
    estim_phase: bool = True      # FEAT_CORR.ESTIM_PHASE
    num_layers: int = 1           # FEAT_CORR.NUM_LAYERS
    h_size: int = 1024            # FEAT_CORR.H_SIZE
    num_heads: int = 4            # FEAT_CORR.NUM_HEADS
    use_jwff: bool = False        # FEAT_CORR.USE_JWFF
    stop_gaitfeat_grad: bool = True  # use_gt_gaitfeat (feature_correction.py:19)

    @nn.compact
    def __call__(self, x: Array, cparams: Array,
                 seq_lengths: Optional[Array] = None):
        b, t, j, c = x.shape
        frame_mask = None
        if seq_lengths is not None:
            frame_mask = jnp.arange(t)[None, :] < seq_lengths[:, None]
        pred_avg, pred_phase, _ = GaitFeatEncoder(
            num_joints=j, feat_dim=c, num_outputs=self.num_avg_gfeat,
            estim_phase=self.estim_phase, name="featnet")(
                x, cparams, seq_lengths=seq_lengths)

        # normalize the two phase 2-vectors to the unit circle
        # (feature_correction.py:118-122)
        if self.estim_phase:
            p1 = pred_phase[..., :2]
            p2 = pred_phase[..., 2:]
            nrm = lambda v: v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
            phase = jnp.concatenate([nrm(p1), nrm(p2)], axis=-1)
            raw = jnp.concatenate(
                [jnp.broadcast_to(pred_avg[:, None, :],
                                  (b, t, self.num_avg_gfeat)), phase], -1)
        else:
            raw = jnp.broadcast_to(pred_avg[:, None, :],
                                   (b, t, self.num_avg_gfeat))
        if self.stop_gaitfeat_grad:
            # keep the corrector from back-driving the gait estimates
            raw = jax.lax.stop_gradient(raw)

        # gait token (C-dim) appended to the 24 joint tokens
        gtok = nn.Dense(c, name="gfeat_token")(
            _leaky(nn.Dense(c // 2, name="gfeat_fc")(raw)))
        tokens = jnp.concatenate([x, gtok[:, :, None, :]], axis=2)  # (B,T,25,C)

        y = tokens
        for i in range(self.num_layers):
            y = TSAttnBlock(self.h_size, self.num_heads, self.use_jwff,
                            num_tokens=j + 1, name=f"block{i}")(
                                y, frame_mask=frame_mask)
        corrected = x + y[:, :, :j, :]  # residual, drop the gait token
        return corrected, pred_avg, pred_phase


def camera_reparam(pred_cam: Array, bbox: Array, cimg: Array) -> Array:
    """Crop-frame weak-perspective cam -> image-frame cparams
    (reference grnet.py:154-159).

    pred_cam (N,3); bbox (N,4) [cx,cy,w,h]; cimg (N,2) image center.
    """
    bs = bbox[..., 2] / 224.0
    t_bb = bbox[..., :2] - cimg
    scale = (bs.reshape(-1, 1) * pred_cam[:, 0:1])
    return jnp.concatenate(
        [scale, t_bb.reshape(-1, 2) / scale / 112.0 + pred_cam[:, 1:]], axis=-1)

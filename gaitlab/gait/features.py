"""Clinical gait features from 3D joint sequences.

The downstream capability the reference pipeline exists for: its
batch_generation databases of kinectv2 25-joint tracks feed the MICCAI
AMAI 2023 dementia-scoring study (/root/reference/README.md:70-78); the
scoring code itself is not in the reference repo, so this module provides
the joints -> gait-features stage from the clinical gait literature, with
the same parameter family the reference's GaitFeat-Net estimates (walk
speed + step parameters + gait phase, gait_feat_encoder.py:10-18).

All signal math is vectorized jax.numpy (jit-able, batchable over clips);
event detection (heel strikes) uses sign-change masks, not Python loops.

Joint layout: kinectv2 25-joint (gaitlab.body.joints registry).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from gaitlab.body import joints as joints_mod

Array = jax.Array

K = {name: i for i, name in enumerate(joints_mod.get_joint_names("kinectv2"))}
HIP = K["hip"]
L_ANKLE, R_ANKLE = K["lankle"], K["rankle"]
L_FOOT, R_FOOT = K["leftFoot"], K["rightFoot"]
L_HIP, R_HIP = K["lhip (SMPL)"], K["rhip (SMPL)"]
L_KNEE, R_KNEE = K["lknee"], K["rknee"]

FEATURE_NAMES = (
    "walk_speed",        # leg-length-normalized pelvis speed
    "cadence",           # steps per second
    "step_length",       # leg-length-normalized mean step length
    "step_length_cv",    # step length coefficient of variation
    "step_time",         # mean step duration (s)
    "step_time_cv",      # step time coefficient of variation
    "stride_width",      # lateral ankle separation (normalized)
    "step_asymmetry",    # |left - right| step length asymmetry ratio
    "arm_swing",         # mean wrist excursion (normalized)
    "trunk_sway",        # lateral spine oscillation rms (normalized)
)


def leg_length(joints3d: Array) -> Array:
    """Mean (hip->knee->ankle) chain length over the clip — the reference
    normalizes walk speed by leg length (gait_feat_encoder.py docstring)."""
    def chain(hip, knee, ankle):
        a = jnp.linalg.norm(joints3d[:, knee] - joints3d[:, hip], axis=-1)
        b = jnp.linalg.norm(joints3d[:, ankle] - joints3d[:, knee], axis=-1)
        return a + b
    left = chain(L_HIP, L_KNEE, L_ANKLE)
    right = chain(R_HIP, R_KNEE, R_ANKLE)
    return jnp.mean((left + right) / 2.0)


def _smooth(x: Array, win: int = 5) -> Array:
    k = jnp.ones((win,)) / win
    pad = win // 2
    xp = jnp.pad(x, ((pad, pad),) + ((0, 0),) * (x.ndim - 1), mode="edge")
    return jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                    in_axes=-1, out_axes=-1)(
        xp.reshape(xp.shape[0], -1)).reshape((x.shape[0],) + x.shape[1:])


def heel_strikes(joints3d: Array, side: str = "left") -> Array:
    """Heel-strike mask (T,) from the anterior ankle-excursion signal.

    A heel strike is the peak forward excursion of the swing ankle
    relative to the pelvis (Zeni et al. 2008 coordinate-based detection):
    local maxima of the ankle-minus-hip projection on the walking
    direction.
    """
    ankle = joints3d[:, L_ANKLE if side == "left" else R_ANKLE]
    rel = ankle - joints3d[:, HIP]
    # walking direction: dominant horizontal pelvis displacement
    disp = joints3d[-1, HIP] - joints3d[0, HIP]
    disp = disp.at[1].set(0.0)  # ignore vertical
    direction = disp / (jnp.linalg.norm(disp) + 1e-9)
    s = _smooth(rel @ direction)
    ds = jnp.diff(s)
    peaks = (ds[:-1] > 0) & (ds[1:] <= 0)
    return jnp.concatenate([jnp.zeros(1, bool), peaks, jnp.zeros(1, bool)])


def _event_stats(times: np.ndarray):
    if len(times) < 2:
        return 0.0, 0.0
    dt = np.diff(times)
    return float(dt.mean()), float(dt.std() / (dt.mean() + 1e-9))


def gait_features(joints3d, fps: float = 20.0) -> dict:
    """(T, 25, 3) kinectv2 joints -> dict of clinical gait features.

    Returns a dict with FEATURE_NAMES keys plus 'feature_vector'
    (np.float32 (len(FEATURE_NAMES),)) and 'events' (per-side heel-strike
    frame indices).
    """
    joints3d = jnp.asarray(joints3d, jnp.float32)
    t = joints3d.shape[0]
    ll = leg_length(joints3d) + 1e-9

    pelvis = joints3d[:, HIP]
    duration = (t - 1) / fps
    walk_dist = jnp.linalg.norm(
        (pelvis[-1] - pelvis[0]) * jnp.array([1.0, 0.0, 1.0]))
    walk_speed = walk_dist / duration / ll

    strikes = {side: np.nonzero(np.asarray(heel_strikes(joints3d, side)))[0]
               for side in ("left", "right")}
    all_strikes = np.sort(np.concatenate([strikes["left"], strikes["right"]]))
    cadence = len(all_strikes) / duration if duration > 0 else 0.0
    step_time, step_time_cv = _event_stats(all_strikes / fps)

    # step length: signed forward lead of the striking foot over the other
    # foot at each heel strike (clinical step-length definition)
    la = np.asarray(joints3d[:, L_ANKLE])
    ra = np.asarray(joints3d[:, R_ANKLE])
    disp = np.asarray(pelvis[-1] - pelvis[0]) * np.array([1.0, 0.0, 1.0])
    fwd = disp / (np.linalg.norm(disp) + 1e-9)
    lat = np.cross(np.array([0.0, 1.0, 0.0]), fwd)

    lead_l = (la - ra) @ fwd  # how far the left foot leads
    left_steps = (np.clip(lead_l[strikes["left"]], 0, None) / float(ll)
                  if len(strikes["left"]) else np.zeros(1))
    right_steps = (np.clip(-lead_l[strikes["right"]], 0, None) / float(ll)
                   if len(strikes["right"]) else np.zeros(1))
    step_lengths = np.concatenate([left_steps, right_steps])
    step_length = float(np.mean(step_lengths))
    step_length_cv = float(np.std(step_lengths) / (step_length + 1e-9))

    lm, rm = float(np.mean(left_steps)), float(np.mean(right_steps))
    step_asymmetry = abs(lm - rm) / (max(lm, rm) + 1e-9)
    stride_width = float(np.mean(np.abs((la - ra) @ lat)) / float(ll))

    lw = np.asarray(joints3d[:, K["lwrist"]] - pelvis)
    rw = np.asarray(joints3d[:, K["rwrist"]] - pelvis)
    arm_swing = float((np.ptp(lw @ fwd) + np.ptp(rw @ fwd)) / 2.0 / float(ll))

    spine = np.asarray(joints3d[:, K["Spine (H36M)"]] - pelvis)
    trunk_sway = float(np.std(spine @ lat) / float(ll))

    feats = {
        "walk_speed": float(walk_speed),
        "cadence": float(cadence),
        "step_length": step_length,
        "step_length_cv": step_length_cv,
        "step_time": step_time,
        "step_time_cv": step_time_cv,
        "stride_width": stride_width,
        "step_asymmetry": step_asymmetry,
        "arm_swing": arm_swing,
        "trunk_sway": trunk_sway,
    }
    feats["feature_vector"] = np.array(
        [feats[k] for k in FEATURE_NAMES], np.float32)
    feats["events"] = strikes
    return feats


def batch_gait_features(db: dict, fps: float = 20.0) -> dict:
    """Per-video features from a batch_generation database
    ({vid_name (N,), joints3D (N,25,3)})."""
    names = np.asarray(db["vid_name"])
    joints = np.asarray(db["joints3D"])
    out = {}
    for vid in np.unique(names):
        seq = joints[names == vid]
        if seq.shape[0] < int(fps):
            continue  # under a second of walking — skip
        out[str(vid)] = gait_features(seq, fps=fps)
    return out

"""Tests: gait features from synthetic walking motion + dementia scorer."""

import numpy as np
import pytest

from gaitlab.gait import classify, features


def synthetic_walk(n=120, fps=20.0, speed=1.2, step_freq=1.8,
                   step_amp=0.35, leg=0.9, seed=0):
    """Kinectv2 25-joint walker moving along +x with sinusoidal legs.

    speed in m/s, step_freq in steps/s (per leg pair), amplitudes in m.
    """
    t = np.arange(n) / fps
    J = np.zeros((n, 25, 3), np.float32)
    hip_y = 1.0
    x = speed * t
    # pelvis & spine chain
    J[:, 0] = np.stack([x, np.full(n, hip_y), np.zeros(n)], 1)       # hip
    J[:, 1] = J[:, 0] + [0, 0.25, 0]                                  # spine
    J[:, 20] = J[:, 0] + [0, 0.45, 0]                                 # thorax
    J[:, 2] = J[:, 0] + [0, 0.55, 0]                                  # neck
    J[:, 3] = J[:, 0] + [0, 0.70, 0]                                  # head
    phase = 2 * np.pi * step_freq * t
    for side, sgn, hip_i, knee_i, ank_i, foot_i in [
        ("l", 1, 12, 13, 14, 15), ("r", -1, 16, 17, 18, 19)]:
        swing = step_amp * np.sin(phase + (0 if sgn > 0 else np.pi))
        J[:, hip_i] = J[:, 0] + [0, -0.05, sgn * 0.12]
        J[:, knee_i] = J[:, hip_i] + np.stack(
            [swing * 0.5, np.full(n, -leg / 2), np.zeros(n)], 1)
        J[:, ank_i] = J[:, hip_i] + np.stack(
            [swing, np.full(n, -leg), np.zeros(n)], 1)
        J[:, foot_i] = J[:, ank_i] + [0.1, -0.05, 0]
    # shoulders/arms with counter-swing
    for side, sgn, sh, el, wr in [("l", 1, 4, 5, 6), ("r", -1, 8, 9, 10)]:
        arm = 0.2 * np.sin(phase + (np.pi if sgn > 0 else 0))
        J[:, sh] = J[:, 20] + [0, 0, sgn * 0.2]
        J[:, el] = J[:, sh] + np.stack(
            [arm * 0.5, np.full(n, -0.25), np.zeros(n)], 1)
        J[:, wr] = J[:, sh] + np.stack(
            [arm, np.full(n, -0.5), np.zeros(n)], 1)
        J[:, wr + 1] = J[:, wr]  # hands
    J[:, 21:] = J[:, [7, 7, 11, 11]]  # hand tips/thumbs
    return J


def test_gait_features_recover_speed_and_cadence():
    fps, speed, step_freq = 20.0, 1.2, 1.8
    J = synthetic_walk(n=160, fps=fps, speed=speed, step_freq=step_freq)
    f = features.gait_features(J, fps=fps)
    leg = 0.9
    # walk speed normalized by leg length
    assert f["walk_speed"] == pytest.approx(speed / leg, rel=0.1)
    # cadence: one strike per leg per cycle -> 2 * step_freq per second
    assert f["cadence"] == pytest.approx(2 * step_freq, rel=0.15)
    # symmetric synthetic gait
    assert f["step_asymmetry"] < 0.25
    assert f["feature_vector"].shape == (len(features.FEATURE_NAMES),)
    assert np.all(np.isfinite(f["feature_vector"]))


def test_gait_features_detect_asymmetry():
    J = synthetic_walk(n=160)
    f_sym = features.gait_features(J)
    # cripple the left leg: halve its swing
    J2 = synthetic_walk(n=160)
    hipx = J2[:, 12, 0]
    J2[:, 14, 0] = hipx + (J2[:, 14, 0] - hipx) * 0.3
    f_asym = features.gait_features(J2)
    assert f_asym["step_asymmetry"] > f_sym["step_asymmetry"]


def test_classifier_learns_separable_cohorts(rng):
    # normal walkers vs slow, irregular walkers
    feats, labels, sev = [], [], []
    for i in range(30):
        fast = i % 2 == 0
        speed = rng.uniform(1.1, 1.4) if fast else rng.uniform(0.3, 0.6)
        freq = rng.uniform(1.6, 2.0) if fast else rng.uniform(0.8, 1.1)
        J = synthetic_walk(n=120, speed=speed, step_freq=freq,
                           seed=int(rng.integers(1 << 30)))
        f = features.gait_features(J)
        feats.append(f["feature_vector"])
        labels.append(0 if fast else 1)
        sev.append(0.1 if fast else 0.8)
    feats = np.stack(feats)
    labels = np.array(labels)
    sev = np.array(sev)

    fitted = classify.fit(feats[:24], labels[:24], severity=sev[:24],
                          num_classes=2, steps=300)
    pred = classify.predict(fitted, feats[24:])
    acc = (pred["label"] == labels[24:]).mean()
    assert acc >= 0.8, (pred["label"], labels[24:])
    # severity ordering holds
    assert (pred["severity"][labels[24:] == 1].mean()
            > pred["severity"][labels[24:] == 0].mean())


def test_score_clip_pipeline():
    J = synthetic_walk(n=100)
    out = classify.score_clip(J)
    assert "features" in out and "label" not in out
    feats = np.stack([out["features"]["feature_vector"]] * 4)
    fitted = classify.fit(feats, np.array([0, 0, 1, 1]), num_classes=2,
                          steps=10)
    out2 = classify.score_clip(J, fitted)
    assert out2["label"] in (0, 1)
    assert 0.0 <= out2["severity"] <= 1.0


def test_batch_gait_features():
    J = synthetic_walk(n=80)
    db = {
        "vid_name": np.array(["a"] * 80 + ["b"] * 80),
        "joints3D": np.concatenate([J, J * 1.1], axis=0),
    }
    out = features.batch_gait_features(db)
    assert set(out.keys()) == {"a", "b"}
    assert out["a"]["feature_vector"].shape == (len(features.FEATURE_NAMES),)

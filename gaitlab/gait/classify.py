"""Dementia scoring from gait features.

Completes the reference's target application: its 3D-joint databases feed
a clinical dementia-status classifier (MICCAI AMAI 2023,
/root/reference/README.md:70-78); the classifier itself is not in the
reference repo, so this provides the missing stage as a small,
trainable-from-scratch model over gaitlab.gait.features vectors.

Two heads are provided:
  * `DementiaScorer` — an MLP (flax) emitting class logits over clinical
    categories (default 3: normal / MCI-like / dementia-like gait) plus a
    continuous severity score in [0, 1];
  * `fit` / `predict` — full-batch training (optax adam) suited to the
    small clinical cohorts this is used with (tens to hundreds of clips).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaitlab.gait.features import FEATURE_NAMES

Array = jax.Array


class DementiaScorer(nn.Module):
    """Small MLP mapping gait features to a dementia class + severity.

    VALIDATION STATUS — read before clinical use: this environment has NO
    clinical data, so the scorer is exercised ONLY on separable synthetic
    feature distributions (tests/test_gait_features.py); nothing here has
    been validated against patient outcomes. It is deployment plumbing
    awaiting real training data, exactly as BASELINE.md frames the
    random-weight accuracy oracle."""

    num_classes: int = 3
    hidden: int = 32

    @nn.compact
    def __call__(self, x: Array):
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        h = nn.relu(nn.Dense(self.hidden, name="fc2")(h))
        logits = nn.Dense(self.num_classes, name="cls")(h)
        severity = nn.sigmoid(nn.Dense(1, name="severity")(h))[..., 0]
        return logits, severity


class FittedScorer(NamedTuple):
    params: dict
    mean: np.ndarray
    std: np.ndarray
    num_classes: int


def _normalize(x, mean, std):
    return (x - mean) / std


def fit(
    features: np.ndarray,
    labels: np.ndarray,
    severity: Optional[np.ndarray] = None,
    num_classes: int = 3,
    steps: int = 500,
    lr: float = 1e-2,
    seed: int = 0,
) -> FittedScorer:
    """Train on (N, F) feature vectors with int labels (and optional [0,1]
    severity targets). Full-batch adam; returns the fitted bundle."""
    x = np.asarray(features, np.float32)
    y = np.asarray(labels, np.int32)
    mean = x.mean(0)
    std = x.std(0) + 1e-6
    xn = jnp.asarray(_normalize(x, mean, std))
    yn = jnp.asarray(y)
    sev = jnp.asarray(severity.astype(np.float32)) if severity is not None \
        else None

    model = DementiaScorer(num_classes=num_classes)
    params = model.init(jax.random.PRNGKey(seed), xn[:1])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params):
        logits, s = model.apply(params, xn)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yn).mean()
        if sev is not None:
            loss = loss + jnp.mean((s - sev) ** 2)
        return loss

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    return FittedScorer(params=jax.device_get(params), mean=mean, std=std,
                        num_classes=num_classes)


def predict(fitted: FittedScorer, features: np.ndarray) -> dict:
    """(N, F) -> {'label' (N,), 'probs' (N, C), 'severity' (N,)}."""
    x = jnp.asarray(_normalize(np.asarray(features, np.float32),
                               fitted.mean, fitted.std))
    model = DementiaScorer(num_classes=fitted.num_classes)
    logits, sev = model.apply(fitted.params, x)
    probs = jax.nn.softmax(logits, axis=-1)
    return {
        "label": np.asarray(jnp.argmax(logits, -1)),
        "probs": np.asarray(probs),
        "severity": np.asarray(sev),
    }


def score_clip(joints3d: np.ndarray, fitted: Optional[FittedScorer] = None,
               fps: float = 20.0) -> dict:
    """One-call pipeline stage: (T,25,3) joints -> gait features (+ class
    prediction when a fitted scorer is given)."""
    from gaitlab.gait.features import gait_features

    feats = gait_features(joints3d, fps=fps)
    out = {"features": feats}
    if fitted is not None:
        pred = predict(fitted, feats["feature_vector"][None])
        out.update({
            "label": int(pred["label"][0]),
            "probs": pred["probs"][0],
            "severity": float(pred["severity"][0]),
        })
    return out

"""sklearn model inference in JAX (acoustic sentiment classifiers).

The reference runs joblib-loaded sklearn models on CPU per batch
(services/sentiment_analysis.py:567-601, 753-777): a StandardScaler,
an SVC (client) and a RandomForestClassifier (agent). Here the fitted
models are converted once into array pytrees and executed as jitted
JAX programs — rbf/linear/poly/sigmoid kernels as MXU matmuls,
forests as vectorized level-synchronous tree descent — reproducing
sklearn's numerics:

- SVC.predict is one-vs-one *voting* (not argmax of probabilities).
- SVC.predict_proba is libsvm's pairwise Platt sigmoids combined with
  the Wu-Lin coupling iteration, including its early-exit tolerance.
- RandomForest.predict_proba is the mean of per-tree leaf class
  distributions; predict is its argmax.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# Converters (fit-time, host side)
# ----------------------------------------------------------------------

def convert_scaler(scaler) -> Dict[str, np.ndarray]:
    return {"mean": np.asarray(scaler.mean_, np.float32),
            "scale": np.asarray(scaler.scale_, np.float32)}


def convert_svc(svc) -> Dict[str, Any]:
    if svc.kernel not in ("rbf", "linear", "poly", "sigmoid"):
        raise NotImplementedError(f"kernel {svc.kernel!r} not supported")
    if not hasattr(svc, "probA_") or svc.probA_.size == 0:
        raise ValueError("SVC must be fitted with probability=True")
    dual = np.asarray(svc.dual_coef_, np.float32)
    intercept = np.asarray(svc.intercept_, np.float32)
    if len(svc.classes_) == 2:
        # sklearn stores the *negated* libsvm duals/intercept for the
        # binary case (sign-flip in svm/_base.py); undo it so the ovo
        # voting rule and Platt coefficients see raw libsvm decisions.
        dual = -dual
        intercept = -intercept
    return {
        "support_vectors": np.asarray(svc.support_vectors_, np.float32),
        "dual_coef": dual,
        "intercept": intercept,
        "n_support": np.asarray(svc.n_support_, np.int32),
        "prob_a": np.asarray(svc.probA_, np.float32),
        "prob_b": np.asarray(svc.probB_, np.float32),
        "gamma": np.float32(svc._gamma),
        "kernel": svc.kernel,
        "coef0": np.float32(svc.coef0),
        "degree": int(svc.degree),
        "classes": np.asarray(svc.classes_),
    }


def convert_forest(rf) -> Dict[str, Any]:
    trees = [est.tree_ for est in rf.estimators_]
    n_nodes = max(t.node_count for t in trees)
    n_trees = len(trees)
    k = rf.n_classes_
    left = np.full((n_trees, n_nodes), -1, np.int32)
    right = np.full((n_trees, n_nodes), -1, np.int32)
    feature = np.zeros((n_trees, n_nodes), np.int32)
    threshold = np.zeros((n_trees, n_nodes), np.float32)
    value = np.zeros((n_trees, n_nodes, k), np.float32)
    for i, t in enumerate(trees):
        n = t.node_count
        left[i, :n] = t.children_left
        right[i, :n] = t.children_right
        feature[i, :n] = np.maximum(t.feature, 0)
        threshold[i, :n] = t.threshold
        v = t.value[:, 0, :]  # class "counts" (weighted fractions)
        value[i, :n] = v / np.maximum(v.sum(-1, keepdims=True), 1e-38)
    return {
        "left": left, "right": right, "feature": feature,
        "threshold": threshold, "value": value,
        "max_depth": int(max(t.max_depth for t in trees)),
        "classes": np.asarray(rf.classes_),
    }


# ----------------------------------------------------------------------
# StandardScaler
# ----------------------------------------------------------------------

def scaler_transform(scaler: Dict[str, jnp.ndarray],
                     x: jnp.ndarray) -> jnp.ndarray:
    return (x - scaler["mean"]) / scaler["scale"]


# ----------------------------------------------------------------------
# SVC (RBF, one-vs-one)
# ----------------------------------------------------------------------

def _pair_index(k: int) -> List[Tuple[int, int]]:
    return [(i, j) for i in range(k) for j in range(i + 1, k)]


def svc_decision_values(model: Dict[str, Any], x: jnp.ndarray
                        ) -> jnp.ndarray:
    """[B, d] -> [B, k*(k-1)/2] libsvm ovo decision values."""
    sv = model["support_vectors"]
    kind = model.get("kernel", "rbf")
    xs = jnp.matmul(x, sv.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    if kind == "rbf":
        # RBF kernel on the MXU: |x-s|^2 = |x|^2 + |s|^2 - 2 x.s
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        s2 = jnp.sum(sv * sv, axis=-1)[None, :]
        kern = jnp.exp(-model["gamma"]
                       * jnp.maximum(x2 + s2 - 2.0 * xs, 0.0))
    elif kind == "linear":
        kern = xs
    elif kind == "poly":
        kern = (model["gamma"] * xs + model["coef0"]) ** model["degree"]
    else:  # sigmoid
        kern = jnp.tanh(model["gamma"] * xs + model["coef0"])

    n_support = np.asarray(model["n_support"])
    starts = np.concatenate([[0], np.cumsum(n_support)])
    k = len(n_support)
    dual = model["dual_coef"]
    decs = []
    for p, (i, j) in enumerate(_pair_index(k)):
        si, ei = int(starts[i]), int(starts[i + 1])
        sj, ej = int(starts[j]), int(starts[j + 1])
        d = (jnp.sum(kern[:, si:ei] * dual[j - 1, si:ei], axis=-1)
             + jnp.sum(kern[:, sj:ej] * dual[i, sj:ej], axis=-1)
             + model["intercept"][p])
        decs.append(d)
    return jnp.stack(decs, axis=-1)


def svc_predict(model: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """One-vs-one voting -> class *indices* into model['classes']."""
    dec = svc_decision_values(model, x)
    k = len(np.asarray(model["n_support"]))
    votes = jnp.zeros((x.shape[0], k), jnp.int32)
    for p, (i, j) in enumerate(_pair_index(k)):
        win_i = dec[:, p] > 0
        votes = votes.at[:, i].add(win_i.astype(jnp.int32))
        votes = votes.at[:, j].add(1 - win_i.astype(jnp.int32))
    return jnp.argmax(votes, axis=-1)


def _multiclass_coupling(r: jnp.ndarray, k: int,
                         max_iter: int = 100) -> jnp.ndarray:
    """libsvm multiclass_probability (Wu & Lin method 2), batched.

    r: [B, k, k] pairwise probabilities (r[:,i,j] = P(class i | i or j)).
    """
    B = r.shape[0]
    eps = 0.005 / k
    rT = jnp.swapaxes(r, 1, 2)
    # Q[t,t] = sum_{j!=t} r[j,t]^2 ; Q[t,j] = -r[j,t] r[t,j]
    off = -rT * r
    eye = jnp.eye(k, dtype=bool)[None]
    diag = jnp.sum((rT ** 2) * (~eye), axis=2)      # [B, k]
    Q = jnp.where(eye, diag[:, :, None], off)

    p = jnp.full((B, k), 1.0 / k, r.dtype)

    def body(state):
        p, it, done = state
        Qp = jnp.einsum("btj,bj->bt", Q, p)
        pQp = jnp.sum(p * Qp, axis=-1, keepdims=True)
        max_err = jnp.max(jnp.abs(Qp - pQp), axis=-1)
        done = done | (max_err < eps)

        def seq_update(carry, t):
            p, Qp, pQp = carry
            diff = (-Qp[:, t] + pQp[:, 0]) / Q[:, t, t]
            diff = jnp.where(done, 0.0, diff)
            p = p.at[:, t].add(diff)
            pQp = ((pQp[:, 0] + diff * (diff * Q[:, t, t] + 2.0 * Qp[:, t]))
                   / ((1.0 + diff) ** 2))[:, None]
            Qp = (Qp + diff[:, None] * Q[:, t, :]) / (1.0 + diff)[:, None]
            p = p / (1.0 + diff)[:, None]
            return (p, Qp, pQp), None

        (p, Qp, pQp), _ = jax.lax.scan(seq_update, (p, Qp, pQp),
                                       jnp.arange(k))
        return p, it + 1, done

    def cond(state):
        _, it, done = state
        return (it < max_iter) & ~jnp.all(done)

    p, _, _ = jax.lax.while_loop(
        cond, body, (p, jnp.zeros((), jnp.int32),
                     jnp.zeros((B,), bool)))
    return p


def svc_predict_proba(model: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """[B, d] -> [B, k] probabilities in classes_ order."""
    dec = svc_decision_values(model, x)
    k = len(np.asarray(model["n_support"]))
    min_prob = 1e-7
    r = jnp.full((x.shape[0], k, k), 0.5, jnp.float32)
    for p_idx, (i, j) in enumerate(_pair_index(k)):
        f = dec[:, p_idx] * model["prob_a"][p_idx] + model["prob_b"][p_idx]
        pij = jax.nn.sigmoid(-f)  # 1/(1+exp(f)), numerically stable
        pij = jnp.clip(pij, min_prob, 1.0 - min_prob)
        r = r.at[:, i, j].set(pij)
        r = r.at[:, j, i].set(1.0 - pij)
    return _multiclass_coupling(r, k)


# ----------------------------------------------------------------------
# RandomForest
# ----------------------------------------------------------------------

def forest_predict_proba(model: Dict[str, Any], x: jnp.ndarray
                         ) -> jnp.ndarray:
    """[B, d] -> [B, k] mean of per-tree leaf distributions."""
    x = jnp.asarray(x)
    left, right = model["left"], model["right"]
    feature, threshold = model["feature"], model["threshold"]
    n_trees = left.shape[0]
    B = x.shape[0]
    node = jnp.zeros((n_trees, B), jnp.int32)

    def step(node, _):
        f = jnp.take_along_axis(feature, node, axis=1)        # [T, B]
        th = jnp.take_along_axis(threshold, node, axis=1)
        l = jnp.take_along_axis(left, node, axis=1)
        rgt = jnp.take_along_axis(right, node, axis=1)
        xv = x[jnp.arange(B)[None, :].repeat(n_trees, 0), f]  # x[:, f]
        is_leaf = l == -1
        nxt = jnp.where(xv <= th, l, rgt)
        return jnp.where(is_leaf, node, nxt), None

    node, _ = jax.lax.scan(step, node, None, length=model["max_depth"] + 1)
    # Gather leaf distributions: value [T, N, k]
    value = model["value"]
    dist = jnp.take_along_axis(
        value, node[:, :, None].repeat(value.shape[-1], -1), axis=1)
    return jnp.mean(dist, axis=0)                              # [B, k]


def forest_predict(model: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(forest_predict_proba(model, x), axis=-1)


# ----------------------------------------------------------------------
# Host (numpy) fast paths — identical numerics.
#
# The classifier heads are microscopic (38-dim inputs, <=hundreds of
# support vectors / small forests); on a TPU behind a dispatch-heavy
# transport each jitted call costs more in round-trips than the whole
# computation on host. The heavy stage (feature extraction DSP) stays
# on device; these run where they're fastest.
# ----------------------------------------------------------------------

def scaler_transform_np(scaler, x: np.ndarray) -> np.ndarray:
    return (np.asarray(x) - scaler["mean"]) / scaler["scale"]


def _svc_decision_values_np(model, x: np.ndarray) -> np.ndarray:
    sv = model["support_vectors"]
    x = np.asarray(x, np.float32)
    kind = model.get("kernel", "rbf")
    xs = x @ sv.T
    if kind == "rbf":
        d2 = (np.sum(x * x, -1, keepdims=True)
              + np.sum(sv * sv, -1)[None] - 2.0 * xs)
        kern = np.exp(-model["gamma"] * np.maximum(d2, 0.0))
    elif kind == "linear":
        kern = xs
    elif kind == "poly":
        kern = (model["gamma"] * xs + model["coef0"]) ** model["degree"]
    else:  # sigmoid
        kern = np.tanh(model["gamma"] * xs + model["coef0"])
    n_support = np.asarray(model["n_support"])
    starts = np.concatenate([[0], np.cumsum(n_support)])
    k = len(n_support)
    dual = model["dual_coef"]
    decs = []
    for p, (i, j) in enumerate(_pair_index(k)):
        si, ei = int(starts[i]), int(starts[i + 1])
        sj, ej = int(starts[j]), int(starts[j + 1])
        decs.append(kern[:, si:ei] @ dual[j - 1, si:ei]
                    + kern[:, sj:ej] @ dual[i, sj:ej]
                    + model["intercept"][p])
    return np.stack(decs, -1)


def svc_predict_np(model, x: np.ndarray) -> np.ndarray:
    dec = _svc_decision_values_np(model, x)
    k = len(np.asarray(model["n_support"]))
    votes = np.zeros((x.shape[0], k), np.int32)
    for p, (i, j) in enumerate(_pair_index(k)):
        win = dec[:, p] > 0
        votes[:, i] += win
        votes[:, j] += ~win
    return np.argmax(votes, -1)


def svc_predict_proba_np(model, x: np.ndarray) -> np.ndarray:
    dec = _svc_decision_values_np(model, x)
    k = len(np.asarray(model["n_support"]))
    B = x.shape[0]
    min_prob = 1e-7
    r = np.full((B, k, k), 0.5, np.float64)
    for p_idx, (i, j) in enumerate(_pair_index(k)):
        f = dec[:, p_idx] * model["prob_a"][p_idx] + model["prob_b"][p_idx]
        pij = np.clip(np.where(f >= 0, np.exp(-f) / (1 + np.exp(-f)),
                               1.0 / (1 + np.exp(f))),
                      min_prob, 1 - min_prob)
        r[:, i, j] = pij
        r[:, j, i] = 1.0 - pij

    # libsvm multiclass_probability (Wu & Lin method 2), per sample.
    eps = 0.005 / k
    out = np.empty((B, k))
    for b in range(B):
        Q = np.empty((k, k))
        for t in range(k):
            Q[t, t] = np.sum(r[b, :, t][np.arange(k) != t] ** 2)
            for j in range(k):
                if j != t:
                    Q[t, j] = -r[b, j, t] * r[b, t, j]
        p = np.full(k, 1.0 / k)
        for _ in range(max(100, k)):
            Qp = Q @ p
            pQp = float(p @ Qp)
            if np.max(np.abs(Qp - pQp)) < eps:
                break
            for t in range(k):
                diff = (-Qp[t] + pQp) / Q[t, t]
                p[t] += diff
                pQp = (pQp + diff * (diff * Q[t, t] + 2 * Qp[t])) \
                    / (1 + diff) ** 2
                Qp = (Qp + diff * Q[t, :]) / (1 + diff)
                p /= 1 + diff
        out[b] = p
    return out


def forest_predict_proba_np(model, x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    left, right = model["left"], model["right"]
    feature, threshold = model["feature"], model["threshold"]
    n_trees = left.shape[0]
    B = x.shape[0]
    node = np.zeros((n_trees, B), np.int32)
    ar = np.arange(n_trees)[:, None]
    for _ in range(model["max_depth"] + 1):
        f = feature[ar, node]
        th = threshold[ar, node]
        l = left[ar, node]
        rgt = right[ar, node]
        xv = x[np.arange(B)[None, :], f]
        nxt = np.where(xv <= th, l, rgt)
        node = np.where(l == -1, node, nxt)
    dist = model["value"][ar, node]                      # [T, B, k]
    return dist.mean(axis=0)


def forest_predict_np(model, x: np.ndarray) -> np.ndarray:
    return np.argmax(forest_predict_proba_np(model, x), -1)

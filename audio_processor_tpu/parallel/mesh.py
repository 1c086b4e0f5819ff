"""Device mesh + sharding rules.

Replaces the reference's process-per-GPU data parallelism
(services/multi_gpu_manager.py:17-117: spawn + CUDA_VISIBLE_DEVICES +
filesystem JSON aggregation) with single-process SPMD over a
``jax.sharding.Mesh``: the batch dimension shards over the ``data``
axis, and (optionally) attention heads / FFN hidden dims shard over a
``model`` axis for tensor parallelism. XLA inserts the collectives
over ICI; result "aggregation" is just a device->host fetch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              model: int = 1,
              seq: int = 1) -> Mesh:
    """Build a ('data', 'seq', 'model') mesh over the available
    devices.  ``seq`` > 1 enables sequence parallelism: activation
    time dims shard over 'seq' (make_train_step), with XLA inserting
    the all-gathers attention/conv need."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise RuntimeError(
            f"make_mesh needs {n_devices} devices but jax.devices() on "
            f"backend '{jax.default_backend()}' has only {len(devices)}. "
            "For a virtual CPU mesh, set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} and force "
            "the CPU backend (jax.config.update('jax_platforms', 'cpu')) "
            "BEFORE the JAX backend initializes.")
    devices = devices[:n_devices]
    if data is None:
        data = n_devices // (model * seq)
    assert data * model * seq == n_devices, \
        f"mesh {data}x{seq}x{model} != {n_devices} devices"
    arr = np.asarray(devices).reshape(data, seq, model)
    return Mesh(arr, axis_names=("data", "seq", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def w2v_param_specs(cfg) -> dict:
    """PartitionSpec tree for wav2vec2bert params (stacked layers have
    a leading layer axis).

    Tensor-parallel choices: q/k/v project out to heads -> shard the
    output dim; out-projection shards the input dim; FFN shards the
    intermediate dim both ways. Conv module and norms are replicated
    (cheap relative to attention/FFN).
    """
    dense_col = {"kernel": P(None, None, "model"), "bias": P(None, "model")}
    dense_row = {"kernel": P(None, "model", None), "bias": P(None)}
    ln = {"scale": P(None), "bias": P(None)}
    layer = {
        "ffn1_layer_norm": ln,
        "ffn1": {"intermediate_dense": dense_col, "output_dense": dense_row},
        "self_attn_layer_norm": ln,
        "self_attn": {
            "linear_q": dense_col, "linear_k": dense_col,
            "linear_v": dense_col, "linear_out": dense_row,
            "distance_embedding": P(None),
        },
        "conv_module": {
            "layer_norm": ln,
            "pointwise_conv1": {"kernel": P(None)},
            "depthwise_conv": {"kernel": P(None)},
            "depthwise_layer_norm": ln,
            "pointwise_conv2": {"kernel": P(None)},
        },
        "ffn2_layer_norm": ln,
        "ffn2": {"intermediate_dense": dense_col, "output_dense": dense_row},
        "final_layer_norm": ln,
    }
    return {
        "feature_projection": {
            "layer_norm": {"scale": P(), "bias": P()},
            "projection": {"kernel": P(None, "model"), "bias": P("model")},
        },
        "layers": layer,
        "lm_head": {"kernel": P(None, None), "bias": P(None)},
    }


def w2v_param_sharding(mesh: Mesh, cfg) -> dict:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        w2v_param_specs(cfg),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh, cfg):
    shardings = w2v_param_sharding(mesh, cfg)
    return jax.tree.map(jax.device_put, params, shardings)


def zero1_param_specs(params, mesh: Mesh, cfg) -> dict:
    """ZeRO-1 specs for optimizer MOMENTS: each param's tensor-parallel
    spec with 'data' added on the first unsharded dim divisible by the
    dp size, so Adam's m/v shard across data-parallel replicas instead
    of being replicated (memory drops ~2 x params x (dp-1)/dp; the
    per-step cost is the all-gather of updates XLA inserts at
    apply_updates — exactly optimizer-state sharding's trade).
    Leaves with no eligible dim (scalars, tiny biases) keep the param
    spec."""
    dp = mesh.shape.get("data", 1)
    specs = w2v_param_specs(cfg)

    def one(x, spec):
        if dp <= 1:
            return spec
        parts = list(spec) + [None] * (x.ndim - len(spec))
        for i, (axis, dim) in enumerate(zip(parts, x.shape)):
            if axis is None and dim >= dp and dim % dp == 0:
                parts[i] = "data"
                return P(*parts)
        return spec

    return jax.tree.map(one, params, specs,
                        is_leaf=lambda v: isinstance(v, P))


def opt_state_shardings(opt_state, params, mesh: Mesh, cfg,
                        zero1: bool = True):
    """An ``opt_state``-structured tree of NamedShardings: param-shaped
    subtrees (Adam mu/nu) get zero1_param_specs (or the plain param
    shardings when ``zero1`` is off); everything else (step counts,
    empty states) is replicated."""
    param_struct = jax.tree_util.tree_structure(params)
    moment_specs = (zero1_param_specs(params, mesh, cfg) if zero1
                    else w2v_param_specs(cfg))
    moment_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), moment_specs,
        is_leaf=lambda v: isinstance(v, P))
    rep = replicated(mesh)

    def walk(node):
        if jax.tree_util.tree_structure(node) == param_struct:
            return moment_sh
        if hasattr(node, "_fields"):          # NamedTuple states
            return type(node)(*[walk(c) for c in node])
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return type(node)(walk(c) for c in node)
        return rep

    return walk(opt_state)

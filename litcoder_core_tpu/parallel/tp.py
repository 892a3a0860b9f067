"""Tensor-parallel LM feature extraction over a 2-D ('data', 'model') mesh.

The reference runs its transformer forwards on exactly one device
(encoding/features/language_model.py:36-41 — a torch `.to(device)`); models
that do not fit one accelerator simply cannot be used as feature extractors.
This module is the TPU-native answer: Megatron-style tensor parallelism,
expressed as GSPMD sharding annotations instead of hand-written collectives
(the "pick a mesh, annotate shardings, let XLA insert collectives" recipe).

Design:
- a 2-D `jax.sharding.Mesh` with axes ('data', 'model');
- parameter placement rules map HF Flax param paths to PartitionSpecs:
  column-parallel kernels (attention qkv, MLP up/gate) shard their OUTPUT
  dim over 'model' (their biases shard with them), row-parallel kernels
  (attention output, MLP down) shard their INPUT dim, everything else
  (embeddings, layernorms) replicates;
- inputs shard their batch dim over 'data';
- `jax.jit` + the XLA SPMD partitioner propagate those shardings through
  the whole forward and insert the reduce-scatter/all-reduce pattern on ICI.

Sharding annotations never change semantics — a rule that XLA cannot lay
out efficiently costs resharding traffic, not correctness — so the rules
here are deliberately conservative: a dim is only sharded when its size is
divisible by the 'model' axis extent, and unknown parameter names replicate.
"""

import logging
import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Column-parallel: shard the matmul OUTPUT dim (and the bias with it).
# Covers GPT-2 fused qkv + MLP-up (c_attn/c_fc), separate-projection
# families (q/k/v_proj, llama up/gate), and BERT/T5-style names.
_COL_PARALLEL = re.compile(
    r"(c_attn|c_fc|q_proj|k_proj|v_proj|query|key|value|gate_proj|up_proj"
    r"|wi_0|wi_1|wi|fc1|intermediate/dense|intermediate_dense)(/|$)"
)
# Row-parallel: shard the matmul INPUT dim; bias replicates (it is added
# after the cross-shard reduction).
_ROW_PARALLEL = re.compile(
    r"(c_proj|o_proj|out_proj|down_proj|wo|fc2|attn/dense|attention/dense"
    r"|output/dense|output_dense)(/|$)"
)
# GPT-2's Conv1D modules store kernels TRANSPOSED relative to flax Dense:
# (out_features, in_features) — HF FlaxGPT2 mirrors torch's Conv1D layout
# and transposes at apply time. Dense-style families are (in, out).
_CONV1D_LAYOUT = re.compile(r"(c_attn|c_fc|c_proj)(/|$)")


def make_lm_mesh(n_data: int = 1, n_model: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D ('data', 'model') mesh over the first n_data*n_model devices.

    Like `mesh.make_mesh`, refuses to truncate silently: asking for more
    devices than exist raises with a provisioning hint.
    """
    if devices is None:
        devices = jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    need = n_data * n_model
    if n_model < 1 or len(devices) < need:
        # n_model < 1 happens when n_data alone exceeds the device count
        # (len(devices)//n_data == 0) — without this check `need` would be
        # 0 and an empty zero-device mesh would slip through.
        raise RuntimeError(
            f"make_lm_mesh({n_data}, {n_model}) needs "
            f"{max(need, n_data)} devices but only {len(devices)} exist "
            f"(platform={devices[0].platform})"
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_param(path: str, shape: Tuple[int, ...], n_model: int) -> P:
    """PartitionSpec for one parameter, by path pattern + divisibility.

    Dense-style kernels are (in, out); GPT-2 Conv1D kernels are (out, in).
    Column-parallel shards the OUT dim, row-parallel the IN dim — resolved
    against the actual layout. 1-D leaves (biases/scales) shard only when
    they belong to a column-parallel projection (their length is the
    sharded output dim). Everything else — embeddings, layernorms, unknown
    names — replicates.
    """
    ndim = len(shape)
    col = _COL_PARALLEL.search(path) is not None
    row = _ROW_PARALLEL.search(path) is not None
    conv1d = _CONV1D_LAYOUT.search(path) is not None
    if ndim == 2 and (col or row):
        out_dim = 0 if conv1d else 1
        dim = out_dim if col else 1 - out_dim
        if shape[dim] % n_model == 0:
            spec = [None, None]
            spec[dim] = MODEL_AXIS
            return P(*spec)
    if ndim == 1 and col and "bias" in path and shape[0] % n_model == 0:
        return P(MODEL_AXIS)
    return P()


def shard_lm_params(params, mesh: Mesh):
    """Place an HF Flax param pytree onto `mesh` under the TP rules.

    Returns a new pytree of committed, sharded device arrays; logs a
    one-line summary of how many tensors sharded vs replicated.
    """
    n_model = mesh.shape[MODEL_AXIS]
    counts = {"sharded": 0, "replicated": 0}

    def place(key_path, leaf):
        path = _path_str(key_path)
        spec = spec_for_param(path, np.shape(leaf), n_model)
        counts["sharded" if spec != P() else "replicated"] += 1
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed = jax.tree_util.tree_map_with_path(place, params)
    logger.info(
        "TP placement over %s mesh %s: %d tensors sharded, %d replicated",
        dict(mesh.shape), mesh.devices.shape,
        counts["sharded"], counts["replicated"],
    )
    return placed


def shard_batch(arrays, mesh: Mesh):
    """Shard a tuple of (B, ...) arrays over the 'data' axis.

    B must be a multiple of the data-axis extent — use `pad_batch` first.
    """
    out = []
    for a in arrays:
        spec = P(*([DATA_AXIS] + [None] * (np.ndim(a) - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def pad_batch_rows(n_rows: int, mesh: Mesh) -> int:
    """Rows of padding needed so a batch divides the 'data' axis."""
    d = mesh.shape[DATA_AXIS]
    return (-n_rows) % d


def pad_and_shard(arrays, mesh: Mesh):
    """Pad a tuple of (B, ...) arrays with zero rows to the 'data' extent
    and shard them. Returns (sharded_arrays, n_pad); callers slice the
    padding rows off the output batch dim. Zero rows are safe for both
    extractors: an all-zero attention mask pools position 0 (discarded),
    and a zero audio window is a valid encoder input (discarded)."""
    n_pad = pad_batch_rows(arrays[0].shape[0], mesh)
    if n_pad:
        arrays = tuple(
            np.concatenate([a, np.zeros((n_pad,) + a.shape[1:], a.dtype)])
            for a in arrays
        )
    return shard_batch(arrays, mesh), n_pad

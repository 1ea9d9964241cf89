"""Sharding rules: map parameter-tree paths to `PartitionSpec`s.

Data parallelism shards the leading batch dim over ``data``; tensor
parallelism (off by default — model axis size 1) follows the Megatron layout
for transformer blocks: QKV / MLP-in kernels are column-sharded and the
output-projection / MLP-out kernels are row-sharded over ``model``, so each
block needs exactly one `psum` (inserted automatically by XLA from the specs).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arsvt_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# path-regex -> which axis (from the right) carries the model shard.
# Rules are rank-aware because encoder blocks are *stacked* along a leading
# depth axis (models/vit.py): a qkv kernel is (depth, D, 3D), so "column"
# sharding means the LAST axis, "row" the second-to-last, whatever the rank.
_COL = "col"  # output-feature sharded: qkv / fc1 kernels and biases
_ROW = "row"  # input-feature sharded: proj / fc2 kernels
_TP_RULES: list[tuple[str, str]] = [
    # NOTE: `.*attn/proj/kernel$` also matches cross_attn proj paths (the
    # `.*` absorbs the `cross_` prefix) — self- and cross-attention output
    # projections deliberately share the _ROW layout, ONE rule for both.
    (r".*attn/qkv/kernel$", _COL),
    (r".*attn/qkv/bias$", _COL),
    (r".*attn/proj/kernel$", _ROW),
    (r".*cross_attn/(q|kv)/kernel$", _COL),
    (r".*cross_attn/(q|kv)/bias$", _COL),
    (r".*mlp/fc1/kernel$", _COL),
    (r".*mlp/fc1/bias$", _COL),
    (r".*mlp/fc2/kernel$", _ROW),
]


def _tp_spec(kind: str, ndim: int) -> P:
    axes = [None] * ndim
    if kind == _COL:
        axes[-1] = MODEL_AXIS
    else:  # _ROW: second-to-last (the contraction axis)
        axes[-2] = MODEL_AXIS
    return P(*axes)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding_rules(params, mesh: Mesh):
    """PartitionSpec tree for a parameter tree.

    With model-axis size 1 every spec degenerates to replicated, which is the
    pure-DP regime; specs still carry the TP layout so scaling the model axis
    is a mesh-shape change only.
    """
    tp_on = mesh.shape.get(MODEL_AXIS, 1) > 1

    def spec_for(path, leaf):
        name = _path_str(path)
        if tp_on:
            for pat, kind in _TP_RULES:
                if re.match(pat, name):
                    return _tp_spec(kind, leaf.ndim)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter tree onto the mesh according to the rules."""
    specs = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch arrays shard their leading dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch pytree with its leading dim on ``data``.

    Remainder batches (eval tails with drop_remainder=False) whose leading
    dim does not divide the data axis are replicated instead — slower for
    that one batch, but correct on any mesh shape.
    """
    n_data = mesh.shape.get(DATA_AXIS, 1)

    def place(x):
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_on_mesh(tree, mesh: Mesh):
    """Give every leaf a mesh sharding: leaves that already carry a
    NamedSharding on `mesh` (params, optimizer moments via zeros_like) are
    left alone; everything else (optax scalars like `count`, injected
    hyperparams) is replicated. A train state placed this way restores and
    runs on ANY mesh shape."""

    def place(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return x
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)

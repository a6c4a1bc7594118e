"""Mesh construction and sharding rules.

The reference has no distributed support at all (SURVEY.md §2.3); this module
is the TPU-native parallelism design:

  * a 2-D logical mesh ('data', 'model') over the TPU slice; collectives ride
    ICI because the mesh axes map onto the physical torus via
    jax.make_mesh/create_device_mesh;
  * data parallel: every batch leaf shards its leading dim over 'data' —
    gradients all-reduce automatically under jit (GSPMD);
  * tensor parallel: the vocab projection (vocab can dominate params at
    d=512 / vocab≈10k), the word-embedding table, and the FFN expand/reduce
    matmuls shard over 'model'; XLA inserts the reduce-scatter/all-gather;
  * the (batch × length-beam) inference sweep is just the batch dim of the
    NAR decode, so the same 'data' sharding scales serving across a slice
    (BASELINE.json config 5).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh. shape e.g. {'data': 4, 'model': 2}."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = {"data": n, "model": 1}
    sizes = [shape.get("data", 1), shape.get("model", 1)]
    assert sizes[0] * sizes[1] == n, \
        "mesh %s does not cover %d devices" % (shape, n)
    try:
        # torus-aware placement: keeps each 'model' group on physically
        # adjacent chips (same host where possible) so TP collectives ride
        # ICI, and builds 'data' rings along torus axes — a naive reshape
        # of the flat device list can split a TP group across hosts/DCN
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_device_mesh(tuple(sizes), devices=devices)
    except Exception:
        arr = np.array(devices).reshape(sizes)
    return Mesh(arr, ("data", "model"))


# ---------------------------------------------------------------------------
# Batch sharding: leading dim over 'data'
# ---------------------------------------------------------------------------


def batch_pspec(leaf) -> P:
    nd = getattr(leaf, "ndim", 0)
    if nd == 0:
        return P()
    return P("data", *([None] * (nd - 1)))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh's 'data' axis.

    Single process: plain device_put with the data pspec. Multi-process
    (jax.distributed cluster): each host holds only its local slice, so the
    leaves are assembled into global arrays instead
    (parallel.distributed.make_global_batch).
    """
    if jax.process_count() > 1:
        from .distributed import make_global_batch
        return make_global_batch(batch, mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            out[k] = jax.device_put(v, NamedSharding(mesh, batch_pspec(v)))
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Parameter sharding: tensor-parallel rules by parameter path
# ---------------------------------------------------------------------------

# (path regex, partition spec). First match wins; default replicated.
TP_RULES = [
    # vocab projection: (H, V) -> shard vocab; output logits shard on last dim
    (re.compile(r"tgt_word_prj.*kernel$"), P(None, "model")),
    # word embedding table: (V, H) -> shard vocab rows
    (re.compile(r"word_embeddings.*embedding$"), P("model", None)),
    # FFN expand (H, 4H) / reduce (4H, H): Megatron-style col/row split.
    # The reduce rule is anchored to the layer-level FFN block — every
    # attention module also contains an 'output/dense' (its (H, H)
    # out-projection, layers.py BertSelfOutput) whose input is replicated,
    # so row-sharding it would force an extra reshard+all-reduce per
    # attention per layer for no FLOP win.
    (re.compile(r"intermediate/dense/kernel$"), P(None, "model")),
    (re.compile(r"layer_\d+/output/dense/kernel$"), P("model", None)),
    (re.compile(r"intermediate/dense/bias$"), P("model")),
]


def param_pspec(path: str, leaf) -> P:
    for rx, spec in TP_RULES:
        if rx.search(path):
            if len(spec) <= getattr(leaf, "ndim", 0):
                return spec
    return P()


def _iter_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_paths(v, prefix + k + "/")
    else:
        yield prefix[:-1], tree


def shard_params(variables: Dict, mesh: Mesh) -> Dict:
    """Place every param leaf with its TP spec (replicated otherwise).

    Multi-process: every host holds the full (identical) param in host
    memory, so each global array is assembled shard-by-shard via
    make_array_from_callback — works for any TP spec regardless of how mesh
    axes map onto processes.
    """
    multiproc = jax.process_count() > 1
    flat = dict(_iter_paths(variables))
    placed_flat = {}
    for path, leaf in flat.items():
        spec = param_pspec(path, leaf)
        sharding = NamedSharding(mesh, spec)
        if multiproc and hasattr(leaf, "shape"):
            arr = np.asarray(leaf)
            placed_flat[path] = jax.make_array_from_callback(
                arr.shape, sharding, lambda idx, a=arr: a[idx])
        else:
            placed_flat[path] = jax.device_put(leaf, sharding)

    def unflatten(flat):
        root: Dict[str, Any] = {}
        for path, v in flat.items():
            parts = path.split("/")
            node = root
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return root

    return unflatten(placed_flat)

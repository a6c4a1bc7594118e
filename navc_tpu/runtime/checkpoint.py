"""Self-describing checkpoints (params + opt state + embedded config).

Capability parity with reference misc/utils.py save_checkpoint /
load_model_and_opt (utils.py:54-63, 195-202): every checkpoint embeds the
resolved config so evaluation can rebuild the exact model; extends the
reference by also saving optimizer state and the epoch (the reference cannot
resume mid-training, SURVEY.md §5).

Format: a single msgpack-free pickle of numpy-ified pytrees — dependency-light
and portable across CPU/TPU hosts.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import Config
from ..models import build_model


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], filepath: str,
                    filename: str = "checkpoint.ckpt") -> str:
    os.makedirs(filepath, exist_ok=True)
    path = os.path.join(filepath, filename)
    payload = dict(state)
    for key in ("params", "batch_stats", "opt_state"):
        if key in payload and payload[key] is not None:
            payload[key] = _to_numpy(payload[key])
    if "settings" in payload and isinstance(payload["settings"], Config):
        payload["settings"] = payload["settings"].to_dict()
    # atomic replace: the rolling resume checkpoint is overwritten in place
    # every eval epoch, and a crash mid-dump must not destroy the only
    # resume state (truncated pickle -> unresumable run)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_model_and_config(path: str) -> Tuple[Any, Dict[str, Any], Config, Dict[str, Any]]:
    """Returns (model, variables, cfg, other_info) — reference utils.py:54-63.

    Variables are device_put once at load: numpy leaves fed to a jitted
    function re-transfer host->device on EVERY call (measured 4.4x decode
    slowdown over the remote transport; pure waste on any hardware).
    """
    ckpt = load_checkpoint(path)
    cfg = Config.from_dict(ckpt["settings"])
    model = build_model(cfg)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    variables = jax.device_put(variables)
    other = {k: v for k, v in ckpt.items()
             if k not in ("params", "batch_stats", "opt_state")}
    return model, variables, cfg, other


# ---------------------------------------------------------------------------
# Orbax backend (optional): sharded/async checkpointing for large-scale runs.
# The pickle format above remains the default interchange format (small
# models, self-describing single file); orbax adds atomic-rename durability
# and per-array chunking for multi-host deployments.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(state: Dict[str, Any], directory: str) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    payload = dict(state)
    if "settings" in payload and isinstance(payload["settings"], Config):
        payload["settings"] = payload["settings"].to_dict()
    arrays = {k: payload.pop(k) for k in ("params", "batch_stats", "opt_state")
              if payload.get(k) is not None}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "arrays"), _to_numpy(arrays), force=True)
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump(payload, f)
    return path


def load_checkpoint_orbax(directory: str,
                          templates: Optional[Dict[str, Any]] = None
                          ) -> Dict[str, Any]:
    """``templates`` maps array-group keys (e.g. 'opt_state') to pytrees of
    the expected structure: orbax restores untyped containers (optax
    NamedTuple states come back as plain dicts and cannot feed tx.update),
    so pass e.g. ``{'opt_state': tx.init(params)}`` to get typed nodes back.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.PyTreeCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.join(path, "arrays"))
    if templates:
        for key, template in templates.items():
            if key in arrays:
                treedef = jax.tree_util.tree_structure(template)
                arrays[key] = jax.tree_util.tree_unflatten(
                    treedef, jax.tree_util.tree_leaves(arrays[key]))
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        payload = pickle.load(f)
    payload.update(arrays)
    return payload


def _flatten_with_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_with_paths(v, prefix + k + "."))
    else:
        out[prefix[:-1]] = tree
    return out


def load_satisfied_weights(variables: Dict, checkpoint_path: str,
                           str_mapping: Optional[Dict[str, str]] = None,
                           verbose: bool = True) -> Dict:
    """Partial weight loading with key remapping (reference utils.py:158-192).

    Used to initialize a NAR student from the AR teacher: the reference maps
    'decoder.bert.' -> 'decoder.' (misc/run.py:274-279); in this framework the
    disentangled decoder shares the same module path, so the default mapping
    is identity.
    """
    str_mapping = str_mapping or {}
    ckpt = load_checkpoint(checkpoint_path)
    src_flat = _flatten_with_paths({"params": ckpt["params"],
                                    "batch_stats": ckpt.get("batch_stats", {})})
    dst_flat = _flatten_with_paths({"params": variables["params"],
                                    "batch_stats": variables.get("batch_stats", {})})

    success = 0
    new_flat = {}
    for k, v in dst_flat.items():
        key = k
        for src, trg in str_mapping.items():
            if src in key:
                key = key.replace(src, trg)
                break
        if key in src_flat and src_flat[key].shape == np.asarray(v).shape:
            new_flat[k] = src_flat[key]
            success += 1
        else:
            new_flat[k] = v
    if verbose:
        print("Successfully loading %d/%d parameters" % (success, len(new_flat)))

    def unflatten(flat):
        root: Dict[str, Any] = {}
        for path, v in flat.items():
            parts = path.split(".")
            node = root
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return root

    rebuilt = unflatten(new_flat)
    out = {"params": rebuilt.get("params", {})}
    if variables.get("batch_stats"):
        out["batch_stats"] = rebuilt.get("batch_stats", {})
    return out

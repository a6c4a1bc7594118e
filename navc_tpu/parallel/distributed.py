"""Multi-host (multi-process) distributed runtime.

The reference is strictly single-process/single-GPU (SURVEY.md §5: no DDP,
no horovod, no torch.distributed anywhere); this module is the TPU-native
scale-out path it lacks:

  * ``initialize()`` wraps ``jax.distributed.initialize`` so one entry point
    covers TPU pods (auto cluster detection) and explicit coordinator
    clusters (tests use a 2-process CPU cluster with gloo collectives);
  * per-host data sharding: every host loads only its slice of the epoch
    order (``navc_tpu.data.loader.BatchLoader(num_shards=, shard_id=)``) and
    contributes its host-local arrays to one global jax.Array via
    ``make_global_batch`` — collectives then ride ICI/DCN under GSPMD exactly
    as in the single-process mesh path (navc_tpu.parallel.mesh).

Process-0-only side effects (checkpoints, CSV logs) go through
``is_primary()`` / ``primary_only``.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join (or form) a multi-process JAX cluster.

    Arguments default to the ``NAVC_COORDINATOR`` / ``NAVC_NUM_PROCESSES`` /
    ``NAVC_PROCESS_ID`` environment variables; with none set and none passed,
    ``jax.distributed.initialize()`` runs in auto-detection mode (TPU pod
    metadata). Safe to call twice (second call is a no-op). Must run before
    any other JAX API touches the backend.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get("NAVC_COORDINATOR")
    if num_processes is None and "NAVC_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NAVC_NUM_PROCESSES"])
    if process_id is None and "NAVC_PROCESS_ID" in os.environ:
        process_id = int(os.environ["NAVC_PROCESS_ID"])

    # NB: must not touch jax.default_backend()/jax.devices() here — that
    # would initialize the XLA backend before the cluster exists.
    platforms = (getattr(jax.config, "jax_platforms", None) or
                 os.environ.get("JAX_PLATFORMS", "") or "")
    if platforms.startswith("cpu"):
        # CPU cross-process collectives need an explicit implementation;
        # gloo is compiled into jaxlib and is what the 2-process tests use.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, logs)."""
    return jax.process_index() == 0


def primary_only(fn):
    """Decorator: run ``fn`` on process 0 only; other hosts get ``None``."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None

    return wrapper


def make_global_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Assemble per-host local arrays into global jax.Arrays on ``mesh``.

    Each host passes its *local* slice of the global batch (leading dim =
    global_batch / process_count, produced by a host-sharded BatchLoader);
    the result is one global array per leaf, sharded over the mesh's 'data'
    axis, ready for the SPMD train step. Non-array leaves pass through.
    """
    import numpy as np
    from jax.sharding import NamedSharding

    from .mesh import batch_pspec

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:
            sharding = NamedSharding(mesh, batch_pspec(v))
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
        else:
            out[k] = v
    return out

"""Persistent XLA compilation cache.

Flagship-scale programs take minutes to compile (especially through remote
TPU compile services); the cache makes every run after the first start in
seconds. Opt-out with NAVC_COMPILE_CACHE=0; override the location with
NAVC_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str:
    loc = os.environ.get("NAVC_COMPILE_CACHE", "")
    if loc == "0":
        return ""
    if not loc:
        loc = os.path.expanduser("~/.cache/navc_tpu_xla")
    try:
        import jax
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return loc
    except Exception:
        return ""

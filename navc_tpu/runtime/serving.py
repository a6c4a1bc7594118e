"""Host-pipelined streaming inference for single-request serving.

The reference's latency protocol is strictly sequential — dispatch one
batch, wait for its result, then dispatch the next (translate.py:149-151,
misc/run.py:139-143) — so every request pays the host->device dispatch and
result-sync round-trip in series with device compute. For B=1 serving that
round-trip dominates: on the axon tunnel the measured decomposition is
~28 ms transport against ~3.5 ms device time per caption
(LATENCY_LIVE.json), and even on a local PCIe/gRPC hop dispatch latency is
the single-stream bound once the decode itself is a few milliseconds.

``StreamingCaptioner`` exploits XLA's async dispatch: ``submit`` enqueues a
request's encode + decode on the device and returns immediately; the host
only blocks syncing request *i* after requests *i+1 .. i+depth* are already
in flight, so transport/dispatch of one request overlaps device execution
of the next. Steady-state cost per request approaches
``max(device_time, result_transfer)`` instead of ``rtt + device_time``,
with per-request results still delivered strictly in submission order.

This is a capability the reference does not have (its eval loop is the
sequential protocol above); it changes *throughput of a request stream*,
not the latency of one isolated request, which is physically rtt-bound.
"""

from __future__ import annotations

import collections
import time
from typing import Iterable, Iterator, List, Optional, Tuple

import jax
import numpy as np

from ..config import Config
from .train_step import make_encode_fn


class StreamingCaptioner:
    """Bounded-depth pipelined captioning over a stream of requests.

    Parameters
    ----------
    cfg, model, variables: the student model (any method).
    teacher: optional (teacher_cfg, teacher_model, teacher_variables) for
        NAR teacher rescoring (reference algorithms.py:136-204).
    dict_mapping: optional student->teacher vocab id map.
    depth: max requests in flight before ``submit`` blocks on the oldest.
        depth=0 degenerates to the reference's sequential protocol.
    """

    def __init__(self, cfg: Config, model, variables,
                 teacher: Optional[tuple] = None,
                 dict_mapping: Optional[np.ndarray] = None,
                 depth: int = 2):
        import jax.numpy as jnp

        from ..decoding import make_ar_generator, make_nar_generator

        self.cfg = cfg
        self.depth = max(0, int(depth))
        self._variables = variables
        self._encode = make_encode_fn(cfg, model)
        self._teacher = teacher
        self._dict_mapping = (None if dict_mapping is None
                              else jnp.asarray(dict_mapping))
        if cfg.decoding_type == "NARFormer":
            tmodel = teacher[1] if teacher is not None else None
            self._generate = make_nar_generator(cfg, model, tmodel)
            self._teacher_encode = (make_encode_fn(teacher[0], tmodel)
                                    if teacher is not None else None)
        else:
            self._generate = make_ar_generator(cfg, model)
            self._teacher_encode = None
        self._inflight = collections.deque()  # (ticket, device hyp)
        self._next_ticket = 0

    # -- pipeline core ----------------------------------------------------

    def _dispatch(self, feats, category):
        import jax.numpy as jnp

        v = self._variables
        feats = [jnp.asarray(f) for f in feats]
        cat = (jnp.asarray(category) if self.cfg.with_category
               and category is not None else None)
        enc = self._encode(v["params"], v.get("batch_stats", {}), feats)
        if self.cfg.decoding_type == "NARFormer":
            tenc, tvars = None, None
            if self._teacher_encode is not None:
                tvars = self._teacher[2]
                tenc = self._teacher_encode(
                    tvars["params"], tvars.get("batch_stats", {}), feats)
            hyp = self._generate(v, enc, cat, tvars, tenc,
                                 self._dict_mapping)
        else:
            hyp, _ = self._generate(v, enc, cat)
        return hyp  # device array; NOT synced — stays async in flight

    @staticmethod
    def _sync(hyp) -> np.ndarray:
        # np.asarray forces execution + transfer; block_until_ready is not
        # reliable over the tunnel transport (CLAUDE.md)
        return np.asarray(jax.device_get(hyp))

    def submit(self, feats, category=None) -> Tuple[int, List[Tuple[int, np.ndarray]]]:
        """Enqueue one request. Returns (ticket, completed) where
        ``completed`` holds any (ticket, hypotheses) forced out of the
        pipeline to respect ``depth`` — in submission order."""
        ticket = self._next_ticket
        self._next_ticket += 1
        self._inflight.append((ticket, self._dispatch(feats, category)))
        done = []
        while len(self._inflight) > self.depth:
            t, hyp = self._inflight.popleft()
            done.append((t, self._sync(hyp)))
        return ticket, done

    def flush(self) -> List[Tuple[int, np.ndarray]]:
        """Sync every in-flight request, in submission order."""
        done = []
        while self._inflight:
            t, hyp = self._inflight.popleft()
            done.append((t, self._sync(hyp)))
        return done

    # -- conveniences ------------------------------------------------------

    def map_stream(self, requests: Iterable[tuple]) -> Iterator[np.ndarray]:
        """Yield hypotheses for an iterable of (feats, category) requests in
        order, keeping ``depth`` requests in flight."""
        for req in requests:
            feats, category = req if isinstance(req, tuple) else (req, None)
            _, done = self.submit(feats, category)
            for _, hyp in done:
                yield hyp
        for _, hyp in self.flush():
            yield hyp

    def timed_stream(self, requests: List[tuple]) -> Tuple[List[np.ndarray], float]:
        """Run a request list through the pipeline; returns (results,
        mean seconds per request). The reference's sequential number for the
        same stream is ``depth=0``."""
        t0 = time.perf_counter()
        out = list(self.map_stream(requests))
        dt = (time.perf_counter() - t0) / max(1, len(out))
        return out, dt

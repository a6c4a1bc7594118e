"""StreamingCaptioner: pipelined results == sequential results, in order."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from navc_tpu.config import default_config
from navc_tpu.models import build_model, init_params
from navc_tpu.runtime.serving import StreamingCaptioner

OVER = dict(vocab_size=80, dim_hidden=24, num_attention_heads=4,
            intermediate_size=32, n_frames=4, dim_i=12, dim_m=10,
            modality="mi", max_len=10, batch_size=1, length_beam_size=2,
            iterations=2, compute_dtype="float32")


def _requests(cfg, n=5, b=1):
    rng = np.random.RandomState(3)
    reqs = []
    for _ in range(n):
        feats = [rng.randn(b, cfg.n_frames, d).astype(np.float32)
                 for d in cfg.modality_dims]
        cat = rng.randint(0, cfg.num_category, (b, 1)).astype(np.int32)
        reqs.append((feats, cat))
    return reqs


@pytest.mark.parametrize("method", ["NACF", "ARB"])
def test_pipelined_matches_sequential(method):
    cfg = default_config(method, dataset="MSRVTT", **OVER)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)

    teacher = None
    if method == "NACF":
        tcfg = default_config("ARB", dataset="MSRVTT", **OVER)
        tmodel = build_model(tcfg)
        tvars = init_params(tmodel, jax.random.PRNGKey(1), tcfg)
        teacher = (tcfg, tmodel, tvars)

    reqs = _requests(cfg, n=5)
    seq = StreamingCaptioner(cfg, model, variables, teacher, depth=0)
    pipe = StreamingCaptioner(cfg, model, variables, teacher, depth=2)

    out_seq = list(seq.map_stream(reqs))
    out_pipe = list(pipe.map_stream(reqs))
    assert len(out_seq) == len(out_pipe) == len(reqs)
    for a, b in zip(out_seq, out_pipe):
        np.testing.assert_array_equal(a, b)


def test_submit_flush_orders_and_depth():
    cfg = default_config("NAB", dataset="MSVD", **OVER)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    cap = StreamingCaptioner(cfg, model, variables, depth=3)

    reqs = _requests(cfg, n=5)
    tickets, done = [], []
    for feats, cat in reqs:
        t, d = cap.submit(feats, cat)
        tickets.append(t)
        done.extend(d)
        assert len(cap._inflight) <= 3
    done.extend(cap.flush())
    assert [t for t, _ in done] == tickets  # strict submission order
    assert not cap._inflight

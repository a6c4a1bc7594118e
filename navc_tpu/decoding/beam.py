"""Autoregressive beam search as a static-shape on-device scan.

Capability parity with reference models/Beam.py + models/Translator.py,
re-designed TPU-first:
  * the token-by-token host loop with per-instance Python ``Beam`` objects and
    dynamic batch shrinking (Translator.py:148-157, collate_active_info 58-72)
    becomes one ``lax.scan`` over a static (B, beam, max_len) buffer with
    per-instance done-masking;
  * hypotheses are stored as sequence snapshots instead of backpointer walks
    (Beam.py:132-139) — identical outputs, gather-friendly layout.

Reference idiosyncrasies preserved exactly (parity-tested vs a NumPy port):
  * step 1 draws the top-k from beam slot 0 only (Beam.py:78-79),
  * beams whose last token is EOS have their whole score row set to -1e20
    before the top-k (Beam.py:74-77),
  * an instance finishes once ``specific_nums_of_sents`` (= max(beam, topk),
    Beam.py:11) hypotheses are collected, scanning beam slots in order
    (Beam.py:95-99),
  * at max_len, instances with an empty finished list append every beam slot
    (Beam.py:111-116),
  * final ranking by score / length**alpha at sort time (Beam.py:123-130).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import Config
from .length_beam import enlarge

NEG_BIG = -1e20


class BeamState(NamedTuple):
    seqs: jnp.ndarray        # (B, K, L) int32; pos 0 = BOS, step t writes pos t
    scores: jnp.ndarray      # (B, K) float32 cumulative log-probs
    fin_seqs: jnp.ndarray    # (B, F, L) snapshots at finish time
    fin_scores: jnp.ndarray  # (B, F)
    fin_lens: jnp.ndarray    # (B, F) int32 hypothesis length (incl. EOS)
    fin_count: jnp.ndarray   # (B,) int32
    done: jnp.ndarray        # (B,) bool


def _append_finished(state: BeamState, eligible: jnp.ndarray,
                     scores: jnp.ndarray, seqs: jnp.ndarray,
                     t: int, capacity_limit: int) -> BeamState:
    """Append eligible (B, K) slots in beam order up to per-row capacity.

    Formulated as one-hot select/reduce instead of scatter: 2-D scatters
    lower to the TPU scalar core and the previous concat + .at[].set
    version cost ~150 us/step of serialized bookkeeping fusions at
    B=1024 (ARB_DECOMP r5). Each accepted (row, beam) lands in a distinct
    slot (fin_count + rank among accepted, beam order preserved —
    Beam.py:95-99), so the masked sum over the beam axis recovers every
    written value exactly; slots >= capacity simply match nothing.
    """
    b, k = eligible.shape
    f = state.fin_scores.shape[1]
    rank = jnp.cumsum(eligible.astype(jnp.int32), axis=1) - 1  # order among eligible
    capacity = capacity_limit - state.fin_count  # (B,)
    accept = eligible & (rank < capacity[:, None])
    slot = jnp.where(accept, state.fin_count[:, None] + rank, f)  # f = no-op

    onehot = (slot[:, :, None] == jnp.arange(f)[None, None, :])  # (B, K, F)
    written = jnp.any(onehot, axis=1)  # (B, F)
    upd_scores = jnp.sum(jnp.where(onehot, scores[:, :, None], 0.0), axis=1)
    upd_seqs = jnp.sum(
        jnp.where(onehot[:, :, :, None], seqs[:, :, None, :], 0), axis=1)

    fin_scores = jnp.where(written, upd_scores, state.fin_scores)
    fin_lens = jnp.where(written, t, state.fin_lens)
    fin_seqs = jnp.where(written[:, :, None], upd_seqs, state.fin_seqs)

    new_count = state.fin_count + accept.sum(axis=1)
    return state._replace(
        fin_seqs=fin_seqs, fin_scores=fin_scores,
        fin_lens=fin_lens, fin_count=new_count)


def _make_cached_step(cfg: Config, model, variables, enc, cat_tiled, k: int,
                      return_hidden: bool = False,
                      fused_attend: bool = False):
    """Incremental (KV-cached) decode step for the 1-layer decoder.

    The reference recomputes the whole prefix every token (Translator.py:108,
    no KV cache); the previous TPU path did the same inside the while_loop.
    Here step t computes ONE new position: its Q/K/V from the embedding of
    token t-1, appended to the cache; self-attention reads the cached keys
    with the same -10e6 masking, so every float op matches the full-prefix
    forward at position t-1 exactly (same per-row dots, same softmax
    denominator — masked keys underflow to exactly 0 in f32). In bfloat16
    mode ``dense`` mirrors flax ``nn.Dense(dtype=bf16)`` op-for-op (bf16
    product, bf16 bias add, then the call sites' f32 cast), so the A/B
    parity test covers both compute dtypes. Cross-attention K/V over
    enc_output are position-invariant and computed ONCE per decode instead
    of per forward. Per-step layer FLOPs drop from O(L·d²) to O(d²).
    """
    from ..models.layers import ACT2FN, MASK_FILL
    from ..ops.fused_layer import layer_weights_from_params

    p = variables["params"]["decoder"]
    emb_p = p["embedding"]
    # checkpoint-loaded trees hold numpy leaves; traced indexing needs jnp
    w = {kk: jnp.asarray(vv)
         for kk, vv in layer_weights_from_params(p["layer_0"]).items()}
    word_table = jnp.asarray(emb_p["word_embeddings"]["embedding"])
    pos_table = jnp.asarray(emb_p["position_embeddings"]["embedding"])
    ln_scale = jnp.asarray(emb_p["LayerNorm"]["scale"])
    ln_bias = jnp.asarray(emb_p["LayerNorm"]["bias"])
    nh = cfg.num_attention_heads
    h = cfg.dim_hidden
    dh = h // nh
    eps = cfg.layer_norm_eps
    f32 = cfg.compute_dtype == "float32"
    act = ACT2FN[cfg.hidden_act]

    def dense(x, kernel, bias):
        if f32:
            return jnp.dot(x, kernel) + bias
        # flax nn.Dense(dtype=bf16) promotes (input, kernel, bias) to bf16,
        # emits a bf16-output dot and adds the bias in bf16; replicate that
        # exactly (the model's call sites cast back to f32 afterwards, which
        # is lossless) so cached and full-prefix logits stay bit-identical
        out = jnp.dot(x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16))
        return (out + bias.astype(jnp.bfloat16)).astype(jnp.float32)

    def layernorm(x):
        # flax nn.LayerNorm fast-variance arithmetic, replicated exactly
        mu = x.mean(-1, keepdims=True)
        mu2 = (x * x).mean(-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mul = jax.lax.rsqrt(var + eps) * ln_scale
        return (x - mu) * mul + ln_bias

    b = enc.shape[0]
    n = b * k
    cat_vec = 0.0
    if cfg.with_category and cat_tiled is not None:
        cat_vec = jnp.asarray(emb_p["category_embeddings"]["embedding"])[
            cat_tiled.reshape(n, -1)[:, 0]]

    # cross-attention K/V: position-invariant AND identical across the k
    # beams of an instance (they come from the shared enc_output), so they
    # are computed once per decode over b rows, not b*k — the beam axis
    # rides the einsum batch instead (5x less HBM traffic on both cross
    # contractions; profiled at 1.1 ms/step of the tiled layout's cost)
    ke = dense(enc, w["wk_c"], w["bk_c"]).reshape(b, -1, nh, dh)
    ve = dense(enc, w["wv_c"], w["bv_c"]).reshape(b, -1, nh, dh)

    # one fused QKV projection per step: concatenated kernels give bitwise
    # the same per-column dots as three separate dense calls, at a third of
    # the dispatch overhead inside the while_loop
    w_qkv = jnp.concatenate([w["wq_s"], w["wk_s"], w["wv_s"]], axis=1)
    b_qkv = jnp.concatenate([w["bq_s"], w["bk_s"], w["bv_s"]], axis=0)

    def attend(q, kcache, vcache, mask):
        # same einsum contractions as models.layers.attention_core
        dt = jnp.float32 if f32 else jnp.bfloat16
        scores = jnp.einsum("nhd,nlhd->nhl", q.astype(dt), kcache.astype(dt),
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(dh)
        if mask is not None:
            scores = jnp.where(mask[:, None, :],
                               jnp.asarray(MASK_FILL, scores.dtype), scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("nhl,nlhd->nhd", probs.astype(dt), vcache.astype(dt),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.float32).reshape(n, h)

    def attend_cross(q):
        # same per-row dh-contractions as attend(); the beam axis k is a
        # batch dim so each (row, head, enc-pos) dot is bit-identical to the
        # tiled layout's — only the batching shape differs
        dt = jnp.float32 if f32 else jnp.bfloat16
        qb = q.reshape(b, k, nh, dh)
        scores = jnp.einsum("bkhd,blhd->bkhl", qb.astype(dt), ke.astype(dt),
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(dh)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bkhl,blhd->bkhd", probs.astype(dt), ve.astype(dt),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.float32).reshape(n, h)

    def finish_layer(self_att, x, npm, fused_cross=False):
        out = dense(self_att, w["wo_s"], w["bo_s"])
        att = (out + x) * npm

        qc = dense(att, w["wq_c"], w["bq_c"])
        if fused_cross:
            crossed = cross_attend(qc, ke_rows, ve_rows, nh=nh)
        else:
            crossed = attend_cross(qc.reshape(n, nh, dh))
        outc = dense(crossed, w["wo_c"], w["bo_c"])
        att = (outc + att) * npm

        inter = act(dense(att, w["wi"], w["bi"]))
        down = dense(inter, w["wo2"], w["bo2"])
        h_t = (down + att) * npm

        if return_hidden:
            return h_t
        return model.apply(variables, h_t, method=lambda m, hh: m.project(hh))

    def embed_qkv(seqs_flat, tok, t):
        # tok (N,) = token at position t-1, carried by the decode loop (the
        # previous step's selected words) — a dynamic_slice + gather of the
        # (N, L) buffer here cost ~80 us/step of scalar-core time at B=1024
        pos = jax.lax.dynamic_slice_in_dim(pos_table, t - 1, 1, axis=0)[0]
        emb = word_table[tok] + pos[None, :]
        if cfg.with_category and cat_tiled is not None:
            emb = emb + cat_vec
        x = layernorm(emb)
        npm = (tok != C.PAD).astype(jnp.float32)[:, None]
        qkv = dense(x, w_qkv, b_qkv)
        return x, npm, qkv

    def step(seqs_flat, tok, kcache, vcache, t):
        """(seqs (N, L), tok (N,), caches (N, L, nh, dh), t) ->
        (out, updated caches) where ``out`` is RAW projection logits (N, V)
        — callers apply their own log_softmax arithmetic — or hidden states
        (N, H) when built with return_hidden=True (the fused top-k kernel
        projects in-kernel). Computes the forward for position t-1, whose
        input token ``tok`` the loop carries."""
        x, npm, qkv = embed_qkv(seqs_flat, tok, t)
        q = qkv[:, :h].reshape(n, nh, dh)
        kt = qkv[:, h:2 * h].reshape(n, nh, dh)
        vt = qkv[:, 2 * h:].reshape(n, nh, dh)
        # bf16 cache writes are lossless in bf16 mode (kt/vt are f32 casts
        # of bf16 values from dense())
        kcache = jax.lax.dynamic_update_slice_in_dim(
            kcache, kt[:, None].astype(kcache.dtype), t - 1, axis=1)
        vcache = jax.lax.dynamic_update_slice_in_dim(
            vcache, vt[:, None].astype(vcache.dtype), t - 1, axis=1)

        # key mask: causal (j > t-1, i.e. not yet written) + key-pad —
        # identical to key_pad_mask | subsequent_mask at row t-1
        l = seqs_flat.shape[1]
        jpos = jnp.arange(l)[None, :]
        mask = (jpos > (t - 1)) | (seqs_flat == C.PAD)
        self_att = attend(q, kcache, vcache, mask)
        return finish_layer(self_att, x, npm), kcache, vcache

    if not fused_attend:
        return step

    from ..models.layers import MASK_FILL as _MF
    from ..ops.beam_attend import (beam_attend_step, cross_attend,
                                   cross_attend_eligible)

    le = ke.shape[1]
    # the kernel stores K/V at the production cache dtype; eligibility must
    # use the SAME itemsize its pick_rtile will see (in f32 parity mode the
    # rows are f32 — hardcoding bf16 here could pass eligibility for a shape
    # whose f32 pick_rtile then returns 0 and trips the kernel assert)
    fused_cross = cross_attend_eligible(n, le, h, 4 if f32 else 2)
    if fused_cross:
        # row-expand the per-instance enc K/V ONCE per decode (kept in HBM,
        # streamed by the kernel every step). bf16 storage is lossless in
        # the production dtype: dense() emits f32 casts of bf16 values.
        cdt = jnp.float32 if f32 else jnp.bfloat16
        ke_rows = jnp.repeat(ke.reshape(b, le * h).astype(cdt), k, axis=0)
        ve_rows = jnp.repeat(ve.reshape(b, le * h).astype(cdt), k, axis=0)
        # pin the expanded buffers in HBM: without the barrier XLA sinks the
        # (cheap-looking) broadcast+reshape INTO the decode while_loop and
        # re-materializes 2 x (N, le*h) EVERY step — profiled at ~975 us of
        # the 3,582 us step at B=1024 (27%; ARB_DECOMP r5). Keeping them
        # live across the loop trades ~2 x 84 MB of HBM residency for the
        # per-step rewrite traffic.
        ke_rows, ve_rows = jax.lax.optimization_barrier((ke_rows, ve_rows))

    def step_fused(seqs_flat, tok, kc2, vc2, prev_k, t):
        """Fused variant: caches are flat (N, L*h); the beam-ancestry
        permute from the PREVIOUS selection is applied lazily inside the
        kernel (ops/beam_attend.py) together with the append and the
        attention — the caches never pass through an XLA op, so the carry
        keeps the kernel's row-major layout (no transpose copies)."""
        x, npm, qkv = embed_qkv(seqs_flat, tok, t)
        q = qkv[:, :h]
        kt = qkv[:, h:2 * h]
        vt = qkv[:, 2 * h:]
        l = seqs_flat.shape[1]
        jpos = jnp.arange(l)[None, :]
        mask = (jpos > (t - 1)) | (seqs_flat == C.PAD)
        amask = jnp.where(mask, jnp.float32(_MF), jnp.float32(0.0))
        kc2, vc2, self_att = beam_attend_step(
            kc2, vc2, q, kt, vt, prev_k, amask, t - 1,
            k=k, nh=nh, l=l)
        return finish_layer(self_att, x, npm, fused_cross), kc2, vc2

    return step_fused


def make_ar_generator(cfg: Config, model, jit: bool = True):
    """Build the batched beam-search decode function.

    Returns fn(variables, enc_results, category) ->
        (hypotheses (B, max_len - 1) int32, scores (B,) float32)
    matching Translator.translate_batch_ARFormer semantics with topk=1.
    """
    k = cfg.beam_size
    max_len = cfg.max_len
    specific = max(k, cfg.topk)
    alpha = cfg.beam_alpha

    def decode_step(variables, seqs_flat, enc_output, category, t):
        # hidden states for the full prefix, then project ONLY position t-1
        # (the reference projects every position each step, Translator.py:108;
        # at L=30 that is 30x wasted vocab-projection FLOPs)
        from ..ops.eligibility import fused_layer_eligible
        # CPU interpret-mode is parity-tested elsewhere but too slow inside
        # the beam while_loop, so the fused layer is device-only here
        use_fused = (fused_layer_eligible(cfg, causal=True)
                     and jax.default_backend() != "cpu")
        if use_fused:
            from ..ops.fused_layer import (fused_nar_decoder_layer,
                                           layer_weights_from_params)
            emb_p = variables["params"]["decoder"]["embedding"]
            layer_w = layer_weights_from_params(
                variables["params"]["decoder"]["layer_0"])
            # checkpoint-loaded trees hold numpy leaves; indexing them with
            # traced ids (seqs_flat/category inside the while_loop) needs jnp
            word_table = jnp.asarray(emb_p["word_embeddings"]["embedding"])
            n, l = seqs_flat.shape
            static = jnp.broadcast_to(
                jnp.asarray(emb_p["position_embeddings"]["embedding"])[None, :l, :],
                (n, l, word_table.shape[1]))
            if cfg.with_category and category is not None:
                cat = jnp.asarray(emb_p["category_embeddings"]["embedding"])[
                    category.reshape(n, -1)[:, 0]]
                static = static + cat[:, None, :]
            hidden = fused_nar_decoder_layer(
                word_table[seqs_flat], enc_output, seqs_flat == C.PAD, layer_w,
                n_head=cfg.num_attention_heads, tb=4, causal=True,
                static=static, ln_scale=emb_p["LayerNorm"]["scale"],
                ln_bias=emb_p["LayerNorm"]["bias"], ln_eps=cfg.layer_norm_eps)
        else:
            hidden, _, _ = model.apply(
                variables, seqs_flat, enc_output, category, "ARFormer", True,
                method=lambda m, *a: m.decode(*a))
        h_t = jax.lax.dynamic_slice_in_dim(hidden, t - 1, 1, axis=1)[:, 0, :]
        logits = model.apply(variables, h_t, method=lambda m, h: m.project(h))
        return jax.nn.log_softmax(logits, axis=-1)

    def generate(variables, enc_results: Dict[str, jnp.ndarray],
                 category: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from ..ops.eligibility import kv_cached_beam_eligible

        enc_output = enc_results["enc_output"]
        b = enc_output.shape[0]
        cat_tiled = None if category is None else enlarge(category, k)

        use_cache = kv_cached_beam_eligible(cfg)
        if use_cache:
            import os

            from ..ops.beam_attend import beam_attend_eligible
            from ..ops.beam_permute import (beam_permute_eligible,
                                            permute_beam_caches)
            from ..ops.eligibility import fused_vocab_eligible
            from ..ops.vocab_fused import (fused_project_topk,
                                           projection_weights)
            nh = cfg.num_attention_heads
            dh = cfg.dim_hidden // nh
            itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
            on_device = jax.default_backend() != "cpu"
            # fully-fused permute+append+attend (ops/beam_attend.py): owns
            # the caches end-to-end; subsumes the standalone permute kernel
            use_fused_attend = (
                cfg.use_pallas
                and on_device
                and beam_attend_eligible(b, k, max_len, cfg.dim_hidden,
                                         itemsize)
                and not os.environ.get("NAVC_NO_ATTEND_KERNEL"))
            use_permute_kernel = (
                cfg.use_pallas
                and on_device
                and not use_fused_attend
                and beam_permute_eligible(b, k, max_len * nh * dh, itemsize)
                and not os.environ.get("NAVC_NO_PERMUTE_KERNEL"))
            # fused projection+top-k: device-only so the CPU parity oracles
            # keep the one-pass lse arithmetic (the kernel's online-softmax
            # normalizer can differ by ~1 ulp — a per-row constant, see
            # ops/vocab_fused.py fused_project_topk)
            # N cap: XLA's scoped-vmem pass may place the kernel's (N, k)
            # outputs in VMEM with lanes padded 5 -> 128 (T(8,128) tiling);
            # at N = 40960 (B=8192) that is a 2 x 21 MB stack allocation and
            # Mosaic lowering dies with a vmem OOM. 20480 (B=4096) is the
            # largest measured-good N; beyond it the XLA top-k path (raw
            # logits + lax.top_k) decodes identically, just without the
            # fused epilogue.
            use_topk_kernel = (
                cfg.use_pallas
                and on_device
                and fused_vocab_eligible(cfg)
                and b * k <= 20480
                and not os.environ.get("NAVC_NO_TOPK_KERNEL"))
            cached_step = _make_cached_step(cfg, model, variables,
                                            enc_output, cat_tiled, k,
                                            return_hidden=use_topk_kernel,
                                            fused_attend=use_fused_attend)
            if use_topk_kernel:
                w_proj, b_proj = projection_weights(cfg, variables["params"])
        else:
            enc_tiled = enlarge(enc_output, k)

        seqs = jnp.zeros((b, k, max_len), jnp.int32).at[:, :, 0].set(C.BOS)
        # slots 1..k-1 start at NEG_BIG so step 1 needs no special case: all
        # beams score identical logits, slot 0's k candidates dominate the
        # k*k top-k at the same flat positions (beam-major, vocab-ascending)
        # as a dedicated beam-0 draw — Beam.py:78-79's "first step reads only
        # beam 0" falls out of the generic step with zero extra ops
        state = BeamState(
            seqs=seqs,
            scores=jnp.full((b, k), NEG_BIG).at[:, 0].set(0.0),
            fin_seqs=jnp.zeros((b, specific, max_len), jnp.int32),
            fin_scores=jnp.zeros((b, specific)),
            fin_lens=jnp.zeros((b, specific), jnp.int32),
            fin_count=jnp.zeros((b,), jnp.int32),
            done=jnp.zeros((b,), bool),
        )

        def step(state: BeamState, last, kc, vc, pk, t):
            # ``last`` (B, K) = token at position t-1 of every beam, carried
            # by the loop (= the previous step's selected words after the
            # ancestry reorder; BOS at t=1). The previous formulation
            # re-gathered it from the (B, K, L) buffer every step — a
            # scalar-core gather worth ~80 us/step at B=1024. Rows of done
            # instances carry stale values, which never escape: every
            # consumer below is masked by ``active``.
            if use_cache:
                # Candidate-only normalization: top-k per beam runs on RAW
                # logits (log_softmax subtracts per-row scalars, so indices
                # and tie order are identical), then only the k candidates
                # get the exact log_softmax arithmetic ((x - max) - lse) —
                # the (N, V) normalized tensor is never materialized and the
                # big top-k shrinks from k*V to V lanes. The global top-k of
                # beam*V always lies inside the per-beam top-k sets, with
                # flattened tie order preserved (beam-major, vocab-ascending
                # within a beam), so selection is token-identical.
                tok = last.reshape(b * k)
                if use_fused_attend:
                    out, kc, vc = cached_step(
                        state.seqs.reshape(b * k, max_len), tok, kc, vc,
                        pk, t)
                else:
                    out, kc, vc = cached_step(
                        state.seqs.reshape(b * k, max_len), tok, kc, vc, t)
                if use_topk_kernel:
                    wp_k, ids_k = fused_project_topk(out, w_proj, k,
                                                     bias=b_proj)
                    wp_top = wp_k.reshape(b, k, k)
                    ids_top = ids_k.reshape(b, k, k)
                else:
                    mrow = jnp.max(out, axis=-1, keepdims=True)
                    lse = jnp.log(jnp.sum(jnp.exp(out - mrow), axis=-1,
                                          keepdims=True))
                    top_logit, top_idx = jax.lax.top_k(out, k)
                    wp_top = ((top_logit - mrow) - lse).reshape(b, k, k)
                    ids_top = top_idx.astype(jnp.int32).reshape(b, k, k)

                # a killed (EOS-ended) row's candidates can only win when
                # EVERY candidate of the instance is NEG_BIG (all beams
                # killed while fin_count < specific, reachable when
                # topk > beam); the reference then draws flat positions
                # 0..k-1 of the k*V canvas — beam 0, vocab ids 0..k-1
                # (Beam.py:74-77 + topk tie order). Pin killed rows' ids to
                # that same sequence so the per-beam-top-k candidate set
                # reproduces the identical junk tokens.
                ids_top = jnp.where(
                    (last == C.EOS)[:, :, None],
                    jnp.arange(k, dtype=jnp.int32)[None, None, :], ids_top)
                cand = wp_top + state.scores[:, :, None]
                cand = jnp.where((last == C.EOS)[:, :, None], NEG_BIG, cand)
                best_scores, best_flat = jax.lax.top_k(
                    cand.reshape(b, k * k), k)
                prev_k = (best_flat // k).astype(jnp.int32)
                next_word = jnp.take_along_axis(
                    ids_top.reshape(b, k * k), best_flat, axis=1)
            else:
                wp = decode_step(variables, state.seqs.reshape(b * k, max_len),
                                 enc_tiled, cat_tiled, t).reshape(b, k, -1)
                v = wp.shape[-1]

                # --- advance (Beam.py:68-117) -----------------------------
                beam_lk = wp + state.scores[:, :, None]
                beam_lk = jnp.where((last == C.EOS)[:, :, None], NEG_BIG, beam_lk)
                best_scores, best_ids = jax.lax.top_k(beam_lk.reshape(b, k * v), k)
                prev_k = (best_ids // v).astype(jnp.int32)
                next_word = (best_ids - prev_k * v).astype(jnp.int32)

            if use_cache:
                # the cache follows beam ancestry exactly like the sequences
                if use_fused_attend:
                    # lazily: next step's kernel permutes with this prev_k
                    pk = prev_k
                elif use_permute_kernel:
                    # one-pass block-diagonal one-hot permute of BOTH caches
                    # on the MXU (ops/beam_permute.py) — XLA's lowering of
                    # the same take_along_axis is a select_n chain + gather,
                    # profiled at ~3x the traffic (an XLA one-hot einsum was
                    # also tried: the M=K=5 batched matmul tiles terribly)
                    kc, vc = permute_beam_caches(kc, vc, prev_k, k)
                else:
                    kc = jnp.take_along_axis(
                        kc.reshape(b, k, max_len, nh, dh),
                        prev_k[:, :, None, None, None], axis=1
                    ).reshape(b * k, max_len, nh, dh)
                    vc = jnp.take_along_axis(
                        vc.reshape(b, k, max_len, nh, dh),
                        prev_k[:, :, None, None, None], axis=1
                    ).reshape(b * k, max_len, nh, dh)

            reordered = jnp.take_along_axis(
                state.seqs, prev_k[:, :, None], axis=1)
            new_seqs = jnp.where(
                (jnp.arange(max_len)[None, None, :] == t),
                next_word[:, :, None], reordered)

            active = ~state.done
            seqs_out = jnp.where(active[:, None, None], new_seqs, state.seqs)
            scores_out = jnp.where(active[:, None], best_scores, state.scores)
            st = state._replace(seqs=seqs_out, scores=scores_out)

            # --- record EOS hypotheses (Beam.py:95-99) --------------------
            eligible = (next_word == C.EOS) & active[:, None]
            st = _append_finished(st, eligible, best_scores, new_seqs, t, specific)
            newly_done = st.fin_count >= specific

            # --- max_len fallback (Beam.py:111-116) -----------------------
            # only the final step can accept fallback rows; cond skips the
            # whole hypothesis-buffer scatter on every other iteration
            def do_fallback(s: BeamState) -> BeamState:
                empty = (s.fin_count == 0) & active
                fallback = jnp.broadcast_to(empty[:, None], (b, k))
                return _append_finished(s, fallback, best_scores, new_seqs,
                                        t, specific)

            st = jax.lax.cond(t == max_len - 1, do_fallback, lambda s: s, st)

            st = st._replace(done=st.done | newly_done)
            return st, next_word, kc, vc, pk

        # while_loop instead of a fixed scan: stops as soon as every instance
        # has collected its hypotheses — typical captions finish in ~1/3 of
        # max_len steps, so the average decode does ~3x fewer forwards than
        # the reference's fixed token loop (Translator.py:148-157 exits via
        # the same all-done condition but recomputes full prefixes serially)
        def cond(carry):
            st, last, kc, vc, pk, t = carry
            return (t < max_len) & ~jnp.all(st.done)

        def body(carry):
            st, last, kc, vc, pk, t = carry
            st, last, kc, vc, pk = step(st, last, kc, vc, pk, t)
            return st, last, kc, vc, pk, t + 1

        if use_cache:
            # bf16 storage in the production dtype is LOSSLESS: the cached
            # step's dense() emits f32 casts of bf16 values (flax-Dense
            # replication), and attention re-casts to bf16 at use; the f32
            # test dtype keeps f32 so the NAVC_NO_KVCACHE A/B stays exact
            cdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
            if use_fused_attend:
                # flat 2-D caches: only the fused kernel ever touches them,
                # so the carry keeps its row-major layout end-to-end; the
                # pending ancestry permute rides the carry as pk0 (identity
                # at t=1: the caches are still all-zero)
                kc0 = jnp.zeros((b * k, max_len * cfg.dim_hidden), cdt)
                vc0 = jnp.zeros((b * k, max_len * cfg.dim_hidden), cdt)
            else:
                kc0 = jnp.zeros((b * k, max_len, nh, dh), cdt)
                vc0 = jnp.zeros((b * k, max_len, nh, dh), cdt)
            pk0 = jnp.zeros((b, k), jnp.int32)
        else:  # unused dummies keep one while_loop signature
            kc0 = jnp.zeros((), jnp.float32)
            vc0 = jnp.zeros((), jnp.float32)
            pk0 = jnp.zeros((), jnp.int32)
        last0 = jnp.full((b, k), C.BOS, jnp.int32)  # seqs[:, :, 0]
        state, _, _, _, _, _ = jax.lax.while_loop(
            cond, body, (state, last0, kc0, vc0, pk0, jnp.asarray(1)))

        # --- sort_finished (Beam.py:123-130) ------------------------------
        valid = jnp.arange(specific)[None, :] < state.fin_count[:, None]
        norm = state.fin_scores / jnp.power(
            jnp.maximum(state.fin_lens, 1).astype(jnp.float32), alpha)
        norm = jnp.where(valid, norm, -jnp.inf)
        if cfg.topk <= 1:
            best = jnp.argmax(norm, axis=1)  # (B,)
            best_seq = jnp.take_along_axis(
                state.fin_seqs, best[:, None, None], axis=1)[:, 0, :]
            best_score = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
            return best_seq[:, 1:], best_score  # drop BOS
        # n-best (reference collect_hypothesis_and_scores, Translator.py:83-91)
        top_scores, top_idx = jax.lax.top_k(norm, cfg.topk)
        top_seqs = jnp.take_along_axis(state.fin_seqs, top_idx[:, :, None], axis=1)
        return top_seqs[:, :, 1:], top_scores

    return jax.jit(generate) if jit else generate

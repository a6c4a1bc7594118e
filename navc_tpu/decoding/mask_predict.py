"""Non-autoregressive refinement decoding as a single on-device program.

Capability parity with reference decoding/algorithms.py (MaskPredict,
Left2Right, EasyFirst) and decoding/na_generate.py, re-designed TPU-first:

  * the whole decode — length beam, canvas, T refinement iterations, teacher
    rescoring, best-beam selection — is ONE jitted function with static
    shapes; the reference's host loop with per-iteration ``.item()`` syncs
    (algorithms.py:247, na_generate.py:37) becomes a ``lax.scan``;
  * per-row ``select_worst`` host loops (algorithms.py:206-215) become batched
    ordinal-rank masks (navc_tpu.ops.select);
  * the (batch x length-beam) product is a single leading dim, so one decoder
    forward per iteration covers every length candidate — this dimension
    shards over the device mesh for multi-chip serving.

Semantics preserved exactly (verified by NumPy-port parity tests):
  * CT first pass replaces <mask> with <vis>, predicts once, zeroes the probs
    of slots still predicted <mask> (algorithms.py:136-141);
  * with CT the loop runs one extra iteration whose first step re-masks
    exactly the still-<mask> set (algorithms.py:242, 250-254);
  * mask count decays as floor(len * (1 - t/T)) with a floor of 1
    (algorithms.py:255-257, 213);
  * teacher rescoring gates: ``masking_decision`` for intermediate steps,
    ``not no_candidate_decision`` for the final step (algorithms.py:175-204);
  * PAD slots keep prob 1.0 / token PAD (algorithms.py:154-155);
  * best length beam by sum(log p) / len**alpha (na_generate.py:66-77).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import Config
from ..ops.select import rank_mask_largest, rank_mask_smallest
from .length_beam import build_canvas, enlarge, predict_length_beam, select_best_length_beam


class NARContext(NamedTuple):
    """Everything the refinement loop needs per call."""
    enc_output: jnp.ndarray            # (B*lbs, T, H)
    category: Optional[jnp.ndarray]    # (B*lbs, 1) or None
    teacher_enc_output: Optional[jnp.ndarray]
    teacher_category: Optional[jnp.ndarray]
    dict_mapping: Optional[jnp.ndarray]  # (vocab,) student->teacher id map


def _pad_pos_table(table: jnp.ndarray, l: int) -> jnp.ndarray:
    """Position-embedding rows for an l-wide canvas; rows past the table end
    (the 8-aligned canvas tail, always PAD slots) are zeros."""
    if l <= table.shape[0]:
        return table[:l]
    return jnp.zeros((l, table.shape[1]), table.dtype).at[:table.shape[0]].set(table)


def _predict_fn(model, variables, ctx: NARContext,
                cfg: Optional[Config] = None,
                want_attentions: bool = False,
                canvas_len: Optional[int] = None,
                enc_unique: Optional[jnp.ndarray] = None) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """One NAR decoder forward -> (argmax ids, max probs).

    Reference generate_step_with_prob + generate_non_autoregressive
    (algorithms.py:7-15, 143-167) minus the pad overwrite (applied by caller).

    With ``cfg.use_pallas`` the vocab projection + softmax-argmax runs through
    the fused online-softmax Pallas kernel (navc_tpu.ops.vocab_fused), which
    never materializes the (N, V) logits in HBM — the dominant memory traffic
    of the refinement loop.

    ``want_attentions=True`` (the reference's attention-collection mode,
    na_generate.py:92-106) returns a third output ``(self_probs, cross_probs)``
    of layer-0 attention maps, each (N, n_head, L, L_k); it forces the plain
    XLA path since the fused kernels never materialize attention probabilities.
    """
    from ..ops.eligibility import fused_layer_eligible, fused_vocab_eligible
    use_pallas = (cfg is not None and fused_vocab_eligible(cfg)
                  and not want_attentions)

    if want_attentions:
        def predict(tokens: jnp.ndarray):
            logprobs, _, attns = model.apply(
                variables, tokens, ctx.enc_output, ctx.category, "NARFormer",
                True, True, method=lambda m, *a: m.decode_logprobs(*a))
            probs = jnp.exp(logprobs)
            ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            max_probs = jnp.max(probs, axis=-1)
            layer0 = attns[0]
            return ids, max_probs, (layer0[0], layer0[-1])
        return predict

    if use_pallas:
        from ..ops.vocab_fused import fused_project_argmax, projection_weights
        # checkpoint-loaded trees hold numpy leaves; traced indexing needs jnp
        w, w_bias = projection_weights(cfg, variables["params"])
        interpret = jax.default_backend() == "cpu"

        # the fully-fused decoder layer covers the decode hot-loop config:
        # 1 layer, no pos-attention, no attention LayerNorm (all defaults)
        fully_fused = fused_layer_eligible(cfg, causal=False)
        if fully_fused:
            from ..ops.fused_layer import (fused_nar_decoder_layer,
                                           layer_weights_from_params)
            layer_w = jax.tree_util.tree_map(
                jnp.asarray, layer_weights_from_params(
                    variables["params"]["decoder"]["layer_0"]))
            emb_p = variables["params"]["decoder"]["embedding"]
            # bf16 activations end to end: the raw word-embedding gather, the
            # static features, enc K/V rows, and the hidden handoff to the
            # vocab kernels all halve their HBM traffic; the kernels upcast
            # to f32 before LayerNorm/softmax, and the projection kernels
            # cast hidden to bf16 anyway so the bf16 handoff is bit-neutral
            word_table = jnp.asarray(
                emb_p["word_embeddings"]["embedding"]).astype(jnp.bfloat16)
            ln_scale = jnp.asarray(emb_p["LayerNorm"]["scale"])
            ln_bias = jnp.asarray(emb_p["LayerNorm"]["bias"])
            l = canvas_len or cfg.max_len
            n_rows = ctx.enc_output.shape[0]
            enc16 = ctx.enc_output.astype(jnp.bfloat16)
            # cross-attention K/V depend only on enc_output — identical for
            # every refinement iteration AND every length-beam row of a
            # video; project once per video (pre-enlarge rows when the
            # caller provides them) and tile the result
            from ..ops.fused_layer import hoist_cross_kv
            if enc_unique is not None:
                enc_kv = tuple(
                    enlarge(t, cfg.length_beam_size)
                    for t in hoist_cross_kv(enc_unique.astype(jnp.bfloat16),
                                            layer_w))
            else:
                enc_kv = hoist_cross_kv(enc16, layer_w)
            # iteration-invariant embedding parts: position (+category)
            # (+mean-pooled enc for enhance_input == 2) — hoisted out of the
            # refinement scan
            static = jnp.broadcast_to(
                _pad_pos_table(emb_p["position_embeddings"]["embedding"], l)[None],
                (n_rows, l, word_table.shape[1]))
            if cfg.with_category:
                # the flax path hard-asserts on a missing category
                # (models/layers.py); the fused path must not silently
                # embed without it
                if ctx.category is None:
                    raise ValueError(
                        "with_category model requires category ids")
                cat = jnp.asarray(emb_p["category_embeddings"]["embedding"])[
                    ctx.category.reshape(n_rows, -1)[:, 0]]
                static = static + cat[:, None, :]
            if cfg.enhance_input == 2:
                static = static + ctx.enc_output.mean(axis=1, keepdims=True)
            static = static.astype(jnp.bfloat16)

            def predict(tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
                raw = word_table[tokens]
                # tb=8 measured best for DENSE calls on v5e (120.1 vs
                # 116.0 TFLOP/s at tb=4); the qsub call keeps tb=4 (its K/V
                # footprint scales with tb, see its call site)
                hidden = fused_nar_decoder_layer(
                    raw, None, tokens == C.PAD, layer_w,
                    n_head=cfg.num_attention_heads, tb=8, interpret=interpret,
                    static=static, ln_scale=ln_scale, ln_bias=ln_bias,
                    ln_eps=cfg.layer_norm_eps, out_dtype=jnp.bfloat16,
                    enc_kv=enc_kv)
                n, l2, hdim = hidden.shape
                ids, maxp = fused_project_argmax(
                    hidden.reshape(n * l2, hdim), w, w_bias,
                    interpret=interpret)
                return ids.reshape(n, l2), maxp.reshape(n, l2)

            def predict_sub(masked: jnp.ndarray, sel: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
                """Sparse-query forward: sel (N, K, L) one-hot picks the
                re-masked positions (mask-predict discards every other
                slot's output, algorithms.py:260-265). Selection happens
                in-kernel via exact one-hot bf16 matmuls — every selected
                position is re-masked, so its raw embedding is the constant
                <mask> row. Bit-identical to ``predict``'s rows at those
                positions — see ops.fused_layer qsub notes."""
                from ..ops.fused_layer import fused_nar_decoder_layer_qsub
                # tb=4 measured best: larger tiles quadruple the K/V and
                # attention-score footprint per tile and lose more than the
                # extra Q rows gain (4742 vs 4511 captions/s at tb<=16)
                hidden_q = fused_nar_decoder_layer_qsub(
                    sel, word_table[C.MASK], word_table[masked], static,
                    None, masked == C.PAD, layer_w,
                    ln_scale, ln_bias, n_head=cfg.num_attention_heads, tb=4,
                    interpret=interpret, ln_eps=cfg.layer_norm_eps,
                    out_dtype=jnp.bfloat16, enc_kv=enc_kv)
                n, k, hdim = hidden_q.shape
                ids, maxp = fused_project_argmax(
                    hidden_q.reshape(n * k, hdim), w, w_bias,
                    interpret=interpret)
                return ids.reshape(n, k), maxp.reshape(n, k)

            from ..ops.eligibility import fused_sparse_eligible
            if fused_sparse_eligible(cfg):
                predict.predict_sub = predict_sub
            return predict

        def predict(tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
            hidden, _, _ = model.apply(
                variables, tokens, ctx.enc_output, ctx.category, "NARFormer",
                True, method=lambda m, *a: m.decode(*a))
            n, l, hdim = hidden.shape
            ids, maxp = fused_project_argmax(
                hidden.reshape(n * l, hdim), w, w_bias, interpret=interpret)
            return ids.reshape(n, l), maxp.reshape(n, l)
        return predict

    def predict(tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logprobs, _ = model.apply(
            variables, tokens, ctx.enc_output, ctx.category, "NARFormer", True,
            method=lambda m, *a: m.decode_logprobs(*a))
        probs = jnp.exp(logprobs)
        ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        max_probs = jnp.max(probs, axis=-1)
        return ids, max_probs
    return predict


def _teacher_score_fn(teacher_model, teacher_variables, ctx: NARContext,
                      cfg: Optional[Config] = None,
                      enc_unique: Optional[jnp.ndarray] = None):
    """AR teacher per-token probabilities (algorithms.py:175-204)."""
    from ..ops.eligibility import fused_teacher_eligible
    tcfg = teacher_model.cfg
    use_fused = cfg is not None and fused_teacher_eligible(cfg, tcfg)

    if use_fused:
        from ..ops.fused_layer import (fused_nar_decoder_layer,
                                       layer_weights_from_params)
        from ..ops.vocab_fused import fused_project_gather_prob, projection_weights
        layer_w = jax.tree_util.tree_map(
            jnp.asarray, layer_weights_from_params(
                teacher_variables["params"]["decoder"]["layer_0"]))
        w, w_bias = projection_weights(tcfg, teacher_variables["params"])
        emb_p = teacher_variables["params"]["decoder"]["embedding"]
        word_table = jnp.asarray(
            emb_p["word_embeddings"]["embedding"]).astype(jnp.bfloat16)
        from ..ops.fused_layer import hoist_cross_kv
        if enc_unique is not None and cfg is not None:
            tenc_kv = tuple(
                enlarge(t, cfg.length_beam_size)
                for t in hoist_cross_kv(enc_unique.astype(jnp.bfloat16),
                                        layer_w))
        else:
            tenc_kv = hoist_cross_kv(
                ctx.teacher_enc_output.astype(jnp.bfloat16), layer_w)
        interpret = jax.default_backend() == "cpu"

        def score(tokens: jnp.ndarray, pad_mask: jnp.ndarray) -> jnp.ndarray:
            t = tokens
            if ctx.dict_mapping is not None:
                t = ctx.dict_mapping[t]
            bos = jnp.full((t.shape[0], 1), C.BOS, t.dtype)
            inp = jnp.concatenate([bos, t], axis=1)[:, :-1]
            n, l = inp.shape
            static = jnp.broadcast_to(
                _pad_pos_table(emb_p["position_embeddings"]["embedding"], l)[None],
                (n, l, word_table.shape[1]))
            if tcfg.with_category:
                if ctx.teacher_category is None:
                    raise ValueError(
                        "with_category teacher requires category ids")
                cat = jnp.asarray(emb_p["category_embeddings"]["embedding"])[
                    ctx.teacher_category.reshape(n, -1)[:, 0]]
                static = static + cat[:, None, :]
            hidden = fused_nar_decoder_layer(
                word_table[inp], None, inp == C.PAD, layer_w,
                n_head=tcfg.num_attention_heads, tb=8, causal=True,
                interpret=interpret, static=static.astype(jnp.bfloat16),
                ln_scale=emb_p["LayerNorm"]["scale"],
                ln_bias=emb_p["LayerNorm"]["bias"],
                ln_eps=tcfg.layer_norm_eps, out_dtype=jnp.bfloat16,
                enc_kv=tenc_kv)
            probs = fused_project_gather_prob(
                hidden.reshape(n * l, hidden.shape[-1]), w, t.reshape(n * l),
                w_bias, interpret=interpret).reshape(n, l)
            return jnp.where(pad_mask, 1.0, probs)
        return score

    def score(tokens: jnp.ndarray, pad_mask: jnp.ndarray) -> jnp.ndarray:
        t = tokens
        if ctx.dict_mapping is not None:
            t = ctx.dict_mapping[t]
        bos = jnp.full((t.shape[0], 1), C.BOS, t.dtype)
        inp = jnp.concatenate([bos, t], axis=1)[:, :-1]
        # gather the logit + logsumexp instead of materializing the full
        # softmax: prob(y_t) = exp(logit[y_t] - logsumexp(logits))
        hidden, _, _ = teacher_model.apply(
            teacher_variables, inp, ctx.teacher_enc_output, ctx.teacher_category,
            "ARFormer", True, method=lambda m, *a: m.decode(*a))
        logits = teacher_model.apply(
            teacher_variables, hidden, method=lambda m, h: m.project(h))
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        gathered = jnp.take_along_axis(
            logits, t[..., None].astype(jnp.int32), axis=-1)[..., 0]
        probs = jnp.exp(gathered - lse)
        return jnp.where(pad_mask, 1.0, probs)
    return score


def _apply_pad(ids, probs, pad_mask):
    """tokens[pad]=PAD, probs[pad]=1.0 (algorithms.py:154-155)."""
    return jnp.where(pad_mask, C.PAD, ids), jnp.where(pad_mask, 1.0, probs)


# ---------------------------------------------------------------------------
# Algorithms. Each takes (predict, teacher_score|None, tokens, pad_mask,
# lengths, cfg) and returns (tokens, lprobs).
# ---------------------------------------------------------------------------


def _mask_predict(predict, teacher_score, tokens, pad_mask, lengths, cfg: Config,
                  collect: bool = False, collect_attentions: bool = False):
    """collect=True additionally returns the per-iteration (tokens, probs)
    stacks — the reference's collect_best_candidate_iterative_results
    (algorithms.py:55-75). collect_attentions=True also stacks the layer-0
    (self, cross) attention maps per iteration (reference collect_data,
    algorithms.py:55-72 + na_generate.py:92-106); requires a ``predict``
    built with ``want_attentions=True``."""
    use_ct = cfg.use_ct
    T = cfg.iterations + 1 if use_ct else cfg.iterations
    seq_lens = lengths.astype(jnp.float32)

    def call(toks):
        out = predict(toks)
        if collect_attentions:
            return out
        return out[0], out[1], None

    if use_ct:
        # coarse-grained templates (algorithms.py:136-141)
        vis_tokens = jnp.where(tokens == C.MASK, C.VIS, tokens)
        ids, probs, attns = call(vis_tokens)
        ids, probs = _apply_pad(ids, probs, pad_mask)
        probs = jnp.where(ids == C.MASK, 0.0, probs)
        tokens, token_probs = ids, probs
    else:
        ids, probs, attns = call(tokens)
        tokens, token_probs = _apply_pad(ids, probs, pad_mask)

    # shared step pieces — the dense scan and the sparse unrolled loop must
    # use ONE copy of the schedule/gating math so they cannot drift
    def select_worst_set(toks, probs, ratio):
        """Re-mask set for one refinement step (algorithms.py:255-257,
        teacher masking_decision gate algorithms.py:175-204)."""
        if teacher_score is not None and cfg.masking_decision:
            corresponding = teacher_score(toks, pad_mask)
        else:
            corresponding = jnp.ones_like(probs)
        num_mask = (seq_lens * ratio).astype(jnp.int32)
        return rank_mask_smallest(probs * corresponding,
                                  jnp.maximum(1, num_mask))

    def dense_substep(toks, probs, mask_ind):
        """Re-mask + full-width re-predict + merge (algorithms.py:258-265)."""
        masked = jnp.where(mask_ind, C.MASK, toks)
        new_ids, new_probs, new_attns = call(masked)
        new_ids, new_probs = _apply_pad(new_ids, new_probs, pad_mask)
        return (jnp.where(mask_ind, new_ids, masked),
                jnp.where(mask_ind, new_probs, probs), new_attns)

    def body(carry, xs):
        counter, ratio = xs
        tokens, token_probs = carry
        worst = select_worst_set(tokens, token_probs, ratio)
        if use_ct:
            # first loop step completes the CT canvas (algorithms.py:250-254)
            mask_ind = jnp.where(counter == 1, tokens == C.MASK, worst)
        else:
            mask_ind = worst
        tokens, token_probs, new_attns = dense_substep(
            tokens, token_probs, mask_ind)
        ys = None
        if collect:
            ys = (tokens, token_probs)
            if collect_attentions:
                ys = ys + new_attns
        return (tokens, token_probs), ys

    collected = None
    predict_sub = getattr(predict, "predict_sub", None)
    use_sparse = predict_sub is not None and not collect and T > 1

    if use_sparse:
        # Sparse-query refinement: iteration t re-predicts only its re-masked
        # slots (algorithms.py:260-265), so the decoder Q-side + vocab
        # projection run on k_t = floor(L * (1 - t/T)) positions instead of
        # L. Unrolled (T <= 6 is static) so every step gets its own static
        # query width. Numerics identical to the dense scan path (the qsub
        # kernel is row-bit-identical; schedule math unchanged).
        #
        # Selection/merge avoid take_along_axis/scatter entirely: lane-dim
        # gathers on (N, L) tensors cost multiple ms EACH on TPU (profiled),
        # so query slots map to canvas positions via a one-hot tensor built
        # from cumsum ranks, the kernel selects rows with exact one-hot
        # matmuls, and results merge back with exact multiply-sum reductions
        # (one nonzero term per sum; token ids < 2^24 are exact in f32).
        import numpy as _np
        L = tokens.shape[1]
        for c in range(1, T):
            ratio = jnp.float32(1.0 - c / T)  # f64 host -> f32 cast, as scan
            if use_ct and c == 1:
                # CT completion re-masks every still-<mask> slot — up to the
                # full length, so this step stays dense (algorithms.py:250-254)
                tokens, token_probs, _ = dense_substep(
                    tokens, token_probs, tokens == C.MASK)
                continue
            mask_ind = select_worst_set(tokens, token_probs, ratio)
            masked = jnp.where(mask_ind, C.MASK, tokens)
            # static per-step query bound: num_mask <= int(f32(L) * f32(ratio)),
            # rounded up to 8 so the qsub kernel's q-padding is a no-op.
            # MUST use the same f32 arithmetic as the device num_mask above
            # (f32 rounding can land one above the f64 floor at exact-integer
            # boundaries, e.g. f32(45)*f32(0.2) = 9.0 vs floor64 8 — a bound
            # computed in f64 would strand the 9th re-masked slot as a literal
            # <mask> in the output); f32 multiply is monotone in L, so the
            # bound at canvas width L covers every row length <= L.
            k_f32 = int(_np.float32(L) * _np.float32(1.0 - c / T))
            k_bound = min(L, -(-max(1, k_f32) // 8) * 8)
            # query slot q = the q-th re-masked position in canvas order
            # (the stable masked-first ordering); all-zero rows mark unused
            # query slots
            ranks = jnp.cumsum(mask_ind.astype(jnp.int32), axis=1) - 1
            sel = ((ranks[:, None, :] ==
                    jnp.arange(k_bound, dtype=jnp.int32)[None, :, None])
                   & mask_ind[:, None, :])
            ids_q, probs_q = predict_sub(masked, sel)
            sel_f = sel.astype(jnp.float32)
            cov = sel.any(axis=1)
            ids_full = (sel_f * ids_q.astype(jnp.float32)[:, :, None]).sum(axis=1)
            probs_full = (sel_f * probs_q[:, :, None]).sum(axis=1)
            tokens = jnp.where(cov, ids_full.astype(jnp.int32), masked)
            token_probs = jnp.where(cov, probs_full, token_probs)
            # pad slots keep PAD / prob 1.0 (dense path's _apply_pad)
            tokens = jnp.where(pad_mask, C.PAD, tokens)
            token_probs = jnp.where(pad_mask, 1.0, token_probs)
    elif T > 1:
        # Mask-ratio schedule computed in float64 on the host then cast to
        # float32, matching torch's python-float -> f32-tensor promotion
        # (algorithms.py:255-256); computing 1 - t/T in f32 on-device flips
        # floor() at exact-integer boundaries.
        counters = jnp.arange(1, T)
        ratios = jnp.asarray(
            [1.0 - c / T for c in range(1, T)], jnp.float32)
        init = (tokens, token_probs)
        init_ys = (tokens, token_probs) + (attns if collect_attentions else ())
        (tokens, token_probs), ys = jax.lax.scan(
            body, init, (counters, ratios))
        if collect:
            # prepend the iteration-0 state: (T, N, ...) stacks
            collected = tuple(
                jnp.concatenate([i0[None], y], axis=0)
                for i0, y in zip(init_ys, ys))
    elif collect:
        collected = (tokens[None], token_probs[None])
        if collect_attentions:
            collected = collected + tuple(a[None] for a in attns)

    if teacher_score is not None and not cfg.no_candidate_decision:
        corresponding = teacher_score(tokens, pad_mask)
    else:
        corresponding = jnp.ones_like(token_probs)
    lprobs = jnp.log(token_probs * corresponding)
    if collect:
        return tokens, lprobs, collected
    return tokens, lprobs


def _refinement_tail(predict, tokens, token_probs, pad_mask, seq_lens,
                     cfg: Config, visual_mask):
    """Shared L2R/EF refinement rounds (algorithms.py:326-339, 400-413)."""
    T = cfg.q_iterations
    for i in range(T):
        if i == 0 and cfg.use_ct:
            mask_ind = visual_mask
        else:
            ratio = 0.4 * (1.0 - i / T)
            num_mask = (seq_lens * ratio).astype(jnp.int32)
            mask_ind = rank_mask_smallest(token_probs, jnp.maximum(1, num_mask))
        masked = jnp.where(mask_ind, C.MASK, tokens)
        new_ids, new_probs = predict(masked)
        new_ids, new_probs = _apply_pad(new_ids, new_probs, pad_mask)
        tokens = jnp.where(mask_ind, new_ids, masked)
        token_probs = jnp.where(mask_ind, new_probs, token_probs)
    return tokens, token_probs


def _ct_or_blank(predict, tokens, pad_mask, cfg: Config):
    """Shared L2R/EF initialization (algorithms.py:288-293, 360-365)."""
    if cfg.use_ct:
        vis_tokens = jnp.where(tokens == C.MASK, C.VIS, tokens)
        ids, probs = predict(vis_tokens)
        ids, probs = _apply_pad(ids, probs, pad_mask)
        probs = jnp.where(ids == C.MASK, 0.0, probs)
        visual_mask = (ids != C.MASK) & (ids != C.PAD)
        return ids, probs, visual_mask
    token_probs = jnp.where(pad_mask, 1.0, 0.0)
    return tokens, token_probs, None


def _left2right(predict, teacher_score, tokens, pad_mask, lengths, cfg: Config):
    """Reveal q leftmost masks per step, then refine (algorithms.py:275-344)."""
    seq_lens = lengths.astype(jnp.float32)
    max_len = tokens.shape[1]
    tokens, token_probs, visual_mask = _ct_or_blank(predict, tokens, pad_mask, cfg)

    # The initial masked set, in left-to-right ordinal order. The reference
    # enumerates masked positions below seq_len once before the loop
    # (algorithms.py:297-311); PAD tails are never MASK so the seq_len bound
    # is implied.
    init_mask = tokens == C.MASK
    ordinal = jnp.cumsum(init_mask.astype(jnp.int32), axis=1) - 1  # rank among masks

    n_steps = -(-max_len // cfg.q)  # ceil; extra steps are no-ops

    def body(carry, step):
        tokens, token_probs = carry
        current = step * cfg.q
        sel = init_mask & (ordinal >= current) & (ordinal < current + cfg.q)

        def do_round(tokens, token_probs):
            masked = jnp.where(sel, C.MASK, tokens)
            new_ids, new_probs = predict(masked)
            new_ids, new_probs = _apply_pad(new_ids, new_probs, pad_mask)
            return (jnp.where(sel, new_ids, masked),
                    jnp.where(sel, new_probs, token_probs))

        # the reference stops as soon as the masked set is exhausted
        # (algorithms.py:313-315); an empty selection round would keep the
        # canvas unchanged, so skipping its forward is numerics-identical
        tokens, token_probs = jax.lax.cond(
            jnp.any(sel), do_round, lambda t, p: (t, p), tokens, token_probs)
        return (tokens, token_probs), None

    (tokens, token_probs), _ = jax.lax.scan(
        body, (tokens, token_probs), jnp.arange(n_steps))

    tokens, token_probs = _refinement_tail(
        predict, tokens, token_probs, pad_mask, seq_lens, cfg, visual_mask)

    if teacher_score is not None and not cfg.no_candidate_decision:
        corresponding = teacher_score(tokens, pad_mask)
    else:
        corresponding = jnp.ones_like(token_probs)
    return tokens, jnp.log(token_probs * corresponding)


def _easy_first(predict, teacher_score, tokens, pad_mask, lengths, cfg: Config):
    """Reveal the q most-confident masks per round (algorithms.py:347-417)."""
    seq_lens = lengths.astype(jnp.float32)
    max_len = tokens.shape[1]
    tokens, token_probs, visual_mask = _ct_or_blank(predict, tokens, pad_mask, cfg)

    # The reference reveal loop runs until every mask is resolved OR the
    # batch-global remaining count stops decreasing (the dead-loop guard,
    # algorithms.py:382-389) — when the model argmax-predicts <mask> into a
    # revealed slot the round count can exceed ceil(max_len/q), so a fixed
    # scan would truncate; a while_loop with the same global stall guard
    # reproduces the exact termination.
    def cond(carry):
        tokens, _, pre = carry
        remain = (tokens == C.MASK).sum()
        return (remain > 0) & (remain != pre)

    def body(carry):
        tokens, token_probs, _ = carry
        mask_ind = tokens == C.MASK
        remain = mask_ind.sum(-1)
        new_ids, new_probs = predict(tokens)
        new_ids, new_probs = _apply_pad(new_ids, new_probs, pad_mask)
        confid = jnp.where(mask_ind, new_probs, 0.0)
        k = jnp.minimum(cfg.q, remain)
        best = rank_mask_largest(confid, k)
        return (jnp.where(best, new_ids, tokens),
                jnp.where(best, new_probs, token_probs),
                remain.sum())

    tokens, token_probs, _ = jax.lax.while_loop(
        cond, body, (tokens, token_probs, jnp.asarray(0, jnp.int32)))

    tokens, token_probs = _refinement_tail(
        predict, tokens, token_probs, pad_mask, seq_lens, cfg, visual_mask)

    if teacher_score is not None and not cfg.no_candidate_decision:
        corresponding = teacher_score(tokens, pad_mask)
    else:
        corresponding = jnp.ones_like(token_probs)
    return tokens, jnp.log(token_probs * corresponding)


ALGORITHMS = {"mp": _mask_predict, "l2r": _left2right, "ef": _easy_first}


# ---------------------------------------------------------------------------
# Public factory
# ---------------------------------------------------------------------------


def make_nar_generator(cfg: Config, model, teacher_model=None,
                       jit: bool = True, collect: bool = False,
                       collect_attentions: bool = False):
    """Build the full NAR decode function (reference na_generate.py:14-113).

    Returns fn(variables, enc_results, category,
               teacher_variables=None, teacher_enc_results=None,
               dict_mapping=None) -> hypotheses (B, max_len) int32, or with
    ``collect=True`` (mask-predict only) -> (hypotheses,
    (iter_tokens (B, T, max_len), iter_probs (B, T, max_len))) for the best
    length beam — the reference's candidate-collection mode
    (na_generate.py:80-90). ``collect_attentions=True`` (implies collect)
    appends per-iteration layer-0 attention maps
    (self_attn, cross_attn), each (B, T, n_head, max_len, len_k) at the best
    length beam — the reference's output_attentions mode
    (na_generate.py:92-106).
    ``enc_results`` must carry 'enc_output' and 'pred_length'.
    """
    if cfg.paradigm not in ALGORITHMS:
        raise ValueError("paradigm must be one of %s" % list(ALGORITHMS))
    collect = collect or collect_attentions
    if collect and cfg.paradigm != "mp":
        raise NotImplementedError("iterative collection is mask-predict only")
    algorithm = ALGORITHMS[cfg.paradigm]
    lbs = cfg.length_beam_size
    use_teacher = teacher_model is not None and (
        cfg.masking_decision or not cfg.no_candidate_decision)

    def generate(variables, enc_results: Dict[str, jnp.ndarray],
                 category: Optional[jnp.ndarray] = None,
                 teacher_variables=None,
                 teacher_enc_results: Optional[Dict[str, jnp.ndarray]] = None,
                 dict_mapping: Optional[jnp.ndarray] = None):
        pred_length = enc_results["pred_length"]
        bsz = pred_length.shape[0]
        beam = predict_length_beam(pred_length, lbs, cfg.length_bias, cfg.max_len)
        # When every forward is fused, run the whole refinement on an
        # 8-aligned canvas: the kernels' per-call padding copies become
        # no-ops (the extra columns are ordinary PAD slots — prob 1.0,
        # log-prob 0 — so select-worst and beam scoring are unchanged).
        from ..ops.eligibility import fused_decode_eligible
        aligned = (not collect_attentions and fused_decode_eligible(
            cfg, teacher_model.cfg if (use_teacher and teacher_model is not None)
            else None))
        run_len = -(-cfg.max_len // 8) * 8 if aligned else cfg.max_len
        tokens, pad_mask, lengths = build_canvas(beam, run_len)

        ctx = NARContext(
            enc_output=enlarge(enc_results["enc_output"], lbs),
            category=None if category is None else enlarge(category, lbs),
            teacher_enc_output=(
                enlarge(teacher_enc_results["enc_output"], lbs)
                if use_teacher and teacher_enc_results is not None else None),
            teacher_category=None if category is None else enlarge(category, lbs),
            dict_mapping=dict_mapping,
        )
        predict = _predict_fn(model, variables, ctx, cfg,
                              want_attentions=collect_attentions,
                              canvas_len=run_len,
                              enc_unique=enc_results["enc_output"])
        teacher_score = None
        if use_teacher and teacher_variables is not None and ctx.teacher_enc_output is not None:
            teacher_score = _teacher_score_fn(
                teacher_model, teacher_variables, ctx, cfg,
                enc_unique=teacher_enc_results["enc_output"])

        if collect:
            hyp, lprobs, collected = algorithm(
                predict, teacher_score, tokens, pad_mask, lengths, cfg,
                collect=True, collect_attentions=collect_attentions)
        else:
            hyp, lprobs = algorithm(predict, teacher_score, tokens, pad_mask,
                                    lengths, cfg)
        best, best_idx = select_best_length_beam(
            hyp, lprobs, lengths, bsz, lbs, cfg.beam_alpha)
        best = best[:, :cfg.max_len]  # drop the aligned-canvas PAD tail
        if not collect:
            return best

        # gather each iteration's stacks at the winning length beam
        # (reference na_generate.py:80-106) — same best_idx as the returned
        # hypotheses by construction

        def gather_best(arr):
            # (T, B*lbs, *rest) -> (B, T, *rest) at the best length beam
            t = arr.shape[0]
            rest = arr.shape[2:]
            a = arr.reshape((t, bsz, lbs) + rest)
            a = jnp.moveaxis(a, 1, 0)  # (B, T, lbs, *rest)
            sel = best_idx.reshape((bsz,) + (1,) * (a.ndim - 1))
            return jnp.take_along_axis(a, sel, axis=2)[:, :, 0]

        toks = gather_best(collected[0])[..., :cfg.max_len]
        probs = gather_best(collected[1])[..., :cfg.max_len]
        if collect_attentions:
            attns = [gather_best(a) for a in collected[2:]]
            return best, (toks, probs), attns
        return best, (toks, probs)

    return jax.jit(generate) if jit else generate

"""Single source of truth for Pallas fused-path eligibility.

The fully-fused single-layer decoder kernel (navc_tpu.ops.fused_layer) and the
fused vocab-projection kernels (navc_tpu.ops.vocab_fused) only cover the
reference's default decode configuration (1 decoder layer, no pos-attention,
no attention LayerNorm, gelu_new — reference opts.py:24,33-36 defaults).
Callers in decoding/mask_predict.py and decoding/beam.py must all use these
predicates so the guards cannot drift apart.
"""

from __future__ import annotations

from ..config import Config


def fused_layer_eligible(cfg: Config, causal: bool) -> bool:
    """Can the fully-fused decoder-layer kernel replace ``BertDecoder``?

    Args:
        cfg: the *model being fused* (student or teacher) config.
        causal: True for AR forwards (beam search, teacher rescoring) — the
            kernel only implements the plain causal mask, so the reference's
            ``watch`` window (Decoder.py:23-39) must be off; False for NAR
            forwards, where the kernel implements enhance_input 0/2 but not
            the per-row resampling gather (enhance_input == 1, Decoder.py:41-54).
    """
    ok = (cfg.use_pallas
          and cfg.num_hidden_layers_decoder == 1
          and not cfg.pos_attention
          and not cfg.with_layernorm
          and not cfg.use_sigmoid_to_get_attprob
          and cfg.hidden_act == "gelu_new")
    if causal:
        return ok and cfg.watch == 0
    return ok and cfg.enhance_input in (0, 2)


def kv_cached_beam_eligible(cfg: Config) -> bool:
    """Can AR beam search use the incremental KV-cached decode step?

    Pure-XLA fast path (no Pallas requirement) covering the same structural
    configuration as the fused causal layer: 1 decoder layer, no
    pos-attention, no attention LayerNorm, gelu_new, no sigmoid attention,
    watch == 0. ``NAVC_NO_KVCACHE`` env disables it (A/B kill-switch).
    """
    import os
    return (cfg.num_hidden_layers_decoder == 1
            and not cfg.pos_attention
            and not cfg.with_layernorm
            and not cfg.use_sigmoid_to_get_attprob
            and cfg.hidden_act == "gelu_new"
            and cfg.watch == 0
            and not os.environ.get("NAVC_NO_KVCACHE"))


def fused_teacher_eligible(cfg: Config, teacher_cfg: Config) -> bool:
    """Can the AR teacher rescoring forward use the fused causal layer +
    gather-prob projection? (student cfg carries the use_pallas switch)"""
    t = teacher_cfg.replace(use_pallas=True)
    return (cfg.use_pallas
            and fused_layer_eligible(t, causal=True)
            and fused_vocab_eligible(t))


def fused_decode_eligible(cfg: Config, teacher_cfg: Config = None) -> bool:
    """Does the ENTIRE NAR decode run through fused kernels (student forward,
    and teacher rescoring when a teacher participates)? Only then may the
    generator run on an 8-aligned canvas — the XLA fallback paths index the
    position table at canvas width and would read out of bounds."""
    ok = fused_layer_eligible(cfg, causal=False) and fused_vocab_eligible(cfg)
    if teacher_cfg is not None:
        ok = ok and fused_teacher_eligible(cfg, teacher_cfg)
    return ok


def fused_sparse_eligible(cfg: Config) -> bool:
    """Can mask-predict use the sparse-query refinement path?

    Requires the fully-fused NAR layer + fused projection (the sparse path is
    built from their Q-subset variants) and the 'mp' paradigm whose mask
    counts shrink per iteration (algorithms.py:255-257) — l2r/ef reveal
    positions instead, so their canvases do not shrink the same way.
    """
    import os
    return (fused_layer_eligible(cfg, causal=False)
            and fused_vocab_eligible(cfg)
            and cfg.paradigm == "mp"
            and not os.environ.get("NAVC_DENSE_REFINE"))  # A/B kill-switch


def fused_train_eligible(cfg: Config) -> bool:
    """Can the training step run the custom-VJP fused layer
    (ops/fused_layer_train) instead of the flax BertLayer?

    Structural requirements mirror the decode kernel (1 layer, no
    pos-attention, no attention LayerNorm, gelu_new, no sigmoid knob), plus:
    attention-probs dropout must be 0.0 (the reference default, opts.py —
    the kernel implements the four hidden-dropout sites only), and the
    decoding type must be NARFormer or ARFormer (SelfMask's shifted-MLM
    masking is not implemented in-kernel). Unlike the decode predicate there
    is no enhance_input restriction: the embedding stage (which consumes
    enhance features) stays in flax via Seq2Seq.nar_embed.
    ``NAVC_NO_FUSED_TRAIN`` env disables it (A/B kill-switch).
    """
    import os
    ok = (cfg.use_pallas
          and cfg.num_hidden_layers_decoder == 1
          and not cfg.pos_attention
          and not cfg.with_layernorm
          and not cfg.use_sigmoid_to_get_attprob
          and cfg.hidden_act == "gelu_new"
          and cfg.attention_probs_dropout_prob == 0.0
          and not os.environ.get("NAVC_NO_FUSED_TRAIN"))
    if cfg.decoding_type == "ARFormer":
        return ok and cfg.watch == 0
    return ok and cfg.decoding_type == "NARFormer"


def fused_vocab_eligible(cfg: Config) -> bool:
    """Can the fused projection(+argmax/gather) kernels be used?

    Both projection variants are supported: the untied bias-free
    tgt_word_prj kernel, and the tied path (transposed embedding table plus
    the standalone bias, seq2seq.py:124-125 here) via the kernels' bias
    operand — see ops.vocab_fused.projection_weights.
    """
    return cfg.use_pallas


def fused_vocab_ce_eligible(cfg: Config) -> bool:
    """Can the train step fuse the vocab projection + cross-entropy
    (ops/vocab_ce) instead of materializing (B, L, V) logits for
    runtime.crit?

    The kernel is whole-V W-resident (W (D, V) bf16 + its transpose + the
    f32 wgrad accumulator all live in VMEM through the backward), so gate on
    the caption-vocab scale the framework targets: the backward's resident
    set — W + W^T bf16 + dW f32 (8 bytes per (D, V_pad) element) plus the
    tn=256-row score-tile working set (scores/softmax f32, ds bf16, slack
    ≈ 16 bytes per (tn, V_pad) element) — must fit v5e VMEM (128 MB; the
    flagship D=512, V=10048 shape sits at ~83 MB and runs on device, see
    scripts/kernel_device_parity.py::check_vocab_ce).
    ``NAVC_NO_FUSED_CE`` env disables it (A/B kill-switch).
    """
    import os
    v_pad = (cfg.vocab_size + 127) // 128 * 128
    resident = cfg.dim_hidden * v_pad * 8 + 256 * v_pad * 16
    return (cfg.use_pallas
            and resident <= 112 * 1024 * 1024
            and not os.environ.get("NAVC_NO_FUSED_CE"))

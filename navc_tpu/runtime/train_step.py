"""The jitted training step.

TPU-first re-design of the reference hot loop (misc/run.py:249-269): one
``jax.jit``-compiled function per configuration covering forward, loss,
backward, gradient clip, optimizer update, and BatchNorm running-stat update —
no host work between batches beyond feeding the next one.

Multi-chip: the step is sharding-agnostic. Under a ``Mesh`` with batch inputs
sharded over the 'data' axis and replicated params, jit inserts the gradient
all-reduce automatically (see navc_tpu.parallel.mesh for the shardings).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import Seq2Seq
from .crit import compute_losses
from .optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(cfg: Config, model: Seq2Seq, variables: Dict) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg)

    # the train step DONATES its TrainState buffers (in-place reuse instead
    # of double-buffering params+moments in HBM); copy the caller's leaves
    # into the state so their `variables` tree stays valid after step 1.
    # Multi-device (sharded/global) leaves are passed through — a generic
    # copy would gather them, and those callers construct fresh trees anyway.
    def _own(x):
        if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1:
            return x
        return jnp.array(x)

    params = jax.tree_util.tree_map(_own, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        _own, variables.get("batch_stats", {}))
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    ), tx


def _fused_train_apply(cfg: Config, model: Seq2Seq, variables, feats, tgt,
                       category, dropout_rng, mutable, label_sets=None):
    """Training forward through the custom-VJP fused layer.

    Same results contract as the flax ``model(...)`` call, but the decoder
    layer (the profiled hot 50% of the step) runs as the Pallas
    fused-training kernel (ops/fused_layer_train): embeddings and encoder
    stay in flax (dropout rngs threaded per pass), the layer runs in-kernel
    with hash-RNG dropout, and the vocab projection either fuses with the
    cross-entropy (ops/vocab_ce: per-row label log-prob + argmax, logits
    never in HBM — results carry 'tgt_word_rowstats') or stays in XLA
    (results carry 'tgt_word_logits'). Gradients flow into the same param
    tree via the kernels' hand-written backwards.
    """
    import jax.numpy as jnp

    from .. import constants as C
    from ..ops.eligibility import fused_vocab_ce_eligible
    from ..ops.fused_layer import layer_weights_from_params
    from ..ops.fused_layer_train import fused_bert_layer_train
    from ..ops.vocab_ce import vocab_ce_train
    from ..ops.vocab_fused import projection_weights

    # 3-way split keeps the historical RNG stream layout (PARITY_TRAINING
    # artifacts); rng_emb is deliberately unused — embedding dropout is
    # folded into the fused kernel's p_input stream (rng_seed), NOT applied
    # twice, so do not thread rng_emb into the embed call
    rng_enc, rng_emb, rng_seed = jax.random.split(dropout_rng, 3)
    kwargs: Dict[str, Any] = {"rngs": {"dropout": rng_enc}}
    if mutable:
        kwargs["mutable"] = ["batch_stats"]
    out = model.apply(variables, feats,
                      method=lambda m, f: m.encode(f, deterministic=False),
                      **kwargs)
    if mutable:
        results, updates = out
        new_batch_stats = updates.get("batch_stats", {})
    else:
        results, new_batch_stats = out, None
    enc_output = results["enc_output"]

    token_sets = list(tgt) if isinstance(tgt, (list, tuple)) else [tgt]
    causal = cfg.decoding_type == "ARFormer"
    weights = layer_weights_from_params(
        variables["params"]["decoder"]["layer_0"])
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    interpret = jax.default_backend() == "cpu"
    use_ce = label_sets is not None and fused_vocab_ce_eligible(cfg)
    if use_ce:
        w_prj, b_prj = projection_weights(cfg, variables["params"])

    logit_sets = []
    rowstat_sets = []
    for i, tokens in enumerate(token_sets):
        inp = tokens[:, :-1] if causal else tokens
        # the embedding's LN-output dropout is folded into the kernel input
        # (p_input) — a (B, L, H) threefry mask in XLA cost ~3.3 ms/pass —
        # so the flax embedding runs deterministic here
        if causal:
            emb = model.apply(
                variables, inp, category,
                method=lambda m, t, c: m.ar_embed(t, c))
        else:
            emb = model.apply(
                variables, inp, enc_output, category,
                method=lambda m, t, e, c: m.nar_embed(t, e, c))
        seed = jax.random.randint(
            jax.random.fold_in(rng_seed, i), (1,), 0,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        hidden = fused_bert_layer_train(
            emb, enc_output, inp == C.PAD, weights, seed,
            n_head=cfg.num_attention_heads, tb=8, causal=causal,
            p_hidden=cfg.hidden_dropout_prob,
            p_input=cfg.hidden_dropout_prob, compute_dtype=cdt,
            out_dtype=cdt, interpret=interpret)
        if use_ce:
            rowstat_sets.append(vocab_ce_train(
                hidden, w_prj, b_prj, label_sets[i],
                compute_dtype=cdt, interpret=interpret))
        else:
            logit_sets.append(model.apply(
                variables, hidden, method=lambda m, h: m.project(h, raw=True)))
    if use_ce:
        results["tgt_word_rowstats"] = rowstat_sets
    else:
        results["tgt_word_logits"] = logit_sets
    return results, new_batch_stats


def _forward_results(cfg: Config, model: Seq2Seq, variables, batch: Dict,
                     deterministic: bool, dropout_rng=None, mutable=False):
    """Model forward + target wiring (reference misc/run.py:40-86)."""
    from ..ops.eligibility import fused_train_eligible

    feats = [batch["feats_%s" % ch] for ch in cfg.modality.lower()]
    if cfg.visual_word_generation:
        tgt: Any = (batch["tokens_1"], batch["tokens"])
    else:
        tgt = batch["tokens"]
    category = batch.get("category")

    # start index: NAR targets align with inputs, AR targets shift by one
    # (reference misc/run.py:70-82)
    start = 0 if cfg.decoding_type == "NARFormer" else 1
    if cfg.visual_word_generation:
        label_sets = [batch["labels_1"][:, start:], batch["labels"][:, start:]]
    else:
        label_sets = [batch["labels"][:, start:]]

    if (not deterministic and dropout_rng is not None
            and fused_train_eligible(cfg)):
        results, new_batch_stats = _fused_train_apply(
            cfg, model, variables, feats, tgt, category, dropout_rng, mutable,
            label_sets=label_sets)
    else:
        kwargs: Dict[str, Any] = {}
        if dropout_rng is not None:
            kwargs["rngs"] = {"dropout": dropout_rng}
        if mutable:
            kwargs["mutable"] = ["batch_stats"]

        # raw logits: the loss normalizes only at label positions
        # (runtime.crit), skipping the (B, L, V) log-softmax
        # materialization — float-identical
        out = model.apply(variables, feats, tgt, category,
                          deterministic=deterministic, return_logits=True,
                          **kwargs)
        if mutable:
            results, updates = out
            new_batch_stats = updates.get("batch_stats", {})
        else:
            results, new_batch_stats = out, None

    results["tgt_word_labels"] = (
        label_sets if cfg.visual_word_generation else label_sets[0])
    if cfg.decoding_type == "NARFormer":
        results["tgt_length"] = batch["length_target"]
    return results, new_batch_stats


def make_train_step(cfg: Config, model: Seq2Seq, tx: optax.GradientTransformation):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""

    def forward(params, batch_stats, batch, dropout_rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return _forward_results(
            cfg, model, variables, batch, deterministic=False,
            dropout_rng=dropout_rng, mutable=bool(batch_stats))

    if cfg.remat:
        # trade recompute for activation memory (jax.checkpoint); useful for
        # deep decoder stacks / long feature streams
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, batch, dropout_rng):
        results, new_batch_stats = forward(params, batch_stats, batch, dropout_rng)
        loss, metrics = compute_losses(cfg, results, batch.get("valid_mask"))
        return loss, (metrics, new_batch_stats)

    # donate the incoming state: the caller rebinds it every step, so the
    # old params/opt-state buffers can be reused in place instead of
    # double-buffering ~2x (params + Adam moments) in HBM
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict, dropout_rng) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_batch_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, dropout_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else state.batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_eval_loss_step(cfg: Config, model: Seq2Seq):
    """Forward-only loss computation for validation curves."""

    @jax.jit
    def eval_step(params, batch_stats, batch) -> Dict:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        results, _ = _forward_results(cfg, model, variables, batch, deterministic=True)
        _, metrics = compute_losses(cfg, results, batch.get("valid_mask"))
        return metrics

    return eval_step


def make_encode_fn(cfg: Config, model: Seq2Seq):
    """Jitted encode-only forward for decoding (reference run.py:59 only_data)."""

    @jax.jit
    def encode(params, batch_stats, feats):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, feats,
                           method=lambda m, f: m.encode(f, deterministic=True))

    return encode

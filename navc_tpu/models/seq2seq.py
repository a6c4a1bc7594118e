"""Seq2Seq façade: encode -> fuse -> (length head) -> decode -> project.

Capability parity with reference models/seq2seq.py and the factory in
models/__init__.py:64-94:
  * ``encode``: per-modality encoder -> fusion -> auxiliary heads
    (seq2seq.py:35-63),
  * ``__call__``: training forward dispatching on decoding_type; ARFormer
    shifts inputs ``[:, :-1]`` (seq2seq.py:110-140), NARFormer feeds the
    masked canvas directly (seq2seq.py:86-108),
  * visual-word generation runs the shared decoder twice on
    ``[tokens_1, tokens]`` (reference BertDecoderDisentangled,
    Decoder.py:201-215),
  * vocab projection is bias-free (models/__init__.py:83) unless weights are
    tied, which adds a trainable zero-init bias (seq2seq.py:30-33),
  * outputs are log-softmaxed word log-probs (seq2seq.py:102-103).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .decoder import BertDecoder
from .encoder import MultiStreamEncoder
from .fusion import Fusion
from .layers import Dense
from .predictor import AUXILIARY_PREDICTORS


class Seq2Seq(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        self.encoder = MultiStreamEncoder(
            modality=cfg.modality,
            dim_hidden=cfg.dim_hidden,
            encoder_dropout=cfg.encoder_dropout,
            name="encoder",
        )
        self.fusion = Fusion(
            fusion=cfg.fusion,
            norm_type=cfg.norm_type,
            no_encoder_bn=cfg.no_encoder_bn,
            num_streams=len(cfg.modality),
            dim_hidden=cfg.dim_hidden,
            name="fusion",
        )
        aux = []
        for crit_name in cfg.crit:
            head_cls = AUXILIARY_PREDICTORS.get(crit_name)
            if head_cls is not None:
                aux.append(head_cls(
                    dim_hidden=cfg.dim_hidden,
                    max_len=cfg.max_len,
                    hidden_dropout_prob=cfg.hidden_dropout_prob,
                    name="predictor_%s" % crit_name,
                ))
        self.auxiliary_heads = aux
        self.decoder = BertDecoder(
            vocab_size=cfg.vocab_size,
            dim_hidden=cfg.dim_hidden,
            max_len=cfg.max_len,
            num_hidden_layers=cfg.num_hidden_layers_decoder,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act=cfg.hidden_act,
            hidden_dropout_prob=cfg.hidden_dropout_prob,
            attention_probs_dropout_prob=cfg.attention_probs_dropout_prob,
            layer_norm_eps=cfg.layer_norm_eps,
            with_layernorm=cfg.with_layernorm,
            with_category=cfg.with_category,
            num_category=cfg.num_category,
            pos_attention=cfg.pos_attention,
            enhance_input=cfg.enhance_input,
            watch=cfg.watch,
            decoding_type=cfg.decoding_type,
            use_sigmoid_to_get_attprob=cfg.use_sigmoid_to_get_attprob,
            parallel_mlm=cfg.parallel_mlm,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            name="decoder",
        )
        if not cfg.tie_weights:
            self.tgt_word_prj = Dense(
                cfg.vocab_size, use_bias=False,
                dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
                name="tgt_word_prj")
        else:
            self.tie_bias = self.param(
                "tgt_word_prj_bias", nn.initializers.zeros, (cfg.vocab_size,))

    # ------------------------------------------------------------------
    def encode(self, feats: Sequence[jnp.ndarray], deterministic: bool = True,
               use_running_average: Optional[bool] = None) -> Dict[str, Any]:
        """Reference seq2seq.py:35-63 (minus unused preEncoder/auto-mask)."""
        if use_running_average is None:
            use_running_average = deterministic
        enc_outputs, enc_hiddens = self.encoder(list(feats), deterministic=deterministic)
        enc_output, enc_hidden = self.fusion(
            enc_outputs, enc_hiddens, use_running_average=use_running_average)
        results: Dict[str, Any] = {"enc_output": enc_output, "enc_hidden": enc_hidden}
        for head in self.auxiliary_heads:
            results.update(head(enc_output, deterministic=deterministic))
        return results

    def decode(self, tgt_seq: jnp.ndarray, enc_output: jnp.ndarray,
               category: Optional[jnp.ndarray] = None,
               decoding_type: Optional[str] = None,
               deterministic: bool = True, output_attentions: bool = False):
        return self.decoder(
            tgt_seq, enc_output, category=category, decoding_type=decoding_type,
            deterministic=deterministic, output_attentions=output_attentions)

    def project(self, hidden: jnp.ndarray, raw: bool = False) -> jnp.ndarray:
        """Vocab logits; bias-free unless tied (reference seq2seq.py:27-33).

        Logits return in float32 regardless of the matmul dtype so the
        log_softmax and loss math stay full-precision. ``raw=True`` skips
        the f32 cast (training loss path): an f32 copy of bf16 values is
        bit-identical element-wise, so materializing the (B, L, V) tensor
        at twice the bytes buys nothing — runtime.crit casts inside its
        reduction fusions instead, and the gradient already crossed a
        f32->bf16 cast boundary at this exact point either way.
        """
        if not self.cfg.tie_weights:
            out = self.tgt_word_prj(hidden)
            return out if raw else out.astype(jnp.float32)
        table = self.decoder.embedding.word_embeddings.embedding
        if self.cfg.compute_dtype == "bfloat16":
            # match the untied nn.Dense(dtype=bf16) promotion — the (H, V)
            # projection is the largest matmul in the step, and an f32
            # table product would silently forfeit the configured bf16
            # MXU/HBM savings (bias add in bf16 mirrors flax Dense)
            out = (hidden.astype(jnp.bfloat16) @ table.T.astype(jnp.bfloat16)
                   + self.tie_bias.astype(jnp.bfloat16))
        else:
            out = hidden @ table.T + self.tie_bias
        return out if raw else out.astype(jnp.float32)

    def ar_embed(self, tgt_seq, category=None, deterministic: bool = True):
        """AR pre-layer stage: embeddings only (no NAR enhance features)."""
        return self.decoder.embedding(
            tgt_seq, category=category, deterministic=deterministic)

    def nar_embed(self, tgt_seq, enc_output, category=None,
                  deterministic: bool = True):
        """NAR pre-layer stage only: enhance-input feats + embeddings.

        Mirrors BertDecoder's pre-layer computation (reference
        Decoder.py:130-148) so the Pallas fused decoder layer
        (navc_tpu.ops.fused_layer) can take over from the embeddings.
        ``deterministic=False`` (training) applies the embedding dropout.
        """
        from ..ops import masking as M

        cfg = self.cfg
        l = tgt_seq.shape[1]
        additional_feats = None
        if cfg.enhance_input == 1:
            additional_feats = M.resample_enc_output(enc_output, tgt_seq)
        elif cfg.enhance_input == 2:
            additional_feats = M.meanpool_enc_output(enc_output, l)
        return self.decoder.embedding(
            tgt_seq, category=category, additional_feats=additional_feats,
            deterministic=deterministic)

    def decode_logprobs(self, tgt_seq, enc_output, category=None,
                        decoding_type: Optional[str] = None,
                        deterministic: bool = True,
                        output_attentions: bool = False):
        """decode -> project -> log_softmax; the eval-time hot path."""
        hidden, embs, attns = self.decode(
            tgt_seq, enc_output, category, decoding_type, deterministic,
            output_attentions)
        logprobs = jax.nn.log_softmax(self.project(hidden), axis=-1)
        if output_attentions:
            return logprobs, embs, attns
        return logprobs, embs

    # ------------------------------------------------------------------
    def __call__(self, feats: Sequence[jnp.ndarray],
                 tgt_tokens: Union[jnp.ndarray, Sequence[jnp.ndarray]],
                 category: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 return_logits: bool = False) -> Dict[str, Any]:
        """Training/teacher-forcing forward (reference seq2seq.py:82-140).

        ``return_logits=True`` emits raw projection logits under
        ``tgt_word_logits`` instead of materializing the (B, L, V)
        log-softmax — the training loss then normalizes only at the label
        positions (runtime.crit), saving the dominant HBM traffic of the
        train step. Values are float-identical: log_softmax(x)[y] ==
        (x[y] - max(x)) - log(sum(exp(x - max(x)))) in the same op order.
        """
        cfg = self.cfg
        results = self.encode(feats, deterministic=deterministic)

        if isinstance(tgt_tokens, (list, tuple)):
            token_sets: List[jnp.ndarray] = list(tgt_tokens)
        else:
            token_sets = [tgt_tokens]

        # SelfMask (parallel-MLM AR variant) feeds tokens[1:]; ARFormer shifts
        # off the last position (reference seq2seq.py:115-120)
        if cfg.decoding_type == "SelfMask":
            token_sets = [t[:, 1:] for t in token_sets]
        elif cfg.decoding_type == "ARFormer":
            token_sets = [t[:, :-1] for t in token_sets]

        logprob_sets: List[jnp.ndarray] = []
        for tokens in token_sets:
            hidden, _, _ = self.decode(
                tokens, results["enc_output"], category,
                decoding_type=cfg.decoding_type, deterministic=deterministic)
            logits = self.project(hidden, raw=return_logits)
            logprob_sets.append(
                logits if return_logits else jax.nn.log_softmax(logits, axis=-1))

        if return_logits:
            results["tgt_word_logits"] = logprob_sets
        else:
            results["tgt_word_logprobs"] = logprob_sets
        return results


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------


def build_model(cfg: Config) -> Seq2Seq:
    """Reference models/__init__.py:64-94 ``get_model``."""
    if cfg.vocab_size <= 0:
        raise ValueError("cfg.vocab_size must be set before building the model")
    for ch in cfg.modality.lower():
        if ch not in "imaot":
            raise ValueError("unknown modality char %r" % ch)
    return Seq2Seq(cfg=cfg)


def init_params(model: Seq2Seq, rng: jax.Array, cfg: Config):
    """Initialize parameter/batch-stats pytrees with dummy static-shape input."""
    feats = [jnp.zeros((2, cfg.n_frames, d), jnp.float32) for d in cfg.modality_dims]
    tokens = jnp.zeros((2, cfg.max_len), jnp.int32)
    category = jnp.zeros((2, 1), jnp.int32)
    if cfg.visual_word_generation:
        tgt = (tokens, tokens)
    else:
        tgt = tokens
    variables = model.init(
        {"params": rng, "dropout": rng}, feats, tgt, category, deterministic=True)
    return variables

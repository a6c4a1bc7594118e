"""Transformer primitives (BERT-style) for the caption decoder.

Capability parity with reference models/bert.py. Design is TPU-first:
  * all ops are static-shape jnp; attention folds heads into a batched matmul
    that XLA tiles onto the MXU,
  * masking is additive with the reference's exact fill value (-10e6,
    models/bert.py:161) so logits match the PyTorch implementation bit-for-bit
    in float32,
  * matmuls can run in bfloat16 (``dtype``) with float32 accumulation; softmax
    and LayerNorm stay float32.

Reference semantics preserved exactly (documented against models/bert.py):
  * gelu_new activation (bert.py:12-13),
  * BertSelfOutput: dense -> dropout -> +residual, LayerNorm only when
    ``with_layernorm`` (bert.py:182-200; default False per opts.py:36),
  * BertOutput applies dropout twice (bert.py:240-247),
  * BertLayer multiplies by the non-pad mask after every stage and returns the
    non-pad-averaged sequence embedding (bert.py:262-303).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import constants as C

# Additive mask fill value (reference models/bert.py:161 uses -10e6 == -1e7).
MASK_FILL = -10e6


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """Smooth GELU approximation (reference models/bert.py:12-13)."""
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


ACT2FN: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "gelu": gelu_exact,
    "relu": jax.nn.relu,
    "swish": swish,
    "gelu_new": gelu_new,
}

# torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)). We mirror it so
# training dynamics match the reference closely.
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch nn.Embedding default: N(0, 1).
torch_embed_init = nn.initializers.normal(stddev=1.0)


def _pad_zero_embed_init(key, shape, dtype=jnp.float32):
    """N(0,1) embedding table with the PAD row zeroed.

    The reference uses ``nn.Embedding(..., padding_idx=PAD)`` (bert.py:55)
    which zero-initializes (and grad-freezes) the PAD row. PAD positions are
    non-pad-masked out downstream, so only the init matters for parity.
    """
    table = torch_embed_init(key, shape, dtype)
    return table.at[C.PAD].set(0.0)


class Dense(nn.Dense):
    """nn.Dense with torch-compatible default kernel AND bias init.

    torch nn.Linear draws BOTH from U(-1/sqrt(fan_in), 1/sqrt(fan_in));
    flax's zero-bias default measurably slows convergence at small scale
    (root cause of the round-2 NAB training-trajectory gap: with identical
    init + identical batches the two stacks' per-step losses are
    float-identical — scripts/nab_bisect.py). The bias init needs fan_in,
    which flax's ``bias_init(key, (features,))`` signature cannot see, so
    ``__call__`` mirrors nn.Dense's exact computation (same promote_dtype /
    dot_general / bias-add order — the bf16 parity paths depend on it) and
    builds the bias initializer from the input width.
    """

    kernel_init: Any = torch_linear_init

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        fan_in = jnp.shape(inputs)[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (fan_in, self.features), self.param_dtype)
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape, dtype=self.param_dtype: jax.random.uniform(
                    key, shape, dtype, -bound, bound),
                (self.features,))
        else:
            bias = None
        inputs, kernel, bias = nn.dtypes.promote_dtype(
            inputs, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(
            inputs, kernel, (((inputs.ndim - 1,), (0,)), ((), ())),
            precision=self.precision)
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


def sinusoid_position_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    """Sinusoidal table (reference models/bert.py:25-43; unused by the default
    path, which learns position embeddings — kept for API parity)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class BertEmbeddings(nn.Module):
    """Word + learned position (+ category) embeddings with LayerNorm+dropout.

    Reference models/bert.py:46-108. ``return_pos`` additionally returns
    normalized position embeddings for pos-attention decoders.
    """

    vocab_size: int
    dim_hidden: int
    max_len: int
    num_category: int = 20
    with_category: bool = False
    layer_norm_eps: float = 1e-5
    hidden_dropout_prob: float = 0.5
    return_pos: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.word_embeddings = nn.Embed(
            self.vocab_size, self.dim_hidden, embedding_init=_pad_zero_embed_init,
            name="word_embeddings")
        self.position_embeddings = nn.Embed(
            self.max_len, self.dim_hidden, embedding_init=torch_embed_init,
            name="position_embeddings")
        if self.with_category:
            self.category_embeddings = nn.Embed(
                self.num_category, self.dim_hidden, embedding_init=torch_embed_init,
                name="category_embeddings")
        self.LayerNorm = nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")
        self.dropout = nn.Dropout(self.hidden_dropout_prob)
        if self.return_pos:
            self.pos_LN = nn.LayerNorm(epsilon=self.layer_norm_eps, name="pos_LN")
            self.pos_dropout = nn.Dropout(self.hidden_dropout_prob)

    def __call__(self, input_ids, category=None, position_ids=None,
                 additional_feats=None, deterministic: bool = True):
        b, seq_len = input_ids.shape
        words = self.word_embeddings(input_ids)
        if position_ids is None:
            # default positions are just arange: a static slice of the table
            # broadcast over the batch is value-identical to the gather, but
            # its VJP is a fast (B,) sum-reduction instead of the serialized
            # scatter-add XLA emits for an embedding-gather backward
            # (profiled at ~0.8 ms per scatter on the v5e train step)
            pos = jnp.broadcast_to(
                self.position_embeddings.embedding[None, :seq_len, :],
                (b, seq_len, self.dim_hidden))
        else:
            pos = self.position_embeddings(position_ids)
        emb = words + pos
        if self.with_category:
            assert category is not None, "with_category model requires category ids"
            cat = self.category_embeddings(category.reshape(b, -1)[:, :1])  # (B,1,H)
            emb = emb + jnp.broadcast_to(cat, emb.shape)
        if additional_feats is not None:
            emb = emb + additional_feats

        emb = self.LayerNorm(emb)
        emb = self.dropout(emb, deterministic=deterministic)
        if self.return_pos:
            pos_out = self.pos_dropout(self.pos_LN(pos), deterministic=deterministic)
            return emb, pos_out
        return emb


def fold_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """(B, L, H) -> (B, L, n_head, H/n_head) — head split without transpose;
    the einsums in attention_core contract directly from this layout so XLA
    emits no copy (transposed BHLD layouts cost ~25% of the decoder fwd in
    pure copies on TPU)."""
    b, l, h = x.shape
    return x.reshape(b, l, n_head, h // n_head)


def attention_core(q, k, v, mask, *, dropout_fn=None, dtype=jnp.float32,
                   use_sigmoid=False):
    """Scaled-dot attention with the reference's additive -10e6 masking.

    q,k,v: (B, L, n_head, d); mask: (B, Lq, Lk) bool, True = masked out
    (reference models/bert.py:154-174). Returns (out (B, Lq, n_head, d),
    probs (B, n_head, Lq, Lk)). ``use_sigmoid`` swaps the softmax for
    sum-normalized sigmoids (reference bert.py:163-165,
    use_sigmoid_to_get_attprob).
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], jnp.asarray(MASK_FILL, scores.dtype), scores)
    if use_sigmoid:
        probs = jax.nn.sigmoid(scores.astype(jnp.float32))
        probs = probs / (probs.sum(-1, keepdims=True) + 1e-12)
    else:
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout_fn is not None:
        probs = dropout_fn(probs)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.float32), probs


class BertSelfAttention(nn.Module):
    """Multi-head attention (reference models/bert.py:115-179)."""

    dim_hidden: int
    num_attention_heads: int
    attention_probs_dropout_prob: float = 0.0
    use_sigmoid_to_get_attprob: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.dim_hidden % self.num_attention_heads != 0:
            raise ValueError("dim_hidden %d not divisible by heads %d"
                             % (self.dim_hidden, self.num_attention_heads))
        self.query = Dense(self.dim_hidden, dtype=self.dtype, name="query")
        self.key = Dense(self.dim_hidden, dtype=self.dtype, name="key")
        self.value = Dense(self.dim_hidden, dtype=self.dtype, name="value")
        self.dropout = nn.Dropout(self.attention_probs_dropout_prob)

    def __call__(self, q_in, k_in, v_in, attention_mask=None,
                 deterministic: bool = True, output_attentions: bool = False):
        n = self.num_attention_heads
        q = fold_heads(self.query(q_in), n)
        k = fold_heads(self.key(k_in), n)
        v = fold_heads(self.value(v_in), n)
        drop = None
        if self.attention_probs_dropout_prob > 0.0:
            drop = lambda p: self.dropout(p, deterministic=deterministic)
        out, probs = attention_core(q, k, v, attention_mask, dropout_fn=drop,
                                    dtype=self.dtype,
                                    use_sigmoid=self.use_sigmoid_to_get_attprob)
        b, lq = out.shape[0], out.shape[1]
        out = out.reshape(b, lq, self.dim_hidden)
        if output_attentions:
            return out, probs
        return out, None


class BertSelfOutput(nn.Module):
    """Post-attention projection (reference models/bert.py:182-200)."""

    dim_hidden: int
    hidden_dropout_prob: float = 0.5
    with_layernorm: bool = False
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, input_tensor=None, deterministic: bool = True):
        hidden_states = Dense(self.dim_hidden, dtype=self.dtype, name="dense")(
            hidden_states).astype(jnp.float32)
        hidden_states = nn.Dropout(self.hidden_dropout_prob)(hidden_states, deterministic=deterministic)
        if input_tensor is not None:
            hidden_states = hidden_states + input_tensor
        if self.with_layernorm:
            hidden_states = nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")(hidden_states)
        return hidden_states


class BertAttention(nn.Module):
    """Self-attention + output projection with residual (bert.py:203-215)."""

    dim_hidden: int
    num_attention_heads: int
    attention_probs_dropout_prob: float = 0.0
    hidden_dropout_prob: float = 0.5
    with_layernorm: bool = False
    layer_norm_eps: float = 1e-5
    with_residual: bool = True
    use_sigmoid_to_get_attprob: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.self = BertSelfAttention(
            self.dim_hidden, self.num_attention_heads,
            self.attention_probs_dropout_prob,
            self.use_sigmoid_to_get_attprob, dtype=self.dtype, name="self")
        self.output = BertSelfOutput(
            self.dim_hidden, self.hidden_dropout_prob,
            self.with_layernorm, self.layer_norm_eps, dtype=self.dtype,
            name="output")

    def __call__(self, q, k, v, attention_mask=None, deterministic=True,
                 output_attentions=False):
        out, probs = self.self(q, k, v, attention_mask, deterministic, output_attentions)
        out = self.output(out, q if self.with_residual else None, deterministic)
        return out, probs


class BertIntermediate(nn.Module):
    """FFN up-projection + activation (reference models/bert.py:218-230)."""

    intermediate_size: int
    hidden_act: str = "gelu_new"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        hidden_states = Dense(self.intermediate_size, dtype=self.dtype,
                              name="dense")(hidden_states)
        return ACT2FN[self.hidden_act](hidden_states.astype(jnp.float32))


class BertOutput(nn.Module):
    """FFN down-projection; note the double dropout (bert.py:240-247)."""

    dim_hidden: int
    hidden_dropout_prob: float = 0.5
    with_layernorm: bool = False
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, input_tensor, deterministic: bool = True):
        hidden_states = Dense(self.dim_hidden, dtype=self.dtype, name="dense")(
            hidden_states).astype(jnp.float32)
        drop = nn.Dropout(self.hidden_dropout_prob)
        hidden_states = drop(hidden_states, deterministic=deterministic)
        hidden_states = hidden_states + input_tensor
        if self.with_layernorm:
            hidden_states = nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")(hidden_states)
        return drop(hidden_states, deterministic=deterministic)


class BertLayer(nn.Module):
    """One decoder block: self-attn -> (pos-attn) -> cross-attn -> FFN.

    Reference models/bert.py:250-303. Every stage output is multiplied by the
    non-pad mask; the block also returns the non-pad-mean sequence embedding.
    """

    dim_hidden: int
    num_attention_heads: int
    intermediate_size: int
    hidden_act: str = "gelu_new"
    hidden_dropout_prob: float = 0.5
    attention_probs_dropout_prob: float = 0.0
    with_layernorm: bool = False
    layer_norm_eps: float = 1e-5
    is_decoder_layer: bool = True
    pos_attention: bool = False
    use_sigmoid_to_get_attprob: bool = False
    # hidden knob (reference bert.py:253-254): parallel-MLM training drops
    # the self-attention residual so a SelfMask diagonal cannot be defeated
    # by a position's own input embedding riding the skip connection
    parallel_mlm: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        kw = dict(
            dim_hidden=self.dim_hidden,
            num_attention_heads=self.num_attention_heads,
            attention_probs_dropout_prob=self.attention_probs_dropout_prob,
            hidden_dropout_prob=self.hidden_dropout_prob,
            with_layernorm=self.with_layernorm,
            layer_norm_eps=self.layer_norm_eps,
            use_sigmoid_to_get_attprob=self.use_sigmoid_to_get_attprob,
            dtype=self.dtype,
        )
        self.attention = BertAttention(
            with_residual=not self.parallel_mlm, name="attention", **kw)
        if self.pos_attention and self.is_decoder_layer:
            self.pos_attention_mod = BertAttention(with_residual=True, name="pos_attention", **kw)
        if self.is_decoder_layer:
            self.attend_to_enc_output = BertAttention(with_residual=True, name="attend_to_enc_output", **kw)
        self.intermediate = BertIntermediate(
            self.intermediate_size, self.hidden_act, dtype=self.dtype,
            name="intermediate")
        self.output = BertOutput(self.dim_hidden, self.hidden_dropout_prob,
                                 self.with_layernorm, self.layer_norm_eps,
                                 dtype=self.dtype, name="output")

    def __call__(self, hidden_states, non_pad_mask=None, attention_mask=None,
                 enc_output=None, attend_to_enc_output_mask=None,
                 position_embeddings=None, deterministic: bool = True,
                 output_attentions: bool = False):
        all_attentions: Tuple = ()
        att, probs = self.attention(hidden_states, hidden_states, hidden_states,
                                    attention_mask, deterministic, output_attentions)
        if output_attentions:
            all_attentions += (probs,)
        if non_pad_mask is not None:
            att = att * non_pad_mask

        if self.pos_attention and self.is_decoder_layer:
            assert position_embeddings is not None
            att, probs = self.pos_attention_mod(position_embeddings, position_embeddings,
                                                att, attention_mask, deterministic,
                                                output_attentions)
            if output_attentions:
                all_attentions += (probs,)
            if non_pad_mask is not None:
                att = att * non_pad_mask

        if self.is_decoder_layer:
            assert enc_output is not None and attend_to_enc_output_mask is not None
            att, probs = self.attend_to_enc_output(att, enc_output, enc_output,
                                                   attend_to_enc_output_mask,
                                                   deterministic, output_attentions)
            if output_attentions:
                all_attentions += (probs,)
            if non_pad_mask is not None:
                att = att * non_pad_mask

        inter = self.intermediate(att)
        layer_output = self.output(inter, att, deterministic=deterministic)
        if non_pad_mask is not None:
            layer_output = layer_output * non_pad_mask
            embs = layer_output.sum(1) / non_pad_mask.sum(1)
        else:
            embs = layer_output.mean(1)
        return layer_output, embs, all_attentions

"""BERT-style caption decoder (AR and NAR modes).

Capability parity with reference models/Decoder.py:
  * mask selection by decoding type — NARFormer: key-pad only; ARFormer:
    key-pad + causal (+watch); SelfMask: key-pad + diagonal
    (Decoder.py:105-124),
  * NAR input enhancement 0/1/2 (none / resampled enc_output / mean-pooled
    broadcast) added to the token embeddings (Decoder.py:130-139),
  * cross-attention over the (never-masked) encoder output (Decoder.py:127-128),
  * N stacked BertLayers feeding the last layer's hidden states forward
    (Decoder.py:150-178; default N=1 per opts.py:24).

The visual-word "disentangled" two-pass decoding (reference
BertDecoderDisentangled, Decoder.py:181-215) shares one set of decoder weights
across both passes; here that is expressed by calling the same flax module
twice from Seq2Seq (flax modules are reused by construction, so weight sharing
is structural rather than an aliasing trick).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .. import constants as C
from ..ops import masking as M
from .layers import BertEmbeddings, BertLayer


class BertDecoder(nn.Module):
    vocab_size: int
    dim_hidden: int
    max_len: int
    num_hidden_layers: int = 1
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    hidden_act: str = "gelu_new"
    hidden_dropout_prob: float = 0.5
    attention_probs_dropout_prob: float = 0.0
    layer_norm_eps: float = 1e-5
    with_layernorm: bool = False
    with_category: bool = False
    num_category: int = 20
    pos_attention: bool = False
    enhance_input: int = 2
    watch: int = 0
    decoding_type: str = "ARFormer"
    use_sigmoid_to_get_attprob: bool = False
    parallel_mlm: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = BertEmbeddings(
            vocab_size=self.vocab_size,
            dim_hidden=self.dim_hidden,
            max_len=self.max_len,
            num_category=self.num_category,
            with_category=self.with_category,
            layer_norm_eps=self.layer_norm_eps,
            hidden_dropout_prob=self.hidden_dropout_prob,
            return_pos=self.pos_attention,
            name="embedding",
        )
        self.layers = [
            BertLayer(
                dim_hidden=self.dim_hidden,
                num_attention_heads=self.num_attention_heads,
                intermediate_size=self.intermediate_size,
                hidden_act=self.hidden_act,
                hidden_dropout_prob=self.hidden_dropout_prob,
                attention_probs_dropout_prob=self.attention_probs_dropout_prob,
                with_layernorm=self.with_layernorm,
                layer_norm_eps=self.layer_norm_eps,
                is_decoder_layer=True,
                pos_attention=self.pos_attention,
                use_sigmoid_to_get_attprob=self.use_sigmoid_to_get_attprob,
                parallel_mlm=self.parallel_mlm,
                dtype=self.dtype,
                name="layer_%d" % i,
            )
            for i in range(self.num_hidden_layers)
        ]

    def __call__(self, tgt_seq, enc_output, category=None,
                 decoding_type: Optional[str] = None,
                 deterministic: bool = True, output_attentions: bool = False):
        """Returns (last hidden states (B, L, H), embs (B, H), attentions)."""
        decoding_type = decoding_type or self.decoding_type
        b, l = tgt_seq.shape

        kp = M.key_pad_mask(tgt_seq, l)
        if decoding_type == "NARFormer":
            slf_attn_mask = kp
        elif decoding_type == "SelfMask":
            slf_attn_mask = M.self_mask_diag(tgt_seq)
        else:  # ARFormer
            slf_attn_mask = kp | M.subsequent_mask(b, l, watch=self.watch)

        npm = M.non_pad_mask(tgt_seq)
        cross_mask = M.enc_attention_mask(enc_output, l)

        additional_feats = None
        if decoding_type == "NARFormer":
            if self.enhance_input == 0:
                pass
            elif self.enhance_input == 1:
                additional_feats = M.resample_enc_output(enc_output, tgt_seq)
            elif self.enhance_input == 2:
                additional_feats = M.meanpool_enc_output(enc_output, l)
            else:
                raise ValueError("enhance_input should be 0, 1 or 2")

        if self.pos_attention:
            hidden, position_embeddings = self.embedding(
                tgt_seq, category=category, deterministic=deterministic)
        else:
            hidden = self.embedding(
                tgt_seq, category=category, additional_feats=additional_feats,
                deterministic=deterministic)
            position_embeddings = None

        all_attentions: Tuple = ()
        embs = None
        for layer in self.layers:
            hidden, embs, attns = layer(
                hidden,
                non_pad_mask=npm,
                attention_mask=slf_attn_mask,
                enc_output=enc_output,
                attend_to_enc_output_mask=cross_mask,
                position_embeddings=position_embeddings,
                deterministic=deterministic,
                output_attentions=output_attentions,
            )
            if output_attentions:
                all_attentions = all_attentions + (attns,)

        return hidden, embs, all_attentions

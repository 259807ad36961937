"""LTA sequence-decoder models: autoregressive verb/noun token decoding.

Behavioral reference: HOI/models/lta/lta_models_seqdecoder.py —
``ForecastingEncoderSeqDecoder`` (:65-216): SlowFast/MViT clip features
→ LN + PE + TransformerEncoder over the N input-clip tokens; decoder
embeds label tokens at √dim scale with a causal mask; autoregressive
``predict`` greedily rolls out 40 tokens ([action] v₁ n₁ v₂ n₂ …),
collecting verb logits at odd and noun logits at even steps restricted
to the verb/noun vocab subsets (:180-201); ``generate(k)`` samples
Categorically from those logits. ``ForecastingEncoderSeparateSeqDecoder``
(:218-240) decodes one verb and one noun token from the lta_verb/
lta_noun prompts.

The greedy rollout runs as a Python loop over a fixed 41-step horizon
(static shapes per step; XLA compiles each prefix length once — with
seq_len ≤ 41 this stays bounded). A future perf pass can convert it to
``lax.scan`` with a fixed-width decode buffer.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egot2x.core.registry import MODEL_REGISTRY
from egot2x.models.ar_lta import SlowFastFeature
from egot2x.nn.common import (
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
)

Dtype = Any


@MODEL_REGISTRY.register(name="ForecastingEncoderSeqDecoder")
class ForecastingEncoderSeqDecoder(nn.Module):
    vocab_size: int
    verb_ids: Sequence[int]  # vocab ids of verb labels in label order
    noun_ids: Sequence[int]
    dim: int = 2048
    num_heads: int = 8
    num_layers: int = 6
    num_actions: int = 20
    bos_token: int = 0  # vocab['action'] / vocab['lta_verb'] per variant
    alpha: int = 8
    beta_inv: int = 8
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = SlowFastFeature(self.dim, self.alpha, self.beta_inv,
                                        dtype=self.dtype)
        self.ln = nn.LayerNorm(dtype=self.dtype)
        self.pos_embed = PositionalEncoding(self.dim, dropout=0.1, max_len=200)
        self.embedding = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)
        self.transformer_encoder = TransformerEncoder(
            self.num_layers, self.dim, self.num_heads, dim_feedforward=2048,
            dtype=self.dtype)
        self.transformer_decoder = TransformerDecoder(
            self.num_layers, self.dim, self.num_heads, dim_feedforward=2048,
            dtype=self.dtype)
        self.fc = nn.Dense(self.vocab_size, dtype=self.dtype)

    def encode(self, pathways, train=False):
        n = pathways[0].shape[1]
        feats = [self.backbone([p[:, i] for p in pathways], train=train)
                 for i in range(n)]
        x = jnp.stack(feats, axis=1)  # (B, N, D)
        x = self.pos_embed(self.ln(x), deterministic=not train)
        return self.transformer_encoder(x, deterministic=not train)

    def decode(self, y, encoded_x, train=False):
        emb = self.embedding(y) * math.sqrt(self.dim)
        emb = self.pos_embed(emb, deterministic=not train)
        out = self.transformer_decoder(emb, encoded_x, is_causal=True,
                                       deterministic=not train)
        return self.fc(out)  # (B, S, vocab)

    def __call__(self, pathways, target, train: bool = False):
        encoded = self.encode(pathways, train=train)
        return self.decode(target, encoded, train=train)

    def predict(self, pathways):
        """Greedy rollout of 2·Z tokens; returns verb/noun subset logits
        [(B, Z, |verbs|), (B, Z, |nouns|)].

        TPU-native rollout: the decoder runs over the FULL fixed-length
        token buffer every step (causal masking makes positions ≥ sy
        inert), so XLA compiles ONE decode program instead of one per
        prefix length, and the loop is a lax.fori_loop."""
        encoded = self.encode(pathways, train=False)
        b = encoded.shape[0]
        seq_len = 2 * self.num_actions + 1
        v_idx = jnp.asarray(np.asarray(self.verb_ids))
        n_idx = jnp.asarray(np.asarray(self.noun_ids))
        tokens0 = jnp.full((b, seq_len), 1, jnp.int32).at[:, 0].set(self.bos_token)
        step_logits0 = jnp.zeros((b, seq_len, self.vocab_size), jnp.float32)

        def body(sy, carry):
            tokens, step_logits = carry
            logits = self.decode(tokens, encoded)  # (B, seq_len, V) fixed shape
            step = jax.lax.dynamic_slice_in_dim(logits, sy - 1, 1, axis=1)[:, 0]
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, jnp.argmax(step, axis=-1).astype(jnp.int32)[:, None],
                sy, axis=1)
            step_logits = jax.lax.dynamic_update_slice_in_dim(
                step_logits, step.astype(jnp.float32)[:, None], sy, axis=1)
            return tokens, step_logits

        _, step_logits = jax.lax.fori_loop(1, seq_len, body,
                                           (tokens0, step_logits0))
        # positions 1, 3, 5, … hold verb-step logits; 2, 4, … noun-step
        verb_steps = step_logits[:, 1::2][:, : self.num_actions]
        noun_steps = step_logits[:, 2::2][:, : self.num_actions]
        return [verb_steps[..., v_idx], noun_steps[..., n_idx]]

    def generate(self, pathways, k: int = 1, rng: Optional[jax.Array] = None):
        outs = self.predict(pathways)
        results = []
        for hi, head in enumerate(outs):
            if k > 1:
                keys = jax.random.split(jax.random.fold_in(rng, hi), k)
                preds = [jax.random.categorical(key, head, axis=-1)
                         for key in keys]
            else:
                preds = [jnp.argmax(head, axis=-1)]
            results.append(jnp.stack(preds, axis=1))
        return results


@MODEL_REGISTRY.register(name="ForecastingEncoderSeparateSeqDecoder")
class ForecastingEncoderSeparateSeqDecoder(ForecastingEncoderSeqDecoder):
    """One verb + one noun decode from separate prompts (:218-240)."""

    verb_bos: int = 0  # vocab['lta_verb']
    noun_bos: int = 0  # vocab['lta_noun']

    def predict(self, pathways):
        encoded = self.encode(pathways, train=False)
        b = encoded.shape[0]
        v_idx = jnp.asarray(np.asarray(self.verb_ids))
        n_idx = jnp.asarray(np.asarray(self.noun_ids))
        yv = jnp.full((b, 1), self.verb_bos, jnp.int32)
        yn = jnp.full((b, 1), self.noun_bos, jnp.int32)
        verb = self.decode(yv, encoded)[:, 0][:, v_idx][:, None, :]
        noun = self.decode(yn, encoded)[:, 0][:, n_idx][:, None, :]
        return [verb, noun]

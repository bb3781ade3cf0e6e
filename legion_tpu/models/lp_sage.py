"""Unsupervised link-prediction GraphSAGE.

Parity with training_backend/lp_sage.py:86-97: each batch's seeds are
(anchor, positive, negative) thirds; the encoder is a SAGE stack without a
classifier head; loss is

    -logsigmoid(h_a . h_p) - logsigmoid(-h_a . h_n)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from legion_tpu.config import SamplerConfig
from legion_tpu.models.common import dropout, static_cum_sizes, \
    xavier_uniform
from legion_tpu.models.graphsage import sage_layer_apply
from legion_tpu.sampling import SampleBatch


class LinkPredSAGE:
    def __init__(self, sampler_cfg: SamplerConfig, in_dim: int,
                 hidden_dim: int, dropout: float = 0.5, in_dim_pad=None):
        assert sampler_cfg.batch_size % 3 == 0, (
            "lp_sage batches are (anchor, pos, neg) thirds "
            "(lp_sage.py:86-97)")
        self.cfg = sampler_cfg
        self.num_layers = sampler_cfg.num_hops
        self.in_dim = in_dim
        self.in_dim_pad = in_dim_pad or in_dim
        self.dims = [self.in_dim_pad] + [hidden_dim] * self.num_layers
        self.dropout_rate = dropout
        self.S = static_cum_sizes(sampler_cfg)

    def init(self, key: jax.Array):
        from legion_tpu.models.common import xavier_uniform_padded
        layers = []
        for i in range(self.num_layers):
            k1, k2, key = jax.random.split(key, 3)
            logical = self.in_dim if i == 0 else self.dims[i]
            layers.append({
                "w_self": xavier_uniform_padded(k1, logical, self.dims[i],
                                                (self.dims[i + 1],),
                                                gain=2 ** 0.5),
                "w_neigh": xavier_uniform_padded(k2, logical, self.dims[i],
                                                 (self.dims[i + 1],),
                                                 gain=2 ** 0.5),
                "b": jnp.zeros((self.dims[i + 1],), jnp.float32),
            })
        return {"layers": layers}

    def encode(self, params, feats: jax.Array, batch: SampleBatch,
               train: bool = False, rng: Optional[jax.Array] = None
               ) -> jax.Array:
        L = self.num_layers
        h = feats
        for i in range(L):
            k = L - 1 - i
            h = sage_layer_apply(params["layers"][i], h[:self.S[k + 1]],
                                 batch.edge_src[k], self.cfg.fanouts[k],
                                 batch.hop_offsets[k], self.S[k],
                                 self.cfg.aligned_hop_offset(k))
            if i != L - 1:
                h = jax.nn.relu(h)
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                    h = dropout(h, self.dropout_rate, sub, train)
        return h[:self.cfg.batch_size]

    def apply(self, params, feats: jax.Array, batch: SampleBatch,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> jax.Array:
        return self.encode(params, feats, batch, train, rng)

    def loss(self, params, feats: jax.Array, batch: SampleBatch,
             seed_valid: jax.Array, train: bool = True,
             rng: Optional[jax.Array] = None) -> jax.Array:
        h = self.encode(params, feats, batch, train, rng)
        third = self.cfg.batch_size // 3
        h_a, h_p, h_n = h[:third], h[third:2 * third], h[2 * third:]
        pos = jnp.sum(h_a * h_p, axis=-1)
        neg = jnp.sum(h_a * h_n, axis=-1)
        per = -jax.nn.log_sigmoid(pos) - jax.nn.log_sigmoid(-neg)
        w = seed_valid[:third].astype(per.dtype)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1)

"""GAT with edge-wise SDDMM attention.

Math parity with the reference trainer's DGL GATConv stack
(training_backend/legion_gat.py:37-79; heads [8,1], feat/attn dropout 0.6,
mid layers flatten heads, last layer means them):

    z_u     = W h_u                       (per head)
    e_uv    = LeakyReLU(a_l . z_u + a_r . z_v)      # SDDMM over edges
    alpha   = segment_softmax(e, dst)                # per-dst normalization
    h'_v    = sum_u alpha_uv z_u
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from legion_tpu.config import SamplerConfig
from legion_tpu.models.common import dropout, static_cum_sizes, \
    xavier_uniform
from legion_tpu.ops import gather_rows
from legion_tpu.ops.hop_agg import hop_softmax_attention, place_rows
from legion_tpu.sampling import SampleBatch


def gat_layer_apply(params, h_src: jax.Array, edge_src: jax.Array,
                    fanout: int, hop_offset: jax.Array, num_dst: int,
                    negative_slope: float = 0.2,
                    attn_drop: float = 0.0, train: bool = False,
                    rng: Optional[jax.Array] = None,
                    aligned_offset=None) -> jax.Array:
    """One multi-head GATConv. Returns [num_dst, heads, d_out].

    The SDDMM scores and the per-dst softmax run densely per frontier row
    ([F, fanout, H]) thanks to the sampler's structured edge layout.
    """
    H, d_out = params["attn_l"].shape
    z = (h_src @ params["w"].reshape(h_src.shape[1], H * d_out)
         ).reshape(-1, H, d_out)
    el = jnp.sum(z * params["attn_l"][None], axis=-1)  # [N_src, H]
    er = jnp.sum(z * params["attn_r"][None], axis=-1)
    F = edge_src.shape[0] // fanout
    # fanout-major lanes: dst of lane f*F + i is frontier row i at
    # position hop_offset + i
    er_dst = jax.lax.dynamic_slice(
        er, (jnp.asarray(hop_offset, jnp.int32), jnp.int32(0)), (F, H))
    if aligned_offset is not None:
        el_e = jax.lax.slice(el, (aligned_offset, 0),
                             (aligned_offset + edge_src.shape[0], H))
    else:
        el_e = gather_rows(el, edge_src)
    e = el_e.reshape(fanout, F, H) + er_dst[None, :]
    e = jax.nn.leaky_relu(e, negative_slope)
    out = hop_softmax_attention(z, e, edge_src, fanout, hop_offset,
                                num_dst, attn_drop, train, rng,
                                aligned_offset)
    return out + params["b"][None]


class GAT:
    def __init__(self, sampler_cfg: SamplerConfig, in_dim: int,
                 hidden_dim: int, num_classes: int,
                 heads: Sequence[int] = (8, 1), feat_drop: float = 0.6,
                 attn_drop: float = 0.6, negative_slope: float = 0.2,
                 in_dim_pad=None):
        self.cfg = sampler_cfg
        self.num_layers = sampler_cfg.num_hops
        assert len(heads) == self.num_layers
        self.heads = tuple(heads)
        self.feat_drop = feat_drop
        self.attn_drop = attn_drop
        self.negative_slope = negative_slope
        self.S = static_cum_sizes(sampler_cfg)
        self.in_dim = in_dim
        self.in_dim_pad = in_dim_pad or in_dim
        # layer i: in = in_dim (i=0) else hidden*heads[i-1] (flattened);
        # out-per-head = hidden for mid layers, num_classes for the last
        self.layer_in = [self.in_dim_pad] + [hidden_dim * heads[i - 1]
                                             for i in range(1,
                                                            self.num_layers)]
        self.layer_out = [hidden_dim] * (self.num_layers - 1) + [num_classes]

    def init(self, key: jax.Array):
        from legion_tpu.models.common import xavier_uniform_padded
        layers = []
        for i in range(self.num_layers):
            k1, k2, k3, key = jax.random.split(key, 4)
            d_in, d_out, H = self.layer_in[i], self.layer_out[i], \
                self.heads[i]
            logical = self.in_dim if i == 0 else d_in
            layers.append({
                # DGL GATConv reset_parameters: xavier gain=sqrt(2)
                "w": xavier_uniform_padded(k1, logical, d_in, (H, d_out),
                                           gain=2 ** 0.5),
                "attn_l": xavier_uniform(k2, (H, d_out), gain=2 ** 0.5),
                "attn_r": xavier_uniform(k3, (H, d_out), gain=2 ** 0.5),
                "b": jnp.zeros((H, d_out), jnp.float32),
            })
        return {"layers": layers}

    def apply(self, params, feats: jax.Array, batch: SampleBatch,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> jax.Array:
        L = self.num_layers
        h = feats
        for i in range(L):
            k = L - 1 - i
            if rng is not None:
                rng, kf, ka = jax.random.split(rng, 3)
            else:
                kf = ka = None
            h = dropout(h, self.feat_drop, kf, train)
            out = gat_layer_apply(params["layers"][i], h[:self.S[k + 1]],
                                  batch.edge_src[k], self.cfg.fanouts[k],
                                  batch.hop_offsets[k],
                                  self.S[k], self.negative_slope,
                                  self.attn_drop, train, ka,
                                  self.cfg.aligned_hop_offset(k))
            if i != L - 1:
                # flatten heads + ELU like legion_gat.py:57-60
                out = jax.nn.elu(out.reshape(out.shape[0], -1))
            else:
                out = out.mean(axis=1)
            h = out
        return h[:self.cfg.batch_size]

"""Dense per-hop aggregation — scatter-free SpMM for sampled blocks.

The sampler's hop-k edge list is STRUCTURED (sampler.py SampleBatch): each
frontier slot emits `fanout` contiguous lanes whose dst is
``hop_offset + slot``. Aggregation by destination therefore reduces to a
[F, fanout, d] reshape + masked sum over the fanout axis + one
dynamic_update_slice — no scatter, no sort, no segment ids. On TPU this
turns the SpMM that dominates GNN message passing into dense VPU reductions
(XLA TPU scatter-adds with duplicate indices serialize and were measured
~10x slower than this path).

The generic masked segment ops (ops/segment.py) remain for edge lists
without this structure.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from legion_tpu.ops.segment import gather_rows


def hop_gather_msgs(h_src: jax.Array, src_l: jax.Array, fanout: int,
                    aligned_offset: Optional[int] = None
                    ) -> Tuple[jax.Array, jax.Array]:
    """Gather per-edge messages into [F, fanout, d] + validity [F, fanout].
    src_l: [F * fanout] local indices, -1 pad.

    When the hop is lane-aligned (sampler skipped last-hop dedup, so
    position == aligned_offset + lane), the per-edge row gather — and its
    scatter-add transpose in the backward pass — collapses to a static
    slice."""
    F = src_l.shape[0] // fanout
    E = src_l.shape[0]
    if aligned_offset is not None:
        msgs = jax.lax.slice(h_src, (aligned_offset, 0),
                             (aligned_offset + E, h_src.shape[1]))
        msgs = msgs.reshape(F, fanout, h_src.shape[1])
    else:
        msgs = gather_rows(h_src, src_l).reshape(F, fanout, h_src.shape[1])
    valid = (src_l >= 0).reshape(F, fanout)
    return msgs, valid


def place_rows(rows: jax.Array, offset: jax.Array, num_dst: int
               ) -> jax.Array:
    """Embed [F, ...] frontier rows at [offset, offset+F) of a zeroed
    [num_dst, ...] buffer."""
    out = jnp.zeros((num_dst,) + rows.shape[1:], rows.dtype)
    offset = jnp.asarray(offset, jnp.int32)
    idx = (offset,) + (jnp.int32(0),) * (rows.ndim - 1)
    return jax.lax.dynamic_update_slice(out, rows, idx)


def hop_neighbor_sum(h_src: jax.Array, src_l: jax.Array, fanout: int,
                     offset: jax.Array, num_dst: int,
                     aligned_offset: Optional[int] = None,
                     ) -> Tuple[jax.Array, jax.Array]:
    """Sum of neighbor features per dst and the neighbor count per dst.
    Returns (sum [num_dst, d], count [num_dst]).

    The reduction stays a VPU masked reshape+sum: measured IN CONTEXT it
    fuses with the feature-gather producer and beats an MXU ones-vector
    dot_general by ~1.6ms/step at bench shapes (the dot forces the [F,
    fanout, d] operand to materialize in MXU layout; isolated microbenches
    said the opposite — trust the fused measurement)."""
    msgs, valid = hop_gather_msgs(h_src, src_l, fanout, aligned_offset)
    # accumulate in f32 so bf16 feature storage loses no precision
    acc = jnp.float32 if msgs.dtype == jnp.bfloat16 else msgs.dtype
    msum = jnp.sum(jnp.where(valid[..., None], msgs, 0), axis=1, dtype=acc)
    cnt = jnp.sum(valid, axis=1).astype(acc)
    return place_rows(msum, offset, num_dst), \
        place_rows(cnt, offset, num_dst)


def hop_neighbor_mean(h_src: jax.Array, src_l: jax.Array, fanout: int,
                      offset: jax.Array, num_dst: int,
                      aligned_offset: Optional[int] = None) -> jax.Array:
    s, c = hop_neighbor_sum(h_src, src_l, fanout, offset, num_dst,
                            aligned_offset)
    return s / jnp.maximum(c, 1)[:, None]


def hop_softmax_attention(z: jax.Array, scores: jax.Array,
                          src_l: jax.Array, fanout: int, offset: jax.Array,
                          num_dst: int, attn_drop: float = 0.0,
                          train: bool = False,
                          rng: Optional[jax.Array] = None,
                          aligned_offset: Optional[int] = None) -> jax.Array:
    """GAT-style per-dst softmax + weighted sum, densely per frontier row.

    z: [N_src, H, d] projected features; scores: [F, fanout, H] edge scores
    (already LeakyReLU'd). Returns [num_dst, H, d].
    """
    from legion_tpu.models.common import dropout
    F = src_l.shape[0] // fanout
    valid = (src_l >= 0).reshape(F, fanout)
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
    s = jnp.where(valid[..., None], scores, neg)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.where(valid[..., None], jnp.exp(s - jax.lax.stop_gradient(m)),
                  0)
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True),
                        jnp.finfo(scores.dtype).tiny)
    alpha = e / denom                                    # [F, fanout, H]
    alpha = dropout(alpha, attn_drop, rng, train)
    z2 = z.reshape(z.shape[0], -1)
    if aligned_offset is not None:
        zs = jax.lax.slice(z2, (aligned_offset, 0),
                           (aligned_offset + src_l.shape[0], z2.shape[1]))
    else:
        zs = gather_rows(z2, src_l)
    zs = zs.reshape(F, fanout, z.shape[1], z.shape[2])   # [F, fo, H, d]
    out = jnp.sum(alpha[..., None] * zs, axis=1)         # [F, H, d]
    return place_rows(out, offset, num_dst)

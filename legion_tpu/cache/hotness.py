"""Presampling: measure per-vertex access frequencies before training.

Reference parity: GPUServer::PreSc (server.cu:90-117) runs train_step
presampling iterations per GPU, accumulating
  - node_access_time_[v]: batches whose unique-id set contains v
    (HotnessMeasure, cache.cu:40-68) -> feature-fetch hotness;
  - edge_access_time_[v]: frontier expansions of v (pre_sample,
    operator_impl.cu:358) -> adjacency-read hotness,
then drives CandidateSelection/CostModel/FillUp. Here the accumulation is
the sampler's presample_fn (segment adds), scanned on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from legion_tpu.graph import DeviceCSR
from legion_tpu.sampling import NeighborSampler


def presample_hotness(sampler: NeighborSampler, csr: DeviceCSR,
                      seed_bank: jax.Array, num_steps: int,
                      key: jax.Array,
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run ``num_steps`` presampling batches; returns (node_access,
    edge_access, max_unique_nodes).

    seed_bank: [num_steps * batch] device array (-1 padded), like the
    trainer's train bank. The returned max_unique_nodes is the PER-HOP
    vector of maxima over batch.num_nodes — the reference's MaxIdNum used
    to size the steady-state feature buffer at 1.2x the observed need
    (server.cu:275-283); we use it for per-hop buffer caps.
    """
    V = sampler.num_nodes
    bs = sampler.config.batch_size
    L = sampler.config.num_hops

    def body(carry, lid):
        pos_map, na, ea, mx = carry
        seeds = jax.lax.dynamic_slice(seed_bank, (lid * bs,), (bs,))
        k = jax.random.fold_in(key, lid)
        batch, pos_map, na, ea = sampler.presample_fn(
            csr, seeds, pos_map, k, na, ea)
        mx = jnp.maximum(mx, batch.num_nodes)
        return (pos_map, na, ea, mx), None

    init = (sampler.init_state(),
            jnp.zeros((V,), jnp.int32),
            jnp.zeros((V,), jnp.int32),
            jnp.zeros((L + 1,), jnp.int32))
    (pos_map, na, ea, mx), _ = jax.lax.scan(
        body, init, jnp.arange(num_steps, dtype=jnp.int32))
    return na, ea, mx

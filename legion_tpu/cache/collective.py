"""Clique-aggregated feature cache: interleaved shards + ICI peer reads.

Reference parity: Legion's central contribution is aggregating the cache
capacity of an NVLink clique — GPU j of a Kg-clique caches the i-th hottest
vertex iff i % Kg == j, at local row i // Kg, and lookups read peer caches
directly over NVLink (cache_impl.cuh:104-109, multiGPU_feat_cache_lookup
cache_impl.cuh:239-272).

TPU translation: the clique is the mesh's "member" axis. Each member holds a
[R, F] cache shard; the hotness-interleaved layout makes request load
uniform across members, so per-owner request lists are boundable at
~1.5x N/Kg. A lookup becomes:

  sort ids by owning member -> fixed-size per-owner request matrices ->
  all_to_all (requests ride ICI) -> local row gathers -> all_to_all back ->
  unsort.  Overflowing or uncached ids fall back to the host feature store
  (one batched gather per step), exactly the reference's UVA miss path.

Use inside shard_map over the ("clique", "member") mesh; `member_rows` is
the caller's per-member shard of the [Kg, R, F] sharded cache array.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_clique_cache(feature_order: np.ndarray, group_capacity: int,
                       host_features: np.ndarray, group_size: int
                       ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host-side FillUp (cache.cu:553-611).

    Returns (slot_map [V] int32 with GLOBAL slot ids or -1,
             member_rows [Kg, R, F] float32, R).
    Global slot i (i-th hottest cached vertex) lives on member i % Kg at
    local row i // Kg.
    """
    from legion_tpu import native
    V, F = host_features.shape
    Kg = group_size
    C = (group_capacity // Kg) * Kg  # whole rows per member
    R = max(C // Kg, 1)
    hot = np.asarray(feature_order[:C], np.int32)
    slot_map = np.full(V, -1, np.int32)
    slot_map[hot] = np.arange(C, dtype=np.int32)
    member_rows = np.zeros((Kg, R, F), np.float32)
    for j in range(Kg):
        ids_j = hot[j::Kg]
        member_rows[j, : len(ids_j)] = native.gather_rows(
            host_features, ids_j)
    return slot_map, member_rows, R


class CliqueFeatureCache:
    """Collective fetch over the member axis (call inside shard_map)."""

    def __init__(self, slot_map: jax.Array, host_features: np.ndarray,
                 group_size: int, capacity_per_member: int,
                 axis_name: str = "member", request_slack: float = 1.5):
        self.slot_map = slot_map          # [V] int32, global slots
        self.host = host_features         # np [V, F]
        self.Kg = group_size
        self.R = capacity_per_member
        self.axis = axis_name
        self.slack = request_slack
        self.feat_dim = host_features.shape[1]

    def tree_flatten(self):
        from legion_tpu.cache.unified_cache import _HostRef
        return ((self.slot_map,),
                (_HostRef(self.host), self.Kg, self.R, self.axis,
                 self.slack))

    @classmethod
    def tree_unflatten(cls, aux, children):
        host, Kg, R, axis, slack = aux
        return cls(children[0], host.array, Kg, R, axis, slack)

    def _host_gather(self, ids: np.ndarray) -> np.ndarray:
        from legion_tpu import native
        return native.gather_rows(self.host, np.asarray(ids, np.int32))

    def fetch(self, ids: jax.Array, member_rows: jax.Array
              ) -> Tuple[jax.Array, jax.Array]:
        """ids [N] int32 (-1 pad), member_rows [R, F] this member's shard.
        Returns (rows [N, F] float32, hits int32)."""
        N = ids.shape[0]
        Kg, R, F = self.Kg, self.R, self.feat_dim
        R_req = int(-(-N * self.slack // Kg))
        V = self.slot_map.shape[0]

        slot = jnp.where(ids >= 0,
                         self.slot_map[jnp.clip(ids, 0, V - 1)], -1)
        hit = slot >= 0
        owner = jnp.where(hit, slot % Kg, Kg)          # misses -> bucket Kg
        local = jnp.where(hit, slot // Kg, 0)

        # sort by owner; position within the owner segment
        perm = jnp.argsort(owner, stable=True)
        sorted_owner = owner[perm]
        sorted_local = local[perm]
        seg_start = jnp.searchsorted(sorted_owner,
                                     jnp.arange(Kg + 1, dtype=owner.dtype))
        so_c = jnp.clip(sorted_owner, 0, Kg - 1)
        pos = jnp.arange(N, dtype=jnp.int32) - seg_start[so_c].astype(
            jnp.int32)
        in_bounds = (sorted_owner < Kg) & (pos < R_req)

        # per-owner request matrices [Kg, R_req] of local rows (-1 pad)
        req = jnp.full((Kg, R_req), -1, jnp.int32)
        flat_idx = jnp.where(in_bounds, so_c * R_req + pos, Kg * R_req)
        req = req.reshape(-1).at[flat_idx].set(
            sorted_local, mode="drop").reshape(Kg, R_req)

        # exchange requests: row o of req goes to member o
        req_recv = jax.lax.all_to_all(req[:, None], self.axis, split_axis=0,
                                      concat_axis=0, tiled=False)
        req_recv = req_recv.reshape(Kg, R_req)
        # serve from my shard
        served = jnp.where(
            (req_recv >= 0)[..., None],
            member_rows[jnp.clip(req_recv, 0, R - 1)], 0)
        # send rows back
        rows_back = jax.lax.all_to_all(served[:, None], self.axis,
                                       split_axis=0, concat_axis=0,
                                       tiled=False)
        rows_back = rows_back.reshape(Kg, R_req, F)

        # unsort: my request at (owner o, pos p) sits at sorted index
        # seg_start[o] + p == its own sorted position
        out_sorted = jnp.where(
            in_bounds[:, None],
            rows_back[so_c, jnp.clip(pos, 0, R_req - 1)], 0)
        inv = jnp.zeros((N,), jnp.int32).at[perm].set(
            jnp.arange(N, dtype=jnp.int32))
        rows = out_sorted[inv]
        collective_hit = hit & jnp.zeros((N,), bool).at[perm].set(in_bounds)

        # host fallback for misses + overflow
        miss_ids = jnp.where(collective_hit, -1, ids)
        miss_rows = jax.pure_callback(
            self._host_gather,
            jax.ShapeDtypeStruct((N, F), jnp.float32),
            miss_ids, vmap_method="sequential")
        rows = jnp.where(collective_hit[:, None], rows, miss_rows)
        return rows, jnp.sum(collective_hit, dtype=jnp.int32)


jax.tree_util.register_pytree_node_class(CliqueFeatureCache)

"""A/B: hotness-renumbered split hot/cold feature table vs direct gather.

Round-4 found row-gather cost is set by PHYSICAL table size (~3.9ns/row
<=105MB, ~8ns/row >128MB; docs/DESIGN.md "Round-4 roofline") and proposed
(round-5 verdict) renumbering vertex ids by hotness so the hot prefix
lives in a <=105MB table and routing is a plain `id < C` compare. This
harness measures every piece of that design on the real chip:

  1. the bench sampler's TRUE hit-rate curve: fraction of fetched lanes
     whose hotness rank < C (ranks are exact for the synthetic graph via
     the generator's modular bijection, device_synthetic.py:48);
  2. primitive costs: cumsum over lanes, 1-D scatter compaction, flag
     sort, combined-table gather (hot prefix + per-step miss staging in
     ONE <=105MB physical array);
  3. end-to-end candidate pipelines vs the direct per-lane gather:
       A. direct T[ids] from the 586MB table      (production today)
       B. combined table: id<C -> row id; miss -> C + rank(cumsum),
          misses compacted by 1-D scatter, fetched from the big table,
          staged via dynamic_update_slice
       C. B with the compaction done by one flag sort instead
       D. oracle variant of B (precomputed routes/miss ids: pipeline
          floor if compaction were free)

Decision input for docs/DESIGN.md; run with the bench's graph shapes.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=3):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_400_000)
    ap.add_argument("--edges", type=int, default=120_000_000)
    ap.add_argument("--batch", type=int, default=8000)
    ap.add_argument("--hot-rows", type=int, default=330_000)
    ap.add_argument("--miss-cap", type=int, default=100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.data.device_synthetic import (_coprime,
                                                  synthesize_device_dataset)
    from legion_tpu.train import Trainer
    from legion_tpu.utils.layout import put_row_major

    V = args.nodes
    out = {"V": V, "E": args.edges}

    # ---- real sampled ids from the bench-shaped trainer ----
    ds = synthesize_device_dataset(num_nodes=V, num_edges=args.edges,
                                   feature_dim=100,
                                   batch_size=args.batch)
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(25, 10), batch_size=args.batch,
                              auto_compact=True, dedup="sort",
                              neighbor_window=64, dedup_last_hop=False),
        cache=CacheConfig(presample_steps=4),
        train=TrainConfig(model="graphsage", hidden_dim=256, epochs=1),
        mesh=MeshConfig.for_devices(1),
    )
    trainer = Trainer(ds, cfg)
    sampler = trainer.sampler_t
    seeds = jax.lax.dynamic_slice(trainer.train_bank[0], (0,),
                                  (args.batch,))
    b, _ = sampler.sample(trainer.graph_access, seeds, sampler.init_state(),
                          jax.random.PRNGKey(7))
    ids_np = np.asarray(b.node_ids)          # [ids_len] int32, -1 pad
    n_slots = int(b.node_ids.shape[0])
    valid = ids_np >= 0
    out["slots"] = n_slots
    out["valid_lanes"] = int(valid.sum())

    # hotness rank of vertex v: the generator draws dst = (rank*p) % V, so
    # rank(v) = v * p^-1 mod V — the EXACT popularity order the presample
    # hotness scan would recover
    p = _coprime(V)
    p_inv = pow(p, -1, V)
    ranks = (ids_np.astype(np.int64) * p_inv) % V
    ranks[~valid] = V  # pads never hit
    # hit-rate curve
    curve = {}
    for c in [100_000, 200_000, 330_000, 430_000, 600_000, 860_000,
              1_200_000]:
        curve[c] = round(float((ranks < c).sum() / max(valid.sum(), 1)), 4)
    out["hit_curve_by_hot_rows"] = curve

    C = args.hot_rows
    M = args.miss_cap
    out["hot_rows"] = C
    out["miss_cap"] = M
    out["combined_mb"] = (C + M) * 256 // 2 ** 20
    miss_lanes = int(((ranks >= C) & valid).sum())
    out["miss_lanes"] = miss_lanes

    # renumbered id stream: id == rank (hotness renumbering applied)
    rids = jnp.asarray(np.where(valid, ranks, V - 1).astype(np.int32))

    rng = np.random.default_rng(0)
    T_cold = put_row_major(jnp.asarray(
        rng.standard_normal((V, 128)), jnp.bfloat16))        # 586MB
    T_comb = put_row_major(jnp.asarray(
        rng.standard_normal((C + M, 128)), jnp.bfloat16))    # <=105MB

    # ---- primitives ----
    g = jax.jit(lambda t, i: t[i])
    t_direct = timeit(g, T_cold, rids)
    out["A_direct_ms"] = round(t_direct * 1e3, 2)
    out["A_ns_per_row"] = round(t_direct * 1e9 / n_slots, 2)

    t_comb = timeit(g, T_comb, jnp.clip(rids, 0, C + M - 1))
    out["combined_gather_ms"] = round(t_comb * 1e3, 2)
    out["combined_ns_per_row"] = round(t_comb * 1e9 / n_slots, 2)

    cumsum = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    t_cs = timeit(cumsum, rids >= C)
    out["cumsum_ms"] = round(t_cs * 1e3, 2)

    def scatter_compact(ids):
        miss = ids >= C
        rank = jnp.cumsum(miss.astype(jnp.int32)) - 1
        idx = jnp.where(miss, jnp.minimum(rank, M - 1), M)
        buf = jnp.zeros((M + 1,), jnp.int32).at[idx].set(
            ids, mode="drop", unique_indices=False)
        return buf[:M], rank

    t_sc = timeit(jax.jit(scatter_compact), rids)
    out["scatter_compact_ms"] = round(t_sc * 1e3, 2)

    def sort_compact(ids):
        key = jnp.where(ids >= C, ids, jnp.int32(2 ** 31 - 1))
        lanes = jnp.arange(ids.shape[0], dtype=jnp.int32)
        sk, sl = jax.lax.sort_key_val(key, lanes)
        return sk[:M], sl[:M]

    t_so = timeit(jax.jit(sort_compact), rids)
    out["sort_compact_ms"] = round(t_so * 1e3, 2)

    # ---- full pipelines ----
    def pipeline_scatter(T_comb, T_cold, ids):
        miss = ids >= C
        rank = jnp.cumsum(miss.astype(jnp.int32)) - 1
        idx = jnp.where(miss, jnp.minimum(rank, M - 1), M)
        miss_ids = jnp.zeros((M + 1,), jnp.int32).at[idx].set(
            ids, mode="drop")[:M]
        staged = T_cold[miss_ids]                       # [M,128] 8ns/row
        T_comb = jax.lax.dynamic_update_slice(T_comb, staged, (C, 0))
        route = jnp.where(miss, C + jnp.minimum(rank, M - 1),
                          jnp.minimum(ids, C - 1))
        return T_comb[route]

    t_B = timeit(jax.jit(pipeline_scatter), T_comb, T_cold, rids)
    out["B_split_scatter_ms"] = round(t_B * 1e3, 2)

    def pipeline_sort(T_comb, T_cold, ids):
        miss = ids >= C
        rank = jnp.cumsum(miss.astype(jnp.int32)) - 1
        key = jnp.where(miss, ids, jnp.int32(2 ** 31 - 1))
        miss_ids = jax.lax.sort(key)[:M]
        staged = T_cold[jnp.where(miss_ids < C + M, miss_ids, 0)]
        T_comb = jax.lax.dynamic_update_slice(T_comb, staged, (C, 0))
        route = jnp.where(miss, C + jnp.minimum(rank, M - 1),
                          jnp.minimum(ids, C - 1))
        return T_comb[route]

    # NOTE: sort order != rank order unless the sort is by (miss, lane) —
    # this variant is for COST measurement; the scatter variant is the
    # semantically correct one
    t_Csort = timeit(jax.jit(pipeline_sort), T_comb, T_cold, rids)
    out["C_split_sort_ms"] = round(t_Csort * 1e3, 2)

    # oracle: miss ids + routes precomputed host-side (free compaction)
    ranks_c = np.minimum(np.cumsum(ranks >= C) - 1, M - 1)
    route_np = np.where(ranks >= C, C + ranks_c,
                        np.minimum(ranks, C - 1)).astype(np.int32)
    miss_np = np.zeros(M, np.int32)
    mi = ranks[ranks >= C][:M].astype(np.int32)
    miss_np[:len(mi)] = mi
    route_dev = jnp.asarray(route_np)
    miss_dev = jnp.asarray(miss_np)

    def pipeline_oracle(T_comb, T_cold, route, miss_ids):
        staged = T_cold[miss_ids]
        T_comb = jax.lax.dynamic_update_slice(T_comb, staged, (C, 0))
        return T_comb[route]

    t_D = timeit(jax.jit(pipeline_oracle), T_comb, T_cold, route_dev,
                 miss_dev)
    out["D_split_oracle_ms"] = round(t_D * 1e3, 2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""A/B: direct per-lane feature gather vs unique-compacted gather.

Round-2/3 review asked for the last-hop feature gather to fetch each
UNIQUE row once (the reference's per-unique-node lookup,
cache_impl.cuh:239-272) instead of once per lane (2.2x amplification).
This harness measures both strategies as real on-chip programs at bench
shapes so the decision is data, not argument:

  A (production): rows = table[lane_ids]            -- N_lane row DMAs
  B (compacted):  sort lane_ids -> unique ids + lane->unique routing;
                  u_rows = table[unique_ids]        -- N_uniq row DMAs
                  rows   = u_rows[lane_to_uniq]     -- N_lane row DMAs (!)

The catch the amplification argument misses: the model consumes per-LANE
rows (the lane-aligned aggregation), so B must re-expand — and a row
gather's cost is per issued row, independent of table size and index
locality (docs/DESIGN.md primitive table). B therefore pays A's full
gather PLUS the dedup sorts plus the unique gather. B can only win where
rows are expensive enough to amortize routing (host-resident rows), which
is exactly the staged miss path, not the HBM path.

Prints one JSON line with both timings at bench shapes.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    # force a value fetch: block_until_ready alone can return before the
    # device queue drains on tunneled runtimes (see bench.py)
    def sync(o):
        import jax
        leaf = jax.tree.leaves(o)[0]
        np.asarray(leaf[(0,) * leaf.ndim])   # scalar fetch drains the queue
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-rows", type=int, default=2_400_000)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--prefix", type=int, default=110_592,
                    help="deduped prefix slots (seeds + hop-0 unique)")
    ap.add_argument("--lanes", type=int, default=1_025_920,
                    help="lane-aligned last-hop slots")
    ap.add_argument("--unique-frac", type=float, default=0.35,
                    help="distinct ids per lane block (bench: ~360k/1.03M)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    V, F = args.table_rows, args.width
    N = args.prefix + args.lanes
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, F)), jnp.bfloat16)
    # realistic id stream: prefix unique, lanes drawn from a hot subset
    pool = rng.choice(V, size=int(args.lanes * args.unique_frac),
                      replace=False)
    ids_np = np.concatenate([
        rng.choice(V, size=args.prefix, replace=False),
        rng.choice(pool, size=args.lanes)]).astype(np.int32)
    ids = jnp.asarray(ids_np)
    imax = np.iinfo(np.int32).max

    @jax.jit
    def direct(table, ids):
        return table[jnp.clip(ids, 0, V - 1)]

    @jax.jit
    def compacted(table, ids):
        # sort-unique over all slots, gather unique rows, route back
        lane = jnp.arange(N, dtype=jnp.int32)
        sk, sl = jax.lax.sort_key_val(ids, lane)
        first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        uidx = jnp.cumsum(first, dtype=jnp.int32) - 1     # run index
        # unique ids compacted to the front (static width N)
        ukey = jnp.where(first, uidx, imax)
        _, uids = jax.lax.sort_key_val(ukey, sk)
        u_rows = table[jnp.clip(uids, 0, V - 1)]          # N row DMAs :(
        # route: lane -> unique index
        lane_to_u = jnp.zeros((N,), jnp.int32).at[sl].set(uidx)
        return u_rows[lane_to_u]

    n_uniq = len(np.unique(ids_np))
    t_a = timeit(direct, table, ids)
    t_b = timeit(compacted, table, ids)

    # B's floor even with an oracle unique list (no sorts, gather n_uniq
    # then expand): unique gather + expand gather
    uids_np = np.unique(ids_np)
    u_pad = np.pad(uids_np, (0, N - len(uids_np))).astype(np.int32)
    u_pad_j = jnp.asarray(u_pad)
    route = jnp.asarray(
        np.searchsorted(uids_np, ids_np).astype(np.int32))

    @jax.jit
    def oracle(table, uids, route):
        u_rows = table[jnp.clip(uids[:len(uids_np)], 0, V - 1)]
        return u_rows[route]

    t_o = timeit(oracle, table, u_pad_j, route)

    print(json.dumps({
        "metric": "feature_gather_compact_ab",
        "shape": {"slots": N, "unique": int(n_uniq), "width": F,
                  "table_rows": V},
        "direct_ms": round(t_a * 1e3, 2),
        "compacted_ms": round(t_b * 1e3, 2),
        "compacted_oracle_ms": round(t_o * 1e3, 2),
        "direct_ns_per_row": round(t_a * 1e9 / N, 2),
        "verdict": "direct" if t_a <= min(t_b, t_o) else "compacted",
    }))


if __name__ == "__main__":
    main()

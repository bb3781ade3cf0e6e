"""Do VMEM-staged gathers / HBM gathers / sorts overlap on this chip?

Round-4 established "gathers do not overlap gathers" for two BIG-table
(HBM-regime) gathers. The split-table design's viability hinges on finer
structure: a <=105MB-table gather (XLA stages the table to VMEM, ~1.8
ns/row real) may ride a DIFFERENT path than the >128MB HBM row-DMA
gather (~8ns/row). This times each op alone and pairs of ops in one
program (independent operands, summed outputs so neither is DCE'd).
All numbers include one ~2.3ms dispatch constant; pairs vs singles
cancel it.
"""

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
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major

    N = 1_136_512
    M = 340_000
    rng = np.random.default_rng(0)
    T_big = put_row_major(jnp.asarray(
        rng.standard_normal((2_400_000, 128)), jnp.bfloat16))   # 586MB HBM
    T_fast = put_row_major(jnp.asarray(
        rng.standard_normal((430_000, 128)), jnp.bfloat16))     # 105MB
    ids_big = jnp.asarray(rng.integers(0, 2_400_000, M).astype(np.int32))
    ids_fast = jnp.asarray(rng.integers(0, 430_000, N).astype(np.int32))
    sort_keys = jnp.asarray(rng.integers(0, 2 ** 30, N).astype(np.int32))
    lanes = jnp.arange(N, dtype=jnp.int32)

    f_fast = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())
    f_big = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())
    f_sort = jax.jit(
        lambda k, l: jax.lax.sort_key_val(k, l)[1].astype(jnp.float32).sum())
    f_cumsum = jax.jit(
        lambda k: jnp.cumsum((k > 2 ** 29).astype(jnp.int32))[-1])

    out = {}
    out["fast_gather_ms"] = round(timeit(f_fast, T_fast, ids_fast) * 1e3, 2)
    out["big_gather_missfetch_ms"] = round(
        timeit(f_big, T_big, ids_big) * 1e3, 2)
    out["sort_ms"] = round(timeit(f_sort, sort_keys, lanes) * 1e3, 2)
    out["cumsum_ms"] = round(timeit(f_cumsum, sort_keys) * 1e3, 2)

    pairs = {
        "fast+big": jax.jit(lambda: f_fast(T_fast, ids_fast)
                            + f_big(T_big, ids_big)),
        "fast+sort": jax.jit(lambda: f_fast(T_fast, ids_fast)
                             + f_sort(sort_keys, lanes)),
        "big+sort": jax.jit(lambda: f_big(T_big, ids_big)
                            + f_sort(sort_keys, lanes)),
        "fast+big+sort+cumsum": jax.jit(
            lambda: f_fast(T_fast, ids_fast) + f_big(T_big, ids_big)
            + f_sort(sort_keys, lanes)
            + f_cumsum(sort_keys).astype(jnp.float32)),
    }
    for name, fn in pairs.items():
        out[f"pair_{name}_ms"] = round(timeit(fn) * 1e3, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

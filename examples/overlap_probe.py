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
    # value fetch, not block_until_ready: on tunneled runtimes the latter
    # returns before the device queue drains (see bench.py)
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major

    N = 1_136_512
    M = 340_000
    # T_big needs only to sit in the >128MB slow-gather regime (the curve
    # is flat 146MB-586MB, gather_curve.py), so 800k rows (195MB) keeps
    # the tunnel transfer tolerable; tables go up as bf16 bytes directly
    import ml_dtypes
    rng = np.random.default_rng(0)
    mk = lambda r: put_row_major(jnp.asarray(
        rng.standard_normal((r, 128)).astype(ml_dtypes.bfloat16)))
    R_BIG = 800_000
    T_big = mk(R_BIG)                                           # 195MB HBM
    T_fast = mk(430_000)                                        # 105MB
    ids_big = jnp.asarray(rng.integers(0, R_BIG, M).astype(np.int32))
    ids_fast = jnp.asarray(rng.integers(0, 430_000, N).astype(np.int32))
    sort_keys = jnp.asarray(rng.integers(0, 2 ** 30, N).astype(np.int32))
    lanes = jnp.arange(N, dtype=jnp.int32)
    jax.block_until_ready(T_fast)
    print("tables placed", flush=True)

    f_fast = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())
    f_big = jax.jit(lambda t, i: t[i].astype(jnp.float32).sum())
    f_sort = jax.jit(
        lambda k, l: jax.lax.sort_key_val(k, l)[1].astype(jnp.float32).sum())
    f_cumsum = jax.jit(
        lambda k: jnp.cumsum((k > 2 ** 29).astype(jnp.int32))[-1])

    out = {}

    def rec(name, fn, *args):
        out[name] = round(timeit(fn, *args) * 1e3, 2)
        print(f"{name}: {out[name]}", flush=True)

    rec("fast_gather_ms", f_fast, T_fast, ids_fast)
    rec("big_gather_missfetch_ms", f_big, T_big, ids_big)
    rec("sort_ms", f_sort, sort_keys, lanes)
    rec("cumsum_ms", f_cumsum, sort_keys)

    # operands passed as ARGUMENTS: closing over a 195MB table bakes it
    # into the HLO as a constant and the compile never finishes
    g2 = lambda t, i: t[i].astype(jnp.float32).sum()
    srt = lambda k, l: jax.lax.sort_key_val(k, l)[1].astype(
        jnp.float32).sum()
    pairs = {
        "fast+big": jax.jit(lambda tf, idf, tb, idb:
                            g2(tf, idf) + g2(tb, idb)),
        "big+sort": jax.jit(lambda tb, idb, k, l:
                            g2(tb, idb) + srt(k, l)),
        "fast+big+sort+cumsum": jax.jit(
            lambda tf, idf, tb, idb, k, l:
            g2(tf, idf) + g2(tb, idb) + srt(k, l)
            + jnp.cumsum((k > 2 ** 29).astype(jnp.int32))[-1].astype(
                jnp.float32)),
    }
    pair_args = {
        "fast+big": (T_fast, ids_fast, T_big, ids_big),
        "big+sort": (T_big, ids_big, sort_keys, lanes),
        "fast+big+sort+cumsum": (T_fast, ids_fast, T_big, ids_big,
                                 sort_keys, lanes),
    }
    for name, fn in pairs.items():
        rec(f"pair_{name}_ms", fn, *pair_args[name])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

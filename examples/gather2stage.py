"""Decompose compact_ab.py's oracle win: which stage is fast, and why?

Times, on the real chip:
  A  direct:        out = T[ids]                    (1.14M rows, 2.4M table)
  B  unique only:   u = T[uids]                     (433k sorted unique rows)
  C  expand only:   out = U[route]  (U a device ARG) (1.14M rows, 433k table)
  D  fused 2-stage: out = T[uids][route]            (in ONE program)
  E  fused same-N:  out = T[ids1m][route1m]         (first stage NOT unique)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    def sync(o):
        np.asarray(o[(0,) * o.ndim])
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major

    V, F, N, U = 2_400_000, 128, 1_136_512, 433_311
    rng = np.random.default_rng(0)
    T = put_row_major(jnp.asarray(rng.standard_normal((V, F)),
                                  jnp.bfloat16))
    ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    uids = jnp.asarray(np.sort(rng.choice(V, U, replace=False))
                       .astype(np.int32))
    route = jnp.asarray(rng.integers(0, U, N).astype(np.int32))
    Uarr = put_row_major(jnp.asarray(
        rng.standard_normal((U, F)), jnp.bfloat16))

    g = jax.jit(lambda t, i: t[i])
    two = jax.jit(lambda t, u, r: t[u][r])

    out = {
        "A_direct_ms": round(timeit(g, T, ids) * 1e3, 2),
        "B_unique_ms": round(timeit(g, T, uids) * 1e3, 2),
        "C_expand_arg_ms": round(timeit(g, Uarr, route) * 1e3, 2),
        "D_fused_ms": round(timeit(two, T, uids, route) * 1e3, 2),
        "E_fused_nonuniq_ms": round(
            timeit(two, T, ids[:U], route) * 1e3, 2),
    }
    out["note"] = ("D << A would mean XLA's second gather from an "
                   "in-program temp is cheaper than a param gather")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

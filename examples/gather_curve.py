"""Map row-gather cost vs TABLE size (rows/bytes) at fixed request count.

gather2stage.py showed a 2.6x per-row cliff between gathering from a
433k-row and a 2.4M-row row-major bf16 table (same 1.14M requests). This
sweeps table rows (and one wide-row point) to locate the cliff and
decide whether it is row-count- or byte-bound.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=2):
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

    N = 1_136_512
    rng = np.random.default_rng(0)
    g = jax.jit(lambda t, i: t[i])
    out = {"requests": N, "points": []}
    for rows, width in [(433_000, 128), (600_000, 128), (800_000, 128),
                        (1_000_000, 128), (1_300_000, 128),
                        (1_600_000, 128), (2_000_000, 128),
                        (2_400_000, 128), (1_000_000, 256),
                        (500_000, 256)]:
        T = put_row_major(jnp.asarray(
            rng.standard_normal((rows, width)), jnp.bfloat16))
        ids = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
        t = timeit(g, T, ids)
        out["points"].append({
            "rows": rows, "width": width,
            "mbytes": rows * width * 2 // 2 ** 20,
            "ms": round(t * 1e3, 2),
            "ns_per_row": round(t * 1e9 / N, 2)})
        del T, ids
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Does row-gather cost depend on the ADDRESS SPAN the ids touch?

compact_ab.py's oracle result (expand-gather from a 433k-row staging
table beating a direct gather from the 2.4M-row feature table, despite
issuing MORE rows) contradicts round-3's "table size irrelevant" note.
This probe gathers the SAME number of rows from one table while varying
the id RANGE: if narrow-range gathers are faster, hotness-ordering the
feature table (hot rows first) turns the sampler's power-law id stream
into a narrow-span gather for free.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax

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

    V, F, N = 2_400_000, 128, 1_136_512
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, F)), jnp.bfloat16)

    @jax.jit
    def g(table, ids):
        return table[ids]

    out = {"rows_gathered": N, "width": F, "table_rows": V, "spans": {}}
    for span in [100_000, 433_000, 1_000_000, 2_400_000]:
        ids = jnp.asarray(rng.integers(0, span, N).astype(np.int32))
        t = timeit(g, table, ids)
        out["spans"][str(span)] = {
            "ms": round(t * 1e3, 2),
            "ns_per_row": round(t * 1e9 / N, 2)}
    # sortedness control: same full-span ids, sorted
    ids_s = jnp.asarray(np.sort(rng.integers(0, V, N)).astype(np.int32))
    t = timeit(g, table, ids_s)
    out["full_span_sorted"] = {"ms": round(t * 1e3, 2),
                               "ns_per_row": round(t * 1e9 / N, 2)}
    # small standalone table control (oracle shape)
    small = jnp.asarray(rng.standard_normal((433_000, F)), jnp.bfloat16)
    ids2 = jnp.asarray(rng.integers(0, 433_000, N).astype(np.int32))
    t = timeit(g, small, ids2)
    out["small_table"] = {"ms": round(t * 1e3, 2),
                          "ns_per_row": round(t * 1e9 / N, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Micro-benchmarks for the hot primitives on the real chip.

Usage: python examples/microbench.py [suite ...]
Suites: gather overlap select forward sort

Every timed function returns a SCALAR that data-depends on all of its
work; timeit fetches the value because block_until_ready can return
before the device queue drains on this tunneled runtime.
"""

import sys
import time

import numpy as np


def timeit(fn, n=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn()
    float(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    float(out)
    return (time.time() - t0) / n


def suite_gather():
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major
    print("== gather: ns/row vs table size, width, dtype ==", flush=True)
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda t, i: t[i].sum(dtype=jnp.float32))
    for V, F, dt, N in [(2_400_000, 100, jnp.bfloat16, 1_250_000),
                        (2_400_000, 100, jnp.bfloat16, 449_000),
                        (449_000, 100, jnp.bfloat16, 1_250_000),
                        (120_000, 256, jnp.bfloat16, 200_000)]:
        tab = put_row_major(jnp.ones((V, F), dt))
        ids = jax.random.randint(key, (N,), 0, V, jnp.int32)
        t = timeit(lambda: f(tab, ids))
        print(f"  V={V:>9} F={F} {dt.__name__:>8} N={N:>9}: "
              f"{t*1e3:7.3f} ms = {t/N*1e9:5.2f} ns/row", flush=True)


def suite_locality():
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major
    print("== gather locality: id distribution over a [2.4M, 100] table ==",
          flush=True)
    V, F, N = 2_400_000, 100, 1_250_000
    key = jax.random.PRNGKey(0)
    tab = put_row_major(jnp.ones((V, F), jnp.bfloat16))
    f = jax.jit(lambda t, i: t[i].sum(dtype=jnp.float32))
    u = jax.random.uniform(key, (N,))
    cases = [
        ("uniform", jax.random.randint(key, (N,), 0, V, jnp.int32)),
        # hotness-renumbered power law: 80% of ids in the first 300k rows
        ("80/20 hot prefix", jnp.where(
            u < 0.8,
            jax.random.randint(jax.random.fold_in(key, 1), (N,), 0,
                               300_000, jnp.int32),
            jax.random.randint(jax.random.fold_in(key, 2), (N,), 0, V,
                               jnp.int32))),
        ("sorted uniform", jnp.sort(
            jax.random.randint(key, (N,), 0, V, jnp.int32))),
    ]
    for name, ids in cases:
        t = timeit(lambda: f(tab, ids))
        print(f"  {name:>18}: {t*1e3:7.3f} ms = {t/N*1e9:5.2f} ns/row",
              flush=True)


def suite_overlap():
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major
    print("== overlap: gather vs matmul vs both-in-one-program ==",
          flush=True)
    V, F, N = 2_400_000, 100, 1_250_000
    tab = put_row_major(jnp.ones((V, F), jnp.bfloat16))
    ids = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, V, jnp.int32)
    M = 4096
    a = jnp.ones((M, M), jnp.bfloat16)
    b = jnp.ones((M, M), jnp.bfloat16)

    g = jax.jit(lambda t, i: t[i].sum(dtype=jnp.float32))
    mm = jax.jit(lambda a, b: (a @ b).sum(dtype=jnp.float32))
    both = jax.jit(lambda t, i, a, b:
                   t[i].sum(dtype=jnp.float32)
                   + (a @ b).sum(dtype=jnp.float32))
    t_g = timeit(lambda: g(tab, ids))
    print(f"  gather      {t_g*1e3:.2f} ms", flush=True)
    t_m = timeit(lambda: mm(a, b))
    print(f"  matmul      {t_m*1e3:.2f} ms", flush=True)
    t_b = timeit(lambda: both(tab, ids, a, b))
    print(f"  one program {t_b*1e3:.2f} ms "
          f"(sum {1e3*(t_g+t_m):.2f}, overlap saves "
          f"{1e3*(t_g+t_m-t_b):.2f})", flush=True)


def suite_gather2():
    """Discriminate row-issue vs byte vs table-size scaling + 1-D rate."""
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major
    key = jax.random.PRNGKey(0)
    N = 1_250_000
    f = jax.jit(lambda t, i: t[i].sum(dtype=jnp.float32))
    print("== gather2: width/dtype/table sweep (N=1.25M) ==", flush=True)
    for V, F, dt in [(2_400_000, 48, jnp.bfloat16),
                     (1_200_000, 100, jnp.bfloat16),
                     (600_000, 100, jnp.bfloat16)]:
        tab = put_row_major(jnp.ones((V, F), dt))
        ids = jax.random.randint(key, (N,), 0, V, jnp.int32)
        t = timeit(lambda: f(tab, ids))
        print(f"  V={V:>9} F={F:>3} {dt.__name__:>8}: {t*1e3:7.3f} ms = "
              f"{t/N*1e9:5.2f} ns/row", flush=True)
    tab1 = jnp.ones((2_400_000,), jnp.int32)
    ids = jax.random.randint(key, (N,), 0, 2_400_000, jnp.int32)
    g1 = jax.jit(lambda t, i: t[i].sum(dtype=jnp.int32))
    t = timeit(lambda: g1(tab1, ids))
    print(f"  1-D int32 [2.4M]: {t*1e3:7.3f} ms = {t/N*1e9:5.2f} ns/elem",
          flush=True)


def suite_gsplit():
    """Do two/four concurrent gathers in one program pipeline against each
    other (parallel DMA streams)?"""
    import jax
    import jax.numpy as jnp
    from legion_tpu.utils.layout import put_row_major
    V, F, N = 2_400_000, 100, 1_250_000
    tab = put_row_major(jnp.ones((V, F), jnp.bfloat16))
    ids = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, V, jnp.int32)

    def full(t, i):
        return t[i].sum(dtype=jnp.float32)

    def halves(t, i):
        h = N // 2
        return t[i[:h]].sum(dtype=jnp.float32) + \
            t[i[h:]].sum(dtype=jnp.float32)

    def quarters(t, i):
        q = N // 4
        return sum(t[i[k * q:(k + 1) * q]].sum(dtype=jnp.float32)
                   for k in range(4))

    for name, fn in [("1 gather", full), ("2 gathers", halves),
                     ("4 gathers", quarters)]:
        f = jax.jit(fn)
        t = timeit(lambda: f(tab, ids))
        print(f"  {name:>10}: {t*1e3:7.3f} ms", flush=True)


def suite_overlap2():
    """Why does the real step not overlap? Test shard_map wrapping,
    collectives, and op-chain length against the known-good gather+matmul
    overlap."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from legion_tpu.utils.layout import put_row_major
    try:
        from jax import shard_map as _sm

        def shmap(f, mesh, i, o):
            return _sm(f, mesh=mesh, in_specs=i, out_specs=o)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm

        def shmap(f, mesh, i, o):
            return _sm(f, mesh=mesh, in_specs=i, out_specs=o)

    V, F, N = 2_400_000, 100, 1_250_000
    tab = put_row_major(jnp.ones((V, F), jnp.bfloat16))
    ids = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, V, jnp.int32)
    M = 4096
    a = jnp.ones((M, M), jnp.bfloat16)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("clique", "member"))

    def work(t, i, a):
        g = t[i].sum(dtype=jnp.float32)
        mm = (a @ a).sum(dtype=jnp.float32)
        return g + mm

    def work_psum(t, i, a):
        g = jax.lax.psum(t[i].sum(dtype=jnp.float32),
                         ("clique", "member"))
        mm = jax.lax.psum((a @ a).sum(dtype=jnp.float32),
                          ("clique", "member"))
        return g + mm

    def work_chain(t, i, a):
        g = t[i].sum(dtype=jnp.float32)
        h = jnp.ones((8000, 256), jnp.bfloat16)
        w = jnp.ones((256, 256), jnp.bfloat16)
        for _ in range(30):
            h = h @ w
        return g + h.sum(dtype=jnp.float32)

    cases = [
        ("plain jit g+mm", jax.jit(work)),
        ("shard_map g+mm", jax.jit(shmap(work, mesh, (P(), P(), P()),
                                         P()))),
        ("shard_map+psum", jax.jit(shmap(work_psum, mesh,
                                         (P(), P(), P()), P()))),
        ("g + 30-matmul chain", jax.jit(work_chain)),
    ]
    for name, f in cases:
        t = timeit(lambda: f(tab, ids, a))
        print(f"  {name:>20}: {t*1e3:7.3f} ms", flush=True)


def suite_select():
    import jax
    import jax.numpy as jnp
    print("== windowed in-block pick variants ==", flush=True)
    F, fo, W = 112_704, 10, 64
    key = jax.random.PRNGKey(0)
    rows = jax.random.randint(key, (F, W), 0, 2_400_000, jnp.int32)
    off = jax.random.randint(key, (F, fo), 0, W, jnp.int32)

    def onehot(rows, off):
        sel = off[..., None] == jnp.arange(W, dtype=jnp.int32)
        return jnp.sum(jnp.where(sel, rows[:, None, :], 0), axis=-1,
                       dtype=jnp.int32)

    def onehot_dot(rows, off):
        # f32 one-hot matmul on the MXU: ids < 2**24 are exact in f32
        sel = (off[..., None] == jnp.arange(W, dtype=jnp.int32)
               ).astype(jnp.float32)
        r = jnp.einsum("fkw,fw->fk", sel, rows.astype(jnp.float32))
        return r.astype(jnp.int32)

    def take_along(rows, off):
        return jnp.take_along_axis(rows, off, axis=1)

    def bitshift(rows, off):
        # pick via 2-level select: W=64 -> 8x8 tree of where()
        r8 = rows.reshape(F, 8, 8)
        hi = off >> 3
        lo = off & 7
        sel_hi = hi[..., None] == jnp.arange(8, dtype=jnp.int32)
        g8 = jnp.sum(jnp.where(sel_hi[..., None], r8[:, None], 0), axis=2,
                     dtype=jnp.int32)          # [F, fo, 8]
        sel_lo = lo[..., None] == jnp.arange(8, dtype=jnp.int32)
        return jnp.sum(jnp.where(sel_lo, g8, 0), axis=-1, dtype=jnp.int32)

    ref = np.asarray(jax.jit(onehot)(rows, off))
    for name, fn in [("onehot(sum)", onehot), ("onehot(dot)", onehot_dot),
                     ("take_along_axis", take_along),
                     ("two-level 8x8", bitshift)]:
        f = jax.jit(lambda r, o, fn=fn: fn(r, o).sum(dtype=jnp.float32))
        fv = jax.jit(fn)
        ok = bool((np.asarray(fv(rows, off)) == ref).all())
        t = timeit(lambda: f(rows, off))
        print(f"  {name:>16}: {t*1e3:7.3f} ms  correct={ok}", flush=True)


def suite_forward():
    import jax
    import jax.numpy as jnp
    print("== forward bisect (bench shapes) ==", flush=True)
    S2, S1, B = 1_247_744, 120_704, 8000
    E1, fo1 = 1_127_040, 10
    E0 = 200_000
    d_in, d_h = 100, 256
    key = jax.random.PRNGKey(0)
    x = jnp.ones((S2, d_in), jnp.bfloat16)
    w = jnp.ones((d_in, d_h), jnp.float32)
    w2 = jnp.ones((d_h, 47), jnp.float32)
    src0 = jax.random.randint(key, (E0,), 0, S1, jnp.int32)
    h = jnp.ones((S1, d_h), jnp.bfloat16)

    def agg1(x):
        msgs = jax.lax.slice(x, (S1, 0), (S1 + E1, d_in))
        msgs = msgs.reshape(E1 // fo1, fo1, d_in)
        return jnp.sum(msgs, axis=(0, 1, 2), dtype=jnp.float32)

    steps = [
        ("layer1 masked mean (slice+reshape+sum)",
         jax.jit(agg1), (x,)),
        ("layer1 matmul [S1,100]@[100,256]",
         jax.jit(lambda x, w: (x[:S1] @ w).sum(dtype=jnp.float32)),
         (x, w)),
        ("layer2 row gather [200k,256]",
         jax.jit(lambda h, s: h[jnp.clip(s, 0, S1 - 1)].sum(
             dtype=jnp.float32)), (h, src0)),
        ("layer2 gather bwd (scatter-add 200k rows)",
         jax.jit(lambda h, s, g=jnp.ones((E0, d_h), jnp.float32):
                 jnp.zeros((S1, d_h), jnp.float32).at[
                     jnp.clip(s, 0, S1 - 1)].add(g).sum(
                     dtype=jnp.float32)), (h, src0)),
        ("dropout [S1,256]",
         jax.jit(lambda h, k: jnp.where(
             jax.random.bernoulli(k, 0.5, h.shape), h / 0.5, 0).sum(
             dtype=jnp.float32)), (h, jax.random.PRNGKey(1))),
        ("layer2 matmul [8000,256]@[256,47]",
         jax.jit(lambda h, w2: (h[:B] @ w2).sum(dtype=jnp.float32)),
         (h, w2)),
    ]
    for name, f, args in steps:
        t = timeit(lambda: f(*args))
        print(f"  {name:>42}: {t*1e3:7.3f} ms", flush=True)


def suite_agg():
    import jax
    import jax.numpy as jnp
    print("== fanout-mean variants ==", flush=True)
    F, fo, d = 112_704, 10, 100
    E = F * fo
    x = jnp.ones((E, d), jnp.bfloat16)

    def reshape_sum(x):
        return jnp.sum(x.reshape(F, fo, d), axis=1, dtype=jnp.float32)

    def strided_acc(x):
        acc = jax.lax.slice(x, (0, 0), (E, d), (fo, 1)).astype(jnp.float32)
        for j in range(1, fo):
            acc = acc + jax.lax.slice(x, (j, 0), (E, d), (fo, 1))
        return acc

    def matvec(x):
        ones = jnp.ones((fo,), jnp.float32)
        return jax.lax.dot_general(
            x.reshape(F, fo, d).astype(jnp.float32), ones,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for name, fn in [("reshape+sum(axis=1)", reshape_sum),
                     ("strided-slice acc", strided_acc),
                     ("dot_general ones", matvec)]:
        f = jax.jit(lambda x, fn=fn: fn(x).sum(dtype=jnp.float32))
        t = timeit(lambda: f(x))
        print(f"  {name:>20}: {t*1e3:7.3f} ms", flush=True)

    print("== fanout-mean fwd+bwd (through gather) ==", flush=True)
    S1 = 120_704

    def fb(fn):
        def loss(h, x):
            return fn(x).sum(dtype=jnp.float32) + h.sum(dtype=jnp.float32)
        g = jax.grad(loss, argnums=1)
        return jax.jit(lambda h, x: g(h, x).sum(dtype=jnp.float32))

    h = jnp.ones((S1, d), jnp.bfloat16)
    for name, fn in [("reshape+sum", reshape_sum),
                     ("strided-slice", strided_acc)]:
        f = fb(fn)
        t = timeit(lambda: f(h, x))
        print(f"  bwd {name:>16}: {t*1e3:7.3f} ms", flush=True)


def suite_scatter():
    import jax
    import jax.numpy as jnp
    print("== layer-2 backward scatter-add variants ==", flush=True)
    E, S1 = 200_000, 120_704
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (E,), 0, S1, jnp.int32)
    idx_sorted = jnp.sort(idx)
    for d in (256, 47):
        g = jnp.ones((E, d), jnp.float32)
        f = jax.jit(lambda i, g, d=d: jnp.zeros((S1, d), jnp.float32).at[
            i].add(g).sum(dtype=jnp.float32))
        t = timeit(lambda: f(idx, g))
        print(f"  scatter-add [{E},{d}] unsorted: {t*1e3:7.3f} ms",
              flush=True)
        t = timeit(lambda: f(idx_sorted, g))
        print(f"  scatter-add [{E},{d}]   sorted: {t*1e3:7.3f} ms",
              flush=True)


def suite_sort():
    import jax
    import jax.numpy as jnp
    print("== sort costs ==", flush=True)
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, is_stable=True)[
        1].sum(dtype=jnp.float32))
    for M in (208_000, 1_250_000):
        k = jax.random.randint(key, (M,), 0, 2_400_000, jnp.int32)
        v = jnp.arange(M, dtype=jnp.int32)
        t = timeit(lambda: f(k, v))
        print(f"  stable sort_key_val M={M:>9}: {t*1e3:7.3f} ms = "
              f"{t/M*1e9:5.2f} ns/elem", flush=True)


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    suites = sys.argv[1:] or ["gather", "overlap", "select", "forward",
                              "sort"]
    for s in suites:
        globals()[f"suite_{s}"]()

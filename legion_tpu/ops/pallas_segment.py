"""Pallas TPU kernels for the two row-issue-bound hot ops: random row
gather and duplicate-heavy segment-sum (scatter-add).

Status: EXPERIMENTAL — measured on the target chip (TPU v5e) these do NOT
beat the XLA lowerings at bench shapes, so the production paths
(ops/segment.py, ops/hop_agg.py) keep the XLA forms; measurements in
docs/DESIGN.md "Performance design notes". The kernels are kept (a) as the
measurement harness backing that decision, (b) because per-row DMA issue
rates are hardware-generation-specific — re-run `benchmark()` on new chips.

Reference parity: the hand-written CUDA hot kernels these correspond to are
multiGPU_feat_cache_lookup (cache_impl.cuh:239-272; per-(node, element)
strided gather) and the aggregation consumed by DGL's SpMM in the trainers.

Run `python -m legion_tpu.ops.pallas_segment` on a chip to print the
comparison table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


# ---------------------------------------------------------------------------
# Row gather: out[i] = table[ids[i]]
# ---------------------------------------------------------------------------

def gather_rows_pallas(table: jax.Array, ids: jax.Array,
                       chunk: int = 1024, window: int = 8) -> jax.Array:
    """Row gather via explicit per-row async DMAs, `window` in flight.

    table: [V, F] (F a multiple of 128 for clean tiling), ids: [N] int32.
    Grid step g owns ids[g*chunk:(g+1)*chunk]; the id slice is DMA'd to
    SMEM, then each row rides its own HBM->VMEM copy into the output
    block with a rotating semaphore window (the double-buffering pattern
    from the Pallas guide, generalized to depth `window`)."""
    pl, pltpu = _pl()
    N = ids.shape[0]
    V, F = table.shape
    assert N % chunk == 0, (N, chunk)

    def kernel(ids_ref, table_ref, out_ref, sems):
        def inner(smem_ids, id_sem):
            g = pl.program_id(0)
            cp = pltpu.make_async_copy(
                ids_ref.at[pl.ds(g * chunk, chunk)], smem_ids, id_sem)
            cp.start()
            cp.wait()

            def get_dma(j):
                row = smem_ids[j]
                safe = jnp.clip(row, 0, V - 1)
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(safe, 1), :],
                    out_ref.at[pl.ds(j, 1), :],
                    sems.at[j % window])

            for j in range(window):
                get_dma(j).start()

            def body(j, _):
                get_dma(j).wait()

                @pl.when(j + window < chunk)
                def _():
                    get_dma(j + window).start()
                return 0

            jax.lax.fori_loop(0, chunk, body, 0, unroll=4)

        pl.run_scoped(inner,
                      smem_ids=pltpu.SMEM((chunk,), jnp.int32),
                      id_sem=pltpu.SemaphoreType.DMA(()))

    out = pl.pallas_call(
        kernel,
        grid=(N // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((chunk, F), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((window,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table)
    return jnp.where((ids >= 0)[:, None], out, 0)


# ---------------------------------------------------------------------------
# Segment-sum: out[s] += data[e] for seg[e] == s  (duplicate-heavy)
# ---------------------------------------------------------------------------

def segment_sum_pallas(data: jax.Array, seg: jax.Array, num_segments: int,
                       chunk: int = 2048) -> jax.Array:
    """Scatter-add with the accumulator held in VMEM across grid steps.

    data: [E, F] (F multiple of 128), seg: [E] int32 (-1 dropped).
    The output block maps to the SAME [S, F] region for every grid step,
    so it stays resident in VMEM and each step accumulates its chunk —
    sized for S*F*4 <= a few MB (layer-2 backward shapes)."""
    pl, pltpu = _pl()
    E, F = data.shape
    assert E % chunk == 0

    def kernel(seg_ref, data_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(e, _):
            s = seg_ref[e]

            @pl.when(s >= 0)
            def _():
                out_ref[pl.ds(s, 1), :] += data_ref[pl.ds(e, 1), :]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=4)

    return pl.pallas_call(
        kernel,
        grid=(E // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda g: (g,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((chunk, F), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((num_segments, F), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_segments, F), jnp.float32),
    )(seg, data)


# ---------------------------------------------------------------------------
# Benchmark harness (run on a real chip)
# ---------------------------------------------------------------------------

def benchmark():  # pragma: no cover - requires TPU
    import time

    def timeit(fn, n=10, warm=3):
        out = None
        for _ in range(warm):
            out = fn()
        jax.block_until_ready(out)
        float(jnp.asarray(out).sum()) if hasattr(out, "sum") else None
        t0 = time.time()
        for _ in range(n):
            out = fn()
        float(jnp.asarray(out).sum())
        return (time.time() - t0) / n

    key = jax.random.PRNGKey(0)
    V, F, N = 2_400_000, 128, 1_247_232
    table = jnp.ones((V, F), jnp.bfloat16)
    ids = jax.random.randint(key, (N,), 0, V, jnp.int32)
    xla_g = jax.jit(lambda t, i: t[jnp.clip(i, 0, V - 1)])
    pls_g = jax.jit(partial(gather_rows_pallas))
    t_x = timeit(lambda: xla_g(table, ids))
    print(f"gather  XLA    : {t_x*1e3:7.2f} ms = {t_x/N*1e9:5.2f} ns/row")
    t_p = timeit(lambda: pls_g(table, ids))
    print(f"gather  Pallas : {t_p*1e3:7.2f} ms = {t_p/N*1e9:5.2f} ns/row")

    E, S, Fs = 200_704, 8192, 128
    datax = jnp.ones((E, Fs), jnp.float32)
    seg = jax.random.randint(key, (E,), 0, S, jnp.int32)
    xla_s = jax.jit(lambda d, s: jnp.zeros((S, Fs), jnp.float32).at[s].add(d))
    pls_s = jax.jit(partial(segment_sum_pallas, num_segments=S))
    t_x = timeit(lambda: xla_s(datax, seg))
    print(f"segsum  XLA    : {t_x*1e3:7.2f} ms = {t_x/E*1e9:5.2f} ns/row")
    t_p = timeit(lambda: pls_s(datax, seg))
    print(f"segsum  Pallas : {t_p*1e3:7.2f} ms = {t_p/E*1e9:5.2f} ns/row")


if __name__ == "__main__":  # pragma: no cover
    benchmark()

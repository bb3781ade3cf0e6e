"""In-program phase decomposition of the fused train step (real chip).

Each program is a PREFIX of the production step (sample -> fetch ->
forward -> backward -> update), jitted whole, loss/output value-fetched.
Phase cost = delta between consecutive prefixes — unlike timing the
pieces as separate programs, every prefix keeps the producer/consumer
fusion and layouts of the real step, so the deltas attribute the real
step's time. All absolute numbers include one ~2.3ms dispatch constant;
deltas cancel it.

Usage: python examples/phase_decomp.py [--headroom 1.1]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=3):
    print("  compiling...", flush=True)
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.time() - t0) / n


def jax_leaf(out):
    import jax
    return jax.tree.leaves(out)[0].ravel()[0:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--headroom", type=float, default=1.1)
    ap.add_argument("--presample", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.data.device_synthetic import synthesize_device_dataset
    from legion_tpu.train import Trainer, _masked_ce

    ds = synthesize_device_dataset(batch_size=8000)
    jax.block_until_ready(ds.features)
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(25, 10), batch_size=8000,
                              auto_compact=True, dedup="sort",
                              neighbor_window=64, dedup_last_hop=False,
                              cap_headroom=args.headroom),
        cache=CacheConfig(presample_steps=args.presample),
        train=TrainConfig(model="graphsage", hidden_dim=256, epochs=1),
        mesh=MeshConfig.for_devices(1))
    print("building trainer...", flush=True)
    t = Trainer(ds, cfg)
    print("trainer built", flush=True)
    state = t.init_state()
    sampler, model, tx = t.sampler_t, t.model_t, t.tx
    bs = cfg.sampler.batch_size
    out = {"headroom": args.headroom, "caps": t.compact_caps,
           "max_ids": sampler.max_ids}

    seeds = jax.lax.dynamic_slice(t.train_bank[0], (0,), (bs,))
    y = jax.lax.dynamic_slice(t.train_ybank[0], (0,), (bs,))
    pos_map = jnp.full((sampler.state_size,), np.iinfo(np.int32).max,
                       jnp.int32)
    key = jax.random.PRNGKey(3)
    params, opt_state = state["params"], state["opt_state"]
    access, fsource = t.graph_access, t.feature_source

    def p_sample(access, seeds, pm, key):
        b, pm = sampler.sample_fn(access, seeds, pm, key)
        return b.node_ids

    def p_fetch(access, fsource, seeds, pm, key):
        b, pm = sampler.sample_fn(access, seeds, pm, key)
        nid = jax.lax.slice(b.node_ids, (0,), (sampler.max_ids,))
        x, _ = fsource.fetch(nid)
        return x

    def p_fwd(params, access, fsource, seeds, y, pm, key):
        b, pm = sampler.sample_fn(access, seeds, pm, key)
        nid = jax.lax.slice(b.node_ids, (0,), (sampler.max_ids,))
        x, _ = fsource.fetch(nid)
        logits = model.apply(params, x, b, train=True,
                             rng=jax.random.fold_in(key, 7))
        return _masked_ce(logits, y, seeds >= 0)

    def p_bwd(params, access, fsource, seeds, y, pm, key):
        b, pm = sampler.sample_fn(access, seeds, pm, key)
        nid = jax.lax.slice(b.node_ids, (0,), (sampler.max_ids,))
        x, _ = fsource.fetch(nid)

        def loss_fn(p):
            logits = model.apply(p, x, b, train=True,
                                 rng=jax.random.fold_in(key, 7))
            return _masked_ce(logits, y, seeds >= 0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # RETURN the grads: a loss-only output lets XLA DCE the whole
        # backward pass (first version of this harness measured bwd==fwd)
        return loss, grads

    def p_full(params, opt_state, access, fsource, seeds, y, pm, key):
        b, pm = sampler.sample_fn(access, seeds, pm, key)
        nid = jax.lax.slice(b.node_ids, (0,), (sampler.max_ids,))
        x, _ = fsource.fetch(nid)

        def loss_fn(p):
            logits = model.apply(p, x, b, train=True,
                                 rng=jax.random.fold_in(key, 7))
            return _masked_ce(logits, y, seeds >= 0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, opt_state

    def rec(name, ms):
        out[name] = round(ms, 2)
        print(f"{name}: {out[name]}", flush=True)

    rec("sample_ms", timeit(jax.jit(p_sample), access, seeds, pos_map,
                            key) * 1e3)
    rec("fetch_ms", timeit(jax.jit(p_fetch), access, fsource, seeds,
                           pos_map, key) * 1e3)
    rec("fwd_ms", timeit(jax.jit(p_fwd), params, access, fsource, seeds,
                         y, pos_map, key) * 1e3)
    rec("bwd_ms", timeit(jax.jit(p_bwd), params, access, fsource, seeds,
                         y, pos_map, key) * 1e3)
    rec("full_ms", timeit(jax.jit(p_full), params, opt_state, access,
                          fsource, seeds, y, pos_map, key) * 1e3)

    # production dispatch-pipelined step for reference
    for _ in range(3):
        state, loss = t.train_step(state)
    float(loss)
    t0 = time.time()
    for _ in range(15):
        state, loss = t.train_step(state)
    float(loss)
    rec("prod_step_ms", (time.time() - t0) / 15 * 1e3)
    b, _ = sampler.sample(t.graph_access, seeds, sampler.init_state(),
                          jax.random.PRNGKey(1))
    out["valid_edges"] = int(np.asarray(b.num_edges).sum())
    out["edges_per_s_M"] = round(
        out["valid_edges"] / (out["prod_step_ms"] / 1e3) / 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

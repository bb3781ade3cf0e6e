"""Break the fused train step into parts and time each on the real chip.

Usage: python examples/profile_step.py [--nodes N --edges E ...]
Times, per part: sampler only, sampler+feature gather, full fused step;
plus forward-only and fwd+bwd with a fixed batch (no sampling).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=2):
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
    ap.add_argument("--feature-dim", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8000)
    ap.add_argument("--fanouts", type=int, nargs="+", default=[25, 10])
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--dedup", default="map", choices=["map", "sort"])
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--exact-dedup", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.data.device_synthetic import synthesize_device_dataset
    from legion_tpu.sampling import NeighborSampler
    from legion_tpu.train import Trainer

    ds = synthesize_device_dataset(
        num_nodes=args.nodes, num_edges=args.edges,
        feature_dim=args.feature_dim, batch_size=args.batch)
    jax.block_until_ready(ds.features)

    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=tuple(args.fanouts),
                              batch_size=args.batch, auto_compact=True,
                              dedup=args.dedup,
                              neighbor_window=args.window,
                              dedup_last_hop=args.exact_dedup),
        cache=CacheConfig(presample_steps=4),
        train=TrainConfig(model="graphsage", hidden_dim=args.hidden,
                          epochs=1),
        mesh=MeshConfig.for_devices(1),
    )
    trainer = Trainer(ds, cfg)
    state = trainer.init_state()
    print("node_caps:", trainer.compact_caps)
    sampler = trainer.sampler_t
    print("frontier_sizes:", sampler.frontier_sizes)
    print("edge_sizes:", sampler.edge_sizes)
    print("cum_caps:", sampler.cum_caps, "max_ids:", sampler.max_ids,
          "ids_len:", sampler.ids_len)

    # full fused step (state is donated -> thread it)
    for _ in range(3):
        state, loss = trainer.train_step(state)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(10):
        state, loss = trainer.train_step(state)
    jax.block_until_ready(loss)
    t_full = (time.time() - t0) / 10
    print(f"full step           : {t_full*1e3:8.2f} ms")

    # sampler only
    seeds = jax.lax.dynamic_slice(trainer.train_bank[0], (0,),
                                  (args.batch,))
    pos_map = jnp.full((sampler.state_size,), np.iinfo(np.int32).max,
                       jnp.int32)

    @jax.jit
    def sample_only(access, sd, pm, key):
        b, pm = sampler.sample_fn(access, sd, pm, key)
        return b, pm

    t_s = timeit(lambda: sample_only(trainer.graph_access, seeds, pos_map,
                                     jax.random.PRNGKey(3)), n=10)
    print(f"sampler only        : {t_s*1e3:8.2f} ms")

    @jax.jit
    def sample_gather(access, fsource, sd, pm, key):
        b, pm = sampler.sample_fn(access, sd, pm, key)
        x, _ = fsource.fetch(b.node_ids)
        return x, pm

    t_sg = timeit(lambda: sample_gather(
        trainer.graph_access, trainer.feature_source, seeds, pos_map,
        jax.random.PRNGKey(3)), n=10)
    print(f"sampler + gather    : {t_sg*1e3:8.2f} ms "
          f"(gather ~{(t_sg-t_s)*1e3:.2f} ms)")

    # fixed batch fwd / fwd+bwd
    batch, _ = sample_only(trainer.graph_access, seeds, pos_map,
                           jax.random.PRNGKey(3))
    x, _ = jax.jit(lambda fs, b: fs.fetch(b.node_ids))(
        trainer.feature_source, batch)
    model = trainer.model_t
    params = state["params"]
    import optax

    y = jnp.zeros((args.batch,), jnp.int32)

    @jax.jit
    def fwd(p, x, b):
        return model.apply(p, x, b, train=True, rng=jax.random.PRNGKey(5))

    t_f = timeit(fwd, params, x, batch, n=10)
    print(f"forward only        : {t_f*1e3:8.2f} ms")

    @jax.jit
    def fwdbwd(p, x, b):
        def loss_fn(p):
            logits = model.apply(p, x, b, train=True,
                                 rng=jax.random.PRNGKey(5))
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.mean(ce)
        l, g = jax.value_and_grad(loss_fn)(p)
        return l, g

    t_fb = timeit(fwdbwd, params, x, batch, n=10)
    print(f"forward+backward    : {t_fb*1e3:8.2f} ms")
    print(f"residual (opt+misc) : {(t_full - t_s - (t_sg-t_s) - t_fb)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

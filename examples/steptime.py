"""In-context A/B of fused-step implementation choices, one process.

Builds the bench-shape Trainer once per arm and times train_step over N
steps (loss value-fetched). Arms toggle module-level implementation
switches, so each arm is exactly the production step with ONE change.

Usage: python examples/steptime.py [arm ...]
Arms: base aggsum nozero
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_trainer():
    import jax
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.data.device_synthetic import synthesize_device_dataset
    from legion_tpu.train import Trainer
    ds = synthesize_device_dataset(batch_size=8000)
    jax.block_until_ready(ds.features)
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(25, 10), batch_size=8000,
                              auto_compact=True, dedup="sort",
                              neighbor_window=64, dedup_last_hop=False),
        cache=CacheConfig(presample_steps=4),
        train=TrainConfig(model="graphsage", hidden_dim=256, epochs=1),
        mesh=MeshConfig.for_devices(1))
    return Trainer(ds, cfg)


def time_steps(trainer, n=20, warm=3):
    state = trainer.init_state()
    for _ in range(warm):
        state, loss = trainer.train_step(state)
    float(loss)
    t0 = time.time()
    for _ in range(n):
        state, loss = trainer.train_step(state)
    float(loss)
    return (time.time() - t0) / n


def main():
    arms = sys.argv[1:] or ["base", "aggsum"]
    import jax.numpy as jnp
    from legion_tpu.ops import hop_agg

    orig_sum = hop_agg.hop_neighbor_sum

    def patched_sum_where(h_src, src_l, fanout, offset, num_dst,
                          aligned_offset=None):
        msgs, valid = hop_agg.hop_gather_msgs(h_src, src_l, fanout,
                                              aligned_offset)
        acc = jnp.float32 if msgs.dtype == jnp.bfloat16 else msgs.dtype
        msum = jnp.sum(jnp.where(valid[..., None], msgs, 0), axis=1,
                       dtype=acc)
        cnt = jnp.sum(valid, axis=1).astype(acc)
        return hop_agg.place_rows(msum, offset, num_dst), \
            hop_agg.place_rows(cnt, offset, num_dst)

    for arm in arms:
        if arm == "base":
            hop_agg.hop_neighbor_sum = orig_sum
        elif arm == "aggsum":
            hop_agg.hop_neighbor_sum = patched_sum_where
        else:
            raise SystemExit(f"unknown arm {arm}")
        # models import hop_neighbor_mean which calls hop_neighbor_sum
        # through the module, so the patch is live
        tr = build_trainer()
        dt = time_steps(tr)
        print(f"arm {arm:>8}: {dt*1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

"""Isolate the production-step overhead over the bare prefix program.

phase_decomp.py measured the full sample->fetch->fwd->bwd->update prefix
at ~15.1ms real while the production train_step runs ~20.5ms. Candidates
for the ~5ms gap: the per-step counters (_counters: valid-slot sum +
topology-hit count), the shard_map wrapper, donation, python dispatch
plumbing in Trainer.train_step. Times each variant the same way.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
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
    t = Trainer(ds, cfg)
    state = t.init_state()
    out = {}

    def rec(name, ms):
        out[name] = round(ms, 2)
        print(f"{name}: {out[name]}", flush=True)

    # 1. production wrapper (trainer.train_step), async pipelined
    for _ in range(3):
        state, loss = t.train_step(state)
    float(loss)
    t0 = time.time()
    for _ in range(15):
        state, loss = t.train_step(state)
    float(loss)
    rec("prod_wrapper_ms", (time.time() - t0) / 15 * 1e3)

    # 2. the SAME compiled step called directly in a tight loop (no
    # Trainer.train_step python plumbing)
    f = t._train_step
    args = lambda s: (s["params"], s["opt_state"], s["pos_map"],
                      s["train_ctr"], s["base_key"], t.train_bank,
                      t.graph_access, t.feature_source, t.member_rows,
                      t.topo_pairs, t.topo_blocks, t.train_ybank)
    o = f(*args(state))
    state2 = dict(state, params=o[0], opt_state=o[1], pos_map=o[2],
                  train_ctr=o[3])
    float(o[4])
    p, os_, pm, ctr = o[0], o[1], o[2], o[3]
    t0 = time.time()
    for _ in range(15):
        o = f(p, os_, pm, ctr, state["base_key"], t.train_bank,
              t.graph_access, t.feature_source, t.member_rows,
              t.topo_pairs, t.topo_blocks, t.train_ybank)
        p, os_, pm, ctr = o[0], o[1], o[2], o[3]
    float(o[4])
    rec("direct_jit_ms", (time.time() - t0) / 15 * 1e3)

    # 3. serialized (value-fetch every step): pure device time + 1 dispatch
    o = f(p, os_, pm, ctr, state["base_key"], t.train_bank,
          t.graph_access, t.feature_source, t.member_rows, t.topo_pairs,
          t.topo_blocks, t.train_ybank)
    p, os_, pm, ctr = o[0], o[1], o[2], o[3]
    float(o[4])
    t0 = time.time()
    for _ in range(10):
        o = f(p, os_, pm, ctr, state["base_key"], t.train_bank,
              t.graph_access, t.feature_source, t.member_rows,
              t.topo_pairs, t.topo_blocks, t.train_ybank)
        p, os_, pm, ctr = o[0], o[1], o[2], o[3]
        float(o[4])
    rec("serialized_ms", (time.time() - t0) / 10 * 1e3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Arbitrary-hop generality: 3-hop sampling + training + staged chain.

The reference hardcodes 2 hops, fanout [25,10] (main.cu:9-11); this
rebuild claims arbitrary hop counts — the op factory's `(hop_num+1)*3+1`
layout (server.cu:201-211) generalized. These tests pin that claim with
a [15,10,5] 3-hop configuration across the fused path, the aligned last
hop, the measured-caps path, and the staged host-feature pipeline.
"""

import jax
import numpy as np
import pytest

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                               SamplerConfig, TrainConfig)
from legion_tpu.pipeline import Mode
from legion_tpu.sampling import NeighborSampler
from legion_tpu.train import Trainer


def _cfg(ds, cache=None, **skw):
    base = dict(fanouts=(5, 4, 3), batch_size=32, eval_batch_size=32,
                dedup="sort")
    base.update(skw)
    return LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(**base),
        cache=cache or CacheConfig(),
        train=TrainConfig(model="graphsage", hidden_dim=16, epochs=1,
                          num_layers=3, seed=3),
        mesh=MeshConfig.for_devices(1),
    )


def test_three_hop_sampler_counters(small_dataset):
    """num_nodes/num_edges counter protocol holds for 3 hops: cumulative
    uniques monotone, per-hop edge counts bounded by frontier * fanout,
    edge endpoints consistent."""
    ds = small_dataset
    cfg = _cfg(ds).sampler
    s = NeighborSampler(cfg, ds.meta.num_nodes)
    seeds = jax.numpy.asarray(ds.train_ids[:32], jax.numpy.int32)
    b, _ = s.sample(ds.graph.to_device(), seeds, s.init_state(),
                    jax.random.PRNGKey(0))
    nn = np.asarray(b.num_nodes)
    ne = np.asarray(b.num_edges)
    assert len(nn) == 4 and len(ne) == 3
    assert (np.diff(nn) >= 0).all()
    assert len(b.edge_src) == 3
    for k, f in enumerate(cfg.fanouts):
        assert ne[k] <= s.frontier_sizes[k] * f
        src = np.asarray(b.edge_src[k])
        dst = np.asarray(b.edge_dst[k])
        ok = src >= 0
        assert (dst[ok] >= 0).all()
        # every referenced local position holds a real id
        ids = np.asarray(b.node_ids)
        assert (ids[src[ok]] >= 0).all()
        assert (ids[dst[ok]] >= 0).all()


@pytest.mark.parametrize("aligned", [True, False])
def test_three_hop_training_learns(small_dataset, aligned):
    ds = small_dataset
    cfg = _cfg(ds, dedup_last_hop=not aligned, auto_compact=True)
    cfg = LegionConfig(dataset=cfg.dataset, sampler=cfg.sampler,
                       cache=CacheConfig(presample_steps=2),
                       train=cfg.train, mesh=cfg.mesh)
    t = Trainer(ds, cfg)
    state = t.init_state()
    losses = []
    for _ in range(12):
        state, loss = t.train_step(state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
    state, acc = t.run_eval(state, Mode.VALID)
    assert acc > 1.0 / ds.meta.num_classes


def test_three_hop_staged_matches_callback(small_dataset):
    """Staged host-feature chain generalizes to 3 hops: loss-identical to
    the callback path."""
    ds = small_dataset
    mk = lambda tr: Trainer(ds, _cfg(ds, cache=CacheConfig(
        cache_bytes=150_000, feature_residency="host", presample_steps=2,
        host_transfer=tr)))
    t_cb = mk("callback")
    t_st = mk("staged")
    assert not t_cb._staged_host and t_st._staged_host
    s_cb = t_cb.init_state()
    s_st = t_st.init_state()
    for _ in range(3):
        s_cb, l_cb = t_cb.train_step(s_cb)
        s_st, l_st = t_st.train_step(s_st)
        np.testing.assert_allclose(float(l_cb), float(l_st), rtol=1e-5,
                                   atol=1e-6)


def test_three_hop_staged_host_topology(small_dataset):
    """3-hop per-hop program chain with host-resident topology (two host
    draw boundaries instead of one)."""
    ds = small_dataset
    cache = CacheConfig(cache_bytes=150_000, feature_residency="host",
                        topo_residency="host", presample_steps=2,
                        host_transfer="staged")
    t = Trainer(ds, _cfg(ds, cache=cache, neighbor_window=4))
    assert t._staged_host and t.graph_access.needs_host_draws
    s = t.init_state()
    for _ in range(2):
        s, loss = t.train_step(s)
        assert np.isfinite(float(loss))
    assert int(t.last_topo_total) > 0

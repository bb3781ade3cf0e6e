"""Measured-buffer-cap (node_caps) tests: the 1.2x MaxIdNum buffer sizing
(server.cu:275-283) as per-hop static caps, with overflow -> masked drop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                               SamplerConfig, TrainConfig)
from legion_tpu.sampling import NeighborSampler
from legion_tpu.train import Trainer

INT32_MAX = np.iinfo(np.int32).max


def test_cum_sizes_with_caps():
    cfg = SamplerConfig(fanouts=(5, 3), batch_size=10,
                        node_caps=(10, 30, 60))
    assert cfg.cum_sizes() == (10, 30, 60)
    assert cfg.frontier_sizes() == (10, 20)  # hop2 frontier <= 30-10
    assert cfg.edge_counts() == (50, 60)
    assert cfg.max_ids == 60
    # uncapped worst case unchanged
    cfg2 = SamplerConfig(fanouts=(5, 3), batch_size=10)
    assert cfg2.cum_sizes() == (10, 60, 210)


def _invariants(batch, caps):
    nn = np.asarray(batch.num_nodes)
    ids = np.asarray(batch.node_ids)
    assert (nn <= np.asarray(caps)).all()
    n_total = int(nn[-1])
    valid = ids[:n_total]
    assert (valid >= 0).all()
    assert len(np.unique(valid)) == n_total
    for k in range(batch.num_hops):
        src = np.asarray(batch.edge_src[k])
        dst = np.asarray(batch.edge_dst[k])
        ok = src >= 0
        # kept edges reference kept nodes only
        assert (src[ok] < n_total).all()
        assert (dst[ok] >= 0).all() and (dst[ok] < n_total).all()
        # dropped edges are fully dropped
        assert (dst[~ok] == -1).all()


@pytest.mark.parametrize("dedup", ["map", "sort"])
def test_tiny_caps_force_drops(small_dataset, dedup):
    """Caps far below the worst case must truncate cleanly: dedup, edge
    masking, pos_map cleanup all hold."""
    ds = small_dataset
    cfg = SamplerConfig(fanouts=(5, 3), batch_size=32,
                        node_caps=(32, 64, 100), dedup=dedup)
    sampler = NeighborSampler(cfg, ds.meta.num_nodes)
    csr = ds.graph.to_device()
    seeds = jnp.asarray(ds.train_ids[:32], jnp.int32)
    pos_map = sampler.init_state()
    for step in range(3):  # multiple batches: residue would accumulate
        batch, pos_map = sampler.sample(
            csr, seeds, pos_map, jax.random.PRNGKey(step))
        _invariants(jax.device_get(batch), cfg.node_caps)
    assert np.all(np.asarray(pos_map) == INT32_MAX), \
        "pos_map must be clean after capped batches"


def test_loose_caps_match_uncapped(small_dataset):
    """Caps above actual usage must not change the sample at all."""
    ds = small_dataset
    base = SamplerConfig(fanouts=(4, 3), batch_size=16)
    s0 = NeighborSampler(base, ds.meta.num_nodes)
    csr = ds.graph.to_device()
    seeds = jnp.asarray(ds.train_ids[:16], jnp.int32)
    b0, _ = s0.sample(csr, seeds, s0.init_state(), jax.random.PRNGKey(3))
    b0 = jax.device_get(b0)
    caps = tuple(int(x) + 16 for x in np.asarray(b0.num_nodes))
    capped = SamplerConfig(fanouts=(4, 3), batch_size=16,
                           node_caps=(16,) + caps[1:])
    s1 = NeighborSampler(capped, ds.meta.num_nodes)
    b1, _ = s1.sample(csr, seeds, s1.init_state(), jax.random.PRNGKey(3))
    b1 = jax.device_get(b1)
    np.testing.assert_array_equal(b0.num_nodes, b1.num_nodes)
    n = int(b0.num_nodes[-1])
    np.testing.assert_array_equal(b0.node_ids[:n], b1.node_ids[:n])
    for k in range(2):
        e0 = b0.edge_src[k][b0.edge_src[k] >= 0]
        e1 = b1.edge_src[k][b1.edge_src[k] >= 0]
        np.testing.assert_array_equal(e0, e1)


def test_trainer_auto_compact_learns(small_dataset):
    ds = small_dataset
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=64,
                              eval_batch_size=64, auto_compact=True),
        cache=CacheConfig(),
        train=TrainConfig(model="graphsage", hidden_dim=32, epochs=6,
                          dropout=0.2),
        mesh=MeshConfig.for_devices(1),
    )
    trainer = Trainer(ds, cfg)
    assert trainer.compact_caps is not None
    worst = SamplerConfig(fanouts=(4, 3), batch_size=64).cum_sizes()
    assert trainer.compact_caps[-1] < worst[-1], (
        trainer.compact_caps, worst)
    state, stats = trainer.fit(verbose=False)
    assert stats[-1].valid_acc > 0.5, stats

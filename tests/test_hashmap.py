"""Bucketed hash map (the BGHT analog for billion-vertex id->slot lookups,
cache.cu:71-88) + the billion-vertex memory-plan sizing contract."""

import numpy as np
import pytest

from legion_tpu.cache.hashmap import BUCKET, HashMap32


def test_hashmap_lookup_hits_and_misses(rng):
    import jax.numpy as jnp
    n = 100_000
    ids = rng.choice(5_000_000, n, replace=False).astype(np.int64)
    vals = rng.integers(0, 2 ** 30, n).astype(np.int32)
    m = HashMap32.build(ids, vals)
    # every inserted key resolves to its value
    out = np.asarray(m.lookup(jnp.asarray(ids, jnp.int32)))
    np.testing.assert_array_equal(out, vals)
    # absent keys (and -1 pads) miss
    absent = np.setdiff1d(rng.integers(0, 5_000_000, 1000), ids)[:500]
    probe = np.concatenate([absent, [-1, -1]]).astype(np.int32)
    out = np.asarray(m.lookup(jnp.asarray(probe)))
    assert (out == -1).all()
    # load factor bounded, probes small
    assert m.probes <= 4
    assert m.n_buckets * BUCKET <= 4 * n


def test_hashmap_staged_training_matches_direct(small_dataset):
    """Staged host-feature training with the hash map must produce the
    exact losses of the direct [V] slot table."""
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.train import Trainer

    def _cfg(impl):
        return LegionConfig(
            dataset=small_dataset.meta,
            sampler=SamplerConfig(fanouts=(5, 3), batch_size=64,
                                  eval_batch_size=32, dedup="sort"),
            cache=CacheConfig(cache_bytes=200_000,
                              feature_residency="host", presample_steps=2,
                              host_transfer="staged", map_impl=impl),
            train=TrainConfig(model="graphsage", hidden_dim=16, epochs=1,
                              seed=3),
            mesh=MeshConfig.for_devices(1))

    td = Trainer(small_dataset, _cfg("direct"))
    th = Trainer(small_dataset, _cfg("hash"))
    sd, sh = td.init_state(), th.init_state()
    for _ in range(3):
        sd, ld = td.train_step(sd)
        sh, lh = th.train_step(sh)
        np.testing.assert_allclose(float(ld), float(lh), rtol=1e-6)
    td.close()
    th.close()


def test_hashmap_clique_training_matches_direct(small_dataset):
    """Multi-device clique caches (feature AND topology) with HashMap32
    id->slot maps must produce the exact losses of the direct [V]
    tables — closing the round-3 billion-vertex hole where the clique
    slot_map/row_map were still replicated [V] int32."""
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.train import Trainer

    def _cfg(impl):
        return LegionConfig(
            dataset=small_dataset.meta,
            sampler=SamplerConfig(fanouts=(5, 3), batch_size=16,
                                  eval_batch_size=32, dedup="sort",
                                  neighbor_window=8),
            cache=CacheConfig(cache_bytes=200_000,
                              feature_residency="host",
                              topo_residency="host", presample_steps=2,
                              host_transfer="callback", map_impl=impl),
            train=TrainConfig(model="graphsage", hidden_dim=16, epochs=1,
                              seed=3, compute_dtype="float32"),
            mesh=MeshConfig.for_devices(4, clique_size=4))

    td = Trainer(small_dataset, _cfg("direct"))
    th = Trainer(small_dataset, _cfg("hash"))
    from legion_tpu.cache.hashmap import HashMap32
    assert isinstance(th.feature_source.slot_map, HashMap32)
    assert isinstance(th.graph_access.row_map, HashMap32)
    sd, sh = td.init_state(), th.init_state()
    for _ in range(3):
        sd, ld = td.train_step(sd)
        sh, lh = th.train_step(sh)
        np.testing.assert_allclose(float(ld), float(lh), rtol=1e-6)


def test_hashmap_clique_sizing_uk2014():
    """The multi-device clique config at uk2014 scale: per-chip lookup
    state with hash maps is O(cached) for BOTH clique maps, vs 6.3GB of
    replicated direct tables."""
    V = 787_801_471
    feat_cached = 30_000_000
    topo_cached = 10_000_000
    m = HashMap32.build(np.arange(100_000, dtype=np.int64),
                        np.arange(100_000, dtype=np.int32))
    bpe = m.hbm_bytes / 100_000
    clique_maps_bytes = bpe * (feat_cached + topo_cached)
    direct_bytes = V * 4 * 2
    assert clique_maps_bytes < 2.6e9
    assert clique_maps_bytes < direct_bytes / 2


def test_billion_vertex_lookup_state_fits():
    """uk2014 (0.79B vertices, BASELINE.md): per-replica lookup state must
    fit a 16GB chip alongside the cache payload. Direct tables alone cost
    ~6.3GB (slot+row maps) + 3.2GB labels; the plan: hash maps O(cached)
    + label banks O(seeds) (train.py) + sort dedup O(1) sampler state."""
    V = 787_801_471
    cached_rows = 30_000_000          # ~30M hot rows (~15GB of f32@128 -> bf16 7.7GB)
    ids = np.arange(cached_rows, dtype=np.int64)  # sizing only: bytes are
    # determined by n, not id values; build a small map to get the formula
    m = HashMap32.build(ids[:100_000], np.arange(100_000, dtype=np.int32))
    bytes_per_entry = m.hbm_bytes / 100_000
    hash_bytes = bytes_per_entry * cached_rows          # slot map
    label_bank_bytes = 8000 * 10_000 * 4                # ~seeds per epoch
    direct_bytes = V * 4 * 2                            # slot + row maps
    assert hash_bytes < 2e9, hash_bytes                  # < 2GB
    assert hash_bytes + label_bank_bytes < direct_bytes / 3
    # sampler state: sort dedup needs NO [V] position map
    from legion_tpu.config import SamplerConfig
    from legion_tpu.sampling import NeighborSampler
    s = NeighborSampler(SamplerConfig(fanouts=(25, 10), batch_size=8000,
                                      dedup="sort", dedup_last_hop=False),
                        V)
    assert s.state_size == 1

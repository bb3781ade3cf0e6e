"""CachedTopoAccess tests: sampling through the hot sub-CSR + host-fallback
path must produce valid graph edges with the same contracts as the pure
device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legion_tpu.cache import UnifiedCache, plan_cache, presample_hotness
from legion_tpu.config import SamplerConfig
from legion_tpu.sampling import NeighborSampler
from legion_tpu.sampling.access import CachedTopoAccess, DeviceCSRAccess


@pytest.fixture(scope="module")
def topo_setup(small_dataset):
    ds = small_dataset
    cfg = SamplerConfig(fanouts=(5, 3), batch_size=32)
    csr = ds.graph.to_device()
    sampler = NeighborSampler(cfg, ds.meta.num_nodes)
    bank = np.full(4 * 32, -1, np.int32)
    n = min(len(ds.train_ids), 4 * 32)
    bank[:n] = ds.train_ids[:n]
    na, ea, _ = presample_hotness(sampler, csr, jnp.asarray(bank), 4,
                                  jax.random.PRNGKey(0))
    # force a topo-heavy cache: features get nothing
    plan = plan_cache(jnp.zeros_like(na), ea, csr, 64 * 1024, 16)
    cache = UnifiedCache.build(plan, jnp.asarray(ds.features), csr)
    assert cache.row_map is not None and plan.topo_capacity > 0
    access = CachedTopoAccess(cache.row_map, cache.sub_indptr,
                              cache.sub_indices, ds.graph.indptr,
                              ds.graph.indices)
    return ds, cfg, csr, sampler, access, plan


def _sample(sampler, access, seeds, seed=0):
    pos_map = sampler.init_state()
    return sampler.sample(access, jnp.asarray(seeds, jnp.int32), pos_map,
                          jax.random.PRNGKey(seed))


def test_cached_topo_edges_are_real(topo_setup):
    ds, cfg, csr, sampler, access, plan = topo_setup
    batch, _ = _sample(sampler, access, ds.train_ids[:32])
    batch = jax.device_get(batch)
    ids = batch.node_ids
    checked = 0
    for k in range(batch.num_hops):
        src_l, dst_l = batch.edge_src[k], batch.edge_dst[k]
        valid = src_l >= 0
        for s, d in zip(ids[src_l[valid]][:100], ids[dst_l[valid]][:100]):
            assert int(s) in ds.graph.neighbors(int(d)).tolist()
            checked += 1
    assert checked > 50


def test_cached_topo_mixes_hit_and_miss(topo_setup):
    ds, cfg, csr, sampler, access, plan = topo_setup
    row_map = np.asarray(access.row_map)
    batch, _ = _sample(sampler, access, ds.train_ids[:32])
    # the expanded frontier must contain both cached and uncached vertices
    n_exp = int(np.asarray(batch.num_nodes)[-2])
    expanded = np.asarray(batch.node_ids)[:n_exp]
    hits = (row_map[expanded] >= 0).sum()
    assert 0 < hits < n_exp, (hits, n_exp)


def test_cached_topo_deterministic(topo_setup):
    ds, cfg, csr, sampler, access, plan = topo_setup
    b1, _ = _sample(sampler, access, ds.train_ids[:32], seed=5)
    b2, _ = _sample(sampler, access, ds.train_ids[:32], seed=5)
    np.testing.assert_array_equal(np.asarray(b1.node_ids),
                                  np.asarray(b2.node_ids))


def test_all_host_fallback(small_dataset):
    """Zero topo cache => every draw goes through the host callback."""
    ds = small_dataset
    cfg = SamplerConfig(fanouts=(4, 2), batch_size=16)
    sampler = NeighborSampler(cfg, ds.meta.num_nodes)
    V = ds.meta.num_nodes
    access = CachedTopoAccess(
        row_map=jnp.full((V,), -1, jnp.int32),
        sub_indptr=jnp.zeros((2,), jnp.int64),
        sub_indices=jnp.full((1,), -1, jnp.int32),
        host_indptr=ds.graph.indptr, host_indices=ds.graph.indices)
    batch, pos_map = _sample(sampler, access, ds.train_ids[:16])
    assert int(np.asarray(batch.num_edges).sum()) > 0
    assert np.all(np.asarray(pos_map) == np.iinfo(np.int32).max)

"""Cache subsystem tests: hotness accumulation, cost-model split, cache
build/lookup, cached feature fetch vs direct (exact row parity), hit-rate
sanity on a power-law graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legion_tpu.cache import UnifiedCache, plan_cache, presample_hotness
from legion_tpu.cache.unified_cache import (CachedFeatureSource,
                                            DeviceFeatureSource)
from legion_tpu.config import SamplerConfig
from legion_tpu.sampling import NeighborSampler


@pytest.fixture(scope="module")
def hot_setup(small_dataset):
    ds = small_dataset
    cfg = SamplerConfig(fanouts=(5, 3), batch_size=32)
    csr = ds.graph.to_device()
    sampler = NeighborSampler(cfg, ds.meta.num_nodes)
    steps = 8
    bank = np.full(steps * 32, -1, np.int32)
    n = min(len(ds.train_ids), steps * 32)
    bank[:n] = ds.train_ids[:n]
    na, ea, mx = presample_hotness(sampler, csr, jnp.asarray(bank), steps,
                                   jax.random.PRNGKey(0))
    return ds, cfg, csr, sampler, np.asarray(na), np.asarray(ea), \
        np.asarray(mx)


def test_hotness_totals(hot_setup):
    ds, cfg, csr, sampler, na, ea, mx = hot_setup
    assert na.sum() > 0 and ea.sum() > 0
    # per-hop maxima are monotone and bounded by the static sizes
    assert mx.shape == (cfg.num_hops + 1,)
    assert (np.diff(mx) >= 0).all()
    assert 0 < mx[-1] <= cfg.max_ids
    assert mx[0] == 32  # full seed batches
    # hot destinations (high in-degree hubs) should be hotter than median
    indeg = np.bincount(ds.graph.indices, minlength=ds.meta.num_nodes)
    hub = np.argsort(indeg)[-10:]
    assert na[hub].mean() >= np.median(na)


def test_cost_model_split(hot_setup):
    ds, cfg, csr, sampler, na, ea, mx = hot_setup
    feat_dim = ds.meta.feature_dim
    cache_bytes = 200 * feat_dim * 4  # room for ~200 feature rows
    plan = plan_cache(jnp.asarray(na), jnp.asarray(ea), csr, cache_bytes,
                      feat_dim)
    assert 0 <= plan.feature_capacity <= 200
    assert plan.feature_capacity * feat_dim * 4 <= cache_bytes * 1
    # orders must be by hotness descending
    qf = np.asarray(plan.feature_order)
    assert na[qf[0]] == na.max()
    assert (np.diff(na[qf[:50]]) <= 0).all()
    # with a nonzero budget and nonzero hotness something gets cached
    assert plan.feature_capacity + plan.topo_capacity > 0
    assert plan.est_feat_saved_bytes + plan.est_topo_saved_bytes > 0


def test_cost_model_all_feature_when_topo_free(hot_setup):
    """If edge hotness is zero (nothing expanded twice), all bytes should
    go to features — the reference's degenerate released behavior."""
    ds, cfg, csr, sampler, na, ea, mx = hot_setup
    plan = plan_cache(jnp.asarray(na), jnp.zeros_like(jnp.asarray(ea)),
                      csr, 100 * ds.meta.feature_dim * 4,
                      ds.meta.feature_dim)
    assert plan.topo_capacity == 0 or plan.est_topo_saved_bytes == 0
    assert plan.feature_capacity > 0


def test_unified_cache_build_and_lookup(hot_setup):
    ds, cfg, csr, sampler, na, ea, mx = hot_setup
    feat_dim = ds.meta.feature_dim
    feats = jnp.asarray(ds.features)
    plan = plan_cache(jnp.asarray(na), jnp.asarray(ea), csr,
                      150 * feat_dim * 4 + 4000, feat_dim)
    cache = UnifiedCache.build(plan, feats, csr)
    if cache.slot_map is not None:
        qf = np.asarray(plan.feature_order)[:plan.feature_capacity]
        slot, hit = cache.find_feat(jnp.asarray(qf))
        assert bool(hit.all())
        np.testing.assert_allclose(
            np.asarray(cache.gather_cached(slot)), ds.features[qf])
        # a definitely-cold id misses
        cold = np.setdiff1d(np.arange(ds.meta.num_nodes), qf)[:5]
        _, h2 = cache.find_feat(jnp.asarray(cold))
        assert not bool(h2.any())
    if cache.row_map is not None:
        qt = np.asarray(plan.topo_order)[:plan.topo_capacity]
        sub_indptr = np.asarray(cache.sub_indptr)
        sub_indices = np.asarray(cache.sub_indices)
        for i, v in enumerate(qt[:20]):
            row = sub_indices[sub_indptr[i]:sub_indptr[i + 1]]
            np.testing.assert_array_equal(np.sort(row),
                                          np.sort(ds.graph.neighbors(v)))


def test_cached_feature_source_matches_device(hot_setup):
    ds, cfg, csr, sampler, na, ea, mx = hot_setup
    feat_dim = ds.meta.feature_dim
    feats = jnp.asarray(ds.features)
    plan = plan_cache(jnp.asarray(na), jnp.asarray(ea), csr,
                      100 * feat_dim * 4, feat_dim)
    cache = UnifiedCache.build(plan, feats, csr)
    cached_src = CachedFeatureSource(cache, ds.features)
    dev_src = DeviceFeatureSource(feats)

    ids = np.concatenate([
        np.asarray(plan.feature_order)[:50],        # hot
        np.asarray(plan.feature_order)[-50:],       # cold
        np.full(28, -1, np.int64)])                 # pad
    ids = jnp.asarray(ids, jnp.int32)

    @jax.jit
    def fetch_cached(i):
        return cached_src.fetch(i)

    rows_c, hits = fetch_cached(ids)
    rows_d, _ = dev_src.fetch(ids)
    valid = np.asarray(ids) >= 0
    np.testing.assert_allclose(np.asarray(rows_c)[valid],
                               np.asarray(rows_d)[valid], rtol=1e-6)
    assert int(hits) >= 50  # all hot ids hit
    # pad rows from the cached path are zeros (host gather skips them)


def test_hit_rate_improves_with_capacity(hot_setup):
    """More cache => more hits on a fresh sampled batch (power-law helps)."""
    ds, cfg, csr, sampler, na, ea, mx = hot_setup
    feat_dim = ds.meta.feature_dim
    feats = jnp.asarray(ds.features)
    seeds = jnp.asarray(ds.train_ids[:32], jnp.int32)
    batch, _ = sampler.sample(csr, seeds, sampler.init_state(),
                              jax.random.PRNGKey(99))
    ids = batch.node_ids
    n_ids = int(batch.num_nodes[-1])
    rates = []
    for cap_rows in (50, 400):
        plan = plan_cache(jnp.asarray(na), jnp.zeros_like(jnp.asarray(ea)),
                          csr, cap_rows * feat_dim * 4, feat_dim)
        cache = UnifiedCache.build(plan, feats, csr)
        _, hit = cache.find_feat(ids)
        rates.append(int(jnp.sum(hit)) / n_ids)
    assert rates[1] > rates[0]
    assert rates[1] > 0.3  # power-law: 400 hot rows cover a lot

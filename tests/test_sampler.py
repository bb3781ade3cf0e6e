"""Sampler property tests (SURVEY.md §4: the reference has no tests; this is
the rebuild's own pyramid). Properties checked against the contracts in
operator_impl.cu: dedup, fanout bounds, edge validity, reversed direction,
seeds-first layout, counter consistency, determinism, pos_map cleanup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legion_tpu.config import SamplerConfig
from legion_tpu.sampling import NeighborSampler

INT32_MAX = np.iinfo(np.int32).max


@pytest.fixture(scope="module", params=["map", "sort"])
def setup(request, small_dataset):
    ds = small_dataset
    cfg = SamplerConfig(fanouts=(5, 3), batch_size=32,
                        dedup=request.param)
    csr = ds.graph.to_device()
    sampler = NeighborSampler(cfg, ds.meta.num_nodes)
    return ds, cfg, csr, sampler


def _run(setup, seed=0, seeds=None):
    ds, cfg, csr, sampler = setup
    if seeds is None:
        seeds = jnp.asarray(ds.train_ids[:cfg.batch_size], dtype=jnp.int32)
    pos_map = sampler.init_state()
    key = jax.random.PRNGKey(seed)
    batch, pos_map = sampler.sample(csr, seeds, pos_map, key)
    return jax.device_get(batch), np.asarray(pos_map), np.asarray(seeds)


def test_seeds_first_and_unique(setup):
    batch, _, seeds = _run(setup)
    ids = batch.node_ids
    n_total = int(batch.num_nodes[-1])
    np.testing.assert_array_equal(ids[: len(seeds)], seeds)
    valid = ids[:n_total]
    assert np.all(valid >= 0)
    assert len(np.unique(valid)) == n_total, "global dedup violated"
    assert np.all(ids[n_total:] == -1), "pad beyond count must be -1"


def test_counters_monotone(setup):
    batch, _, seeds = _run(setup)
    nn = batch.num_nodes
    assert nn[0] == len(seeds)
    assert np.all(np.diff(nn) >= 0)
    for k in range(batch.num_hops):
        e_valid = batch.edge_src[k] >= 0
        assert int(batch.num_edges[k]) == int(e_valid.sum())


def test_edges_are_real_graph_edges_reversed(setup):
    ds, cfg, csr, sampler = setup
    batch, _, seeds = _run(setup)
    ids = batch.node_ids
    for k in range(batch.num_hops):
        src_l = batch.edge_src[k]
        dst_l = batch.edge_dst[k]
        valid = src_l >= 0
        assert np.all((dst_l >= 0) == valid)
        src_g = ids[src_l[valid]]
        dst_g = ids[dst_l[valid]]
        # direction reversed: src=sampled neighbor, dst=frontier node, i.e.
        # src_g must be a graph-neighbor OF dst_g (operator_impl.cu:256-257)
        for s, d in zip(src_g[:200], dst_g[:200]):
            nbrs = ds.graph.neighbors(int(d))
            assert int(s) in nbrs.tolist(), (s, d)


def test_fanout_bound(setup):
    ds, cfg, csr, sampler = setup
    batch, _, seeds = _run(setup)
    # per (hop, dst) at most fanout edges
    for k in range(batch.num_hops):
        dst_l = batch.edge_dst[k]
        valid = dst_l >= 0
        counts = np.bincount(dst_l[valid])
        assert counts.max(initial=0) <= cfg.fanouts[k]


def test_hop_frontier_is_new_nodes_only(setup):
    """Hop k+1 edges' dst must lie in [num_nodes[k-1], num_nodes[k]) for
    k>=1 — i.e. only newly discovered nodes are expanded (Legion's global
    dedup frontier rule)."""
    batch, _, seeds = _run(setup)
    nn = batch.num_nodes
    for k in range(batch.num_hops):
        dst_l = batch.edge_dst[k]
        valid = dst_l >= 0
        lo = 0 if k == 0 else int(nn[k - 1])
        hi = int(nn[k])
        if valid.any():
            assert dst_l[valid].min() >= lo
            assert dst_l[valid].max() < hi


def test_position_map_cleared(setup):
    _, pos_map, _ = _run(setup)
    assert np.all(pos_map == INT32_MAX), "ClearPosMap equivalent failed"


def test_determinism_and_key_sensitivity(setup):
    b1, _, _ = _run(setup, seed=0)
    b2, _, _ = _run(setup, seed=0)
    b3, _, _ = _run(setup, seed=1)
    np.testing.assert_array_equal(b1.node_ids, b2.node_ids)
    for k in range(b1.num_hops):
        np.testing.assert_array_equal(b1.edge_src[k], b2.edge_src[k])
    assert not np.array_equal(b1.node_ids, b3.node_ids)


def test_padded_seeds(setup):
    ds, cfg, csr, sampler = setup
    seeds = np.full(cfg.batch_size, -1, dtype=np.int32)
    seeds[:10] = ds.train_ids[:10]
    batch, pos_map, _ = _run(setup, seeds=jnp.asarray(seeds))
    assert int(batch.num_nodes[0]) == 10
    # pad seeds may leave -1 holes in [10, batch) but no edges from them
    for k in range(batch.num_hops):
        valid = batch.edge_dst[k] >= 0
        dst_ids = batch.node_ids[batch.edge_dst[k][valid]]
        assert np.all(dst_ids >= 0)
    assert np.all(pos_map == INT32_MAX)


def test_zero_degree_seeds(setup):
    ds, cfg, csr, sampler = setup
    deg = ds.graph.degrees()
    zero = np.where(deg == 0)[0]
    if len(zero) == 0:
        pytest.skip("no isolated vertices in fixture")
    seeds = np.full(cfg.batch_size, -1, dtype=np.int32)
    seeds[: min(len(zero), 8)] = zero[:8]
    batch, _, _ = _run(setup, seeds=jnp.asarray(seeds))
    assert int(batch.num_edges[0]) == 0


def test_presample_hotness(setup):
    ds, cfg, csr, sampler = setup
    seeds = jnp.asarray(ds.train_ids[:cfg.batch_size], dtype=jnp.int32)
    pos_map = sampler.init_state()
    V = ds.meta.num_nodes
    na = jnp.zeros((V,), jnp.int32)
    ea = jnp.zeros((V,), jnp.int32)
    batch, pos_map, na, ea = sampler.presample(
        csr, seeds, pos_map, jax.random.PRNGKey(0), na, ea)
    na, ea = np.asarray(na), np.asarray(ea)
    n_total = int(batch.num_nodes[-1])
    # every unique node in the batch counted exactly once
    assert na.sum() == n_total
    ids = np.asarray(batch.node_ids)[:n_total]
    assert np.all(na[ids] == 1)
    # frontier expansions: seeds + hop-1 new nodes were expanded
    n_seeds = int(batch.num_nodes[0])
    expanded = ids[: int(batch.num_nodes[-2])]
    assert ea.sum() == len(expanded)
    assert np.all(ea[expanded] == 1)

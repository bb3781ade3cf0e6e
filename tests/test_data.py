"""Data layer tests: Legion binary format round-trip, CSR construction,
meta_config compatibility (reference contracts: dataset/README.md:3-10,
storage_management.cu:29-98)."""

import numpy as np
import pytest

from legion_tpu.config import DatasetMeta, SamplerConfig
from legion_tpu.data import LegionDataset, synthesize_dataset, \
    write_legion_dataset
from legion_tpu.graph import CSRGraph


def test_csr_from_edges_basic():
    src = np.array([0, 0, 1, 2, 2, 2, 3])
    dst = np.array([1, 2, 0, 0, 1, 2, 3])  # 2->2 and 3->3 self loops
    g = CSRGraph.from_edges(src, dst, num_nodes=4)
    assert g.num_nodes == 4
    # self loops dropped (gen_legion_xtrapulp_fomat.cpp:90)
    assert g.num_edges == 5
    assert set(g.neighbors(0).tolist()) == {1, 2}
    assert set(g.neighbors(2).tolist()) == {0, 1}
    assert g.neighbors(3).tolist() == []
    assert g.degrees().tolist() == [2, 1, 2, 0]


def test_meta_config_roundtrip(tmp_path):
    meta = DatasetMeta(path="/data/x", batch_size=8000, num_nodes=100,
                       num_edges=500, feature_dim=64, train_size=10,
                       valid_size=5, test_size=5, cache_bytes=1 << 20,
                       epochs=3)
    p = str(tmp_path / "meta_config")
    meta.to_meta_config(p)
    # one line, 10 whitespace-separated fields — the exact reference format
    line = open(p).read()
    assert "\n" not in line and len(line.split()) == 10
    back = DatasetMeta.from_meta_config(p)
    for f in ("path", "batch_size", "num_nodes", "num_edges", "feature_dim",
              "train_size", "valid_size", "test_size", "cache_bytes",
              "epochs"):
        assert getattr(back, f) == getattr(meta, f)


def test_dataset_write_load_roundtrip(tmp_path, small_dataset):
    ds = small_dataset
    path = str(tmp_path / "synth")
    part = (np.arange(ds.meta.num_nodes) % 4).astype(np.int32)
    write_legion_dataset(path, ds.graph, ds.features, ds.labels,
                         ds.train_ids, ds.valid_ids, ds.test_ids,
                         partition=part)
    meta = DatasetMeta(
        path=path, batch_size=64, num_nodes=ds.meta.num_nodes,
        num_edges=ds.meta.num_edges, feature_dim=ds.meta.feature_dim,
        train_size=len(ds.train_ids), valid_size=len(ds.valid_ids),
        test_size=len(ds.test_ids), num_classes=ds.meta.num_classes)
    back = LegionDataset.load(meta)
    np.testing.assert_array_equal(back.graph.indptr, ds.graph.indptr)
    np.testing.assert_array_equal(back.graph.indices, ds.graph.indices)
    np.testing.assert_allclose(back.features, ds.features)
    np.testing.assert_array_equal(back.train_ids, ds.train_ids)
    np.testing.assert_array_equal(back.partition, part)
    # partition-filtered seeds
    s0 = back.seeds_for_partition("train", 0, 4)
    assert np.all(part[s0] == 0)


def test_infer_meta_from_dir(tmp_path, small_dataset):
    """infer_meta probes a Legion-format directory and reconstructs the
    exact DatasetMeta shapes — the launcher's --dataset-name custom path."""
    from legion_tpu.data.format import infer_meta
    ds = small_dataset
    path = str(tmp_path / "probe")
    write_legion_dataset(path, ds.graph, ds.features, ds.labels,
                         ds.train_ids, ds.valid_ids, ds.test_ids)
    m = infer_meta(path, batch_size=64)
    assert m.num_nodes == ds.meta.num_nodes
    assert m.num_edges == ds.meta.num_edges
    assert m.feature_dim == ds.meta.feature_dim
    assert m.train_size == len(ds.train_ids)
    assert m.valid_size == len(ds.valid_ids)
    assert m.test_size == len(ds.test_ids)
    assert m.num_classes == ds.meta.num_classes
    back = LegionDataset.load(m)
    np.testing.assert_array_equal(back.train_ids, ds.train_ids)


def test_synthetic_learnable_structure(small_dataset):
    ds = small_dataset
    # power-law in-degree: top 1% of vertices receive a large share of edges
    # (these are the hot vertices the cache layer exploits)
    indeg = np.bincount(ds.graph.indices, minlength=ds.meta.num_nodes)
    top = np.sort(indeg)[::-1][: max(1, ds.meta.num_nodes // 100)].sum()
    assert top / ds.meta.num_edges > 0.05
    # most vertices must have out-edges, or sampling has nothing to expand
    deg = ds.graph.degrees()
    assert (deg > 0).mean() > 0.9
    # community structure: most edges intra-class
    src = np.repeat(np.arange(ds.meta.num_nodes), deg)
    dst = ds.graph.indices
    intra = (ds.labels[src] == ds.labels[dst.astype(np.int64)]).mean()
    assert intra > 0.5


def test_sampler_config_sizes():
    cfg = SamplerConfig(fanouts=(25, 10), batch_size=1000)
    assert cfg.frontier_sizes() == (1000, 25000)
    assert cfg.edge_counts() == (25000, 250000)
    # server.cu:188-199 worst-case formula
    assert cfg.max_ids == 1000 + 25000 + 250000


def test_known_dataset_table():
    m = DatasetMeta.known("products", path="/tmp/x")
    assert m.num_nodes == 2_449_029 and m.feature_dim == 100
    with pytest.raises(ValueError):
        DatasetMeta.known("nope", path="/tmp/x")

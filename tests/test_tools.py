"""Offline tooling tests: prepare CLI round trip, LDG partitioner quality,
launcher CLI smoke test."""

import os
import subprocess
import sys

import numpy as np
import pytest

from legion_tpu import native


def test_prepare_pipeline_roundtrip(tmp_path, small_dataset):
    from legion_tpu.tools import prepare
    ds = small_dataset
    out = str(tmp_path / "prep")
    # write an edge list from the fixture graph
    el = tmp_path / "edges.txt"
    deg = ds.graph.degrees()
    src = np.repeat(np.arange(ds.meta.num_nodes), deg)
    with open(el, "w") as f:
        for s, d in zip(src[:5000], ds.graph.indices[:5000]):
            f.write(f"{s}\t{d}\n")
    prepare.main(["convert", "--edgelist", str(el), "--out", out])
    assert os.path.exists(os.path.join(out, "edge_src"))
    indptr = np.fromfile(os.path.join(out, "edge_src"), np.int64)
    V = indptr.shape[0] - 1
    prepare.main(["gensets", "--out", out, "--nodes", str(V),
                  "--train-frac", "0.2"])
    train = np.fromfile(os.path.join(out, "trainingset"), np.int32)
    assert len(train) == int(V * 0.2)
    assert len(np.unique(train)) == len(train)
    prepare.main(["partition", "--out", out, "--parts", "4"])
    part = np.fromfile(os.path.join(out, "partition"), np.int32)
    assert part.shape == (V,)
    assert set(np.unique(part)) <= {0, 1, 2, 3}
    prepare.main(["synthfeat", "--out", out, "--nodes", str(V),
                  "--feature-dim", "16", "--classes", "5"])
    feats = np.fromfile(os.path.join(out, "features"), np.float32)
    assert feats.shape == (V * 16,)


def test_ldg_partitioner_beats_random(small_dataset):
    ds = small_dataset
    g = ds.graph
    part = native.partition_ldg(g.indptr, g.indices, 4, passes=2)
    V = ds.meta.num_nodes
    src = np.repeat(np.arange(V), g.degrees())
    cut = (part[src] != part[g.indices]).mean()
    rng = np.random.default_rng(0)
    rnd = rng.integers(0, 4, V)
    rnd_cut = (rnd[src] != rnd[g.indices]).mean()
    # balanced-ish
    sizes = np.bincount(part, minlength=4)
    assert sizes.max() < V / 4 * 1.3
    assert cut < rnd_cut * 0.95, (cut, rnd_cut)


def test_ogb_converter_npy_roundtrip(tmp_path):
    """OGB npy-export -> Legion binary layout -> loadable + trainable."""
    from legion_tpu.tools import prepare
    rng = np.random.default_rng(5)
    V, E, F = 500, 4000, 12
    npy = tmp_path / "npy"
    os.makedirs(npy)
    edge_index = rng.integers(0, V, (2, E), dtype=np.int64)
    np.save(npy / "edge_index.npy", edge_index)
    np.save(npy / "node_feat.npy",
            rng.standard_normal((V, F)).astype(np.float32))
    np.save(npy / "labels.npy", rng.integers(0, 7, (V, 1)))
    ids = rng.permutation(V)
    np.save(npy / "train_idx.npy", ids[:200])
    np.save(npy / "valid_idx.npy", ids[200:300])
    np.save(npy / "test_idx.npy", ids[300:400])
    out = str(tmp_path / "legion")
    prepare.main(["ogb", "--out", out, "--npy-dir", str(npy)])

    from legion_tpu.config import DatasetMeta
    from legion_tpu.data import LegionDataset
    indptr = np.fromfile(os.path.join(out, "edge_src"), np.int64)
    n_edges = int(indptr[-1])
    meta = DatasetMeta(path=out, batch_size=64, num_nodes=V,
                       num_edges=n_edges, feature_dim=F, train_size=200,
                       valid_size=100, test_size=100, num_classes=7)
    ds = LegionDataset.load(meta)
    # symmetrized minus self-loops
    assert n_edges <= 2 * E
    assert ds.features.shape == (V, F)
    # every original edge is present in both directions
    s, d = int(edge_index[0, 0]), int(edge_index[1, 0])
    if s != d:
        assert d in ds.graph.neighbors(s)
        assert s in ds.graph.neighbors(d)
    # trains end to end
    from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                                   SamplerConfig, TrainConfig)
    from legion_tpu.train import Trainer
    cfg = LegionConfig(
        dataset=meta,
        sampler=SamplerConfig(fanouts=(3, 2), batch_size=64,
                              eval_batch_size=50, dedup="sort"),
        cache=CacheConfig(),
        train=TrainConfig(model="graphsage", hidden_dim=16, epochs=1,
                          compute_dtype="float32"),
        mesh=MeshConfig.for_devices(1))
    trainer = Trainer(ds, cfg)
    state = trainer.init_state()
    state, loss = trainer.train_step(state)
    assert np.isfinite(float(loss))


def test_launcher_cli_synthetic():
    from legion_tpu import run as lrun
    trainer, state, stats = lrun.main([
        "--dataset-name", "synthetic", "--nodes", "3000",
        "--train-batch-size", "64", "--fanout", "4", "3", "--epoch", "1",
        "--model", "graphsage", "--hidden", "16", "--devices", "2",
        "--no-compact"])
    assert len(stats) == 1
    assert np.isfinite(stats[0].train_loss)

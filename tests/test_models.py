"""Model math parity tests: each layer's output is checked allclose against
an independent, loop-based NumPy implementation of the reference formulas
(DGL SAGEConv/GraphConv/GATConv semantics per legion_{graphsage,gcn,gat}.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legion_tpu.config import SamplerConfig
from legion_tpu.models import GAT, GCN, GraphSAGE, LinkPredSAGE
from legion_tpu.models.common import static_cum_sizes
from legion_tpu.sampling import NeighborSampler


@pytest.fixture(scope="module")
def sampled(small_dataset):
    ds = small_dataset
    cfg = SamplerConfig(fanouts=(3, 2), batch_size=18)
    csr = ds.graph.to_device()
    sampler = NeighborSampler(cfg, ds.meta.num_nodes)
    seeds = jnp.asarray(ds.train_ids[:18], dtype=jnp.int32)
    batch, _ = sampler.sample(csr, seeds, sampler.init_state(),
                              jax.random.PRNGKey(42))
    batch = jax.device_get(batch)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (cfg.max_ids, 12)).astype(np.float32)
    return ds, cfg, batch, feats


def np_sage_layer(p, h_src, src, dst, num_dst):
    out = np.zeros((num_dst, p["w_self"].shape[1]), np.float32)
    for v in range(num_dst):
        mask = dst == v
        neigh = h_src[src[mask]]
        h_n = neigh.mean(0) if mask.any() else np.zeros(h_src.shape[1],
                                                        np.float32)
        out[v] = h_src[v] @ p["w_self"] + h_n @ p["w_neigh"] + p["b"]
    return out


def np_gcn_layer(p, h_src, src, dst, num_dst):
    valid = dst >= 0
    src_v, dst_v = src[valid], dst[valid]
    out_deg = np.bincount(src_v, minlength=h_src.shape[0])
    in_deg = np.bincount(dst_v, minlength=num_dst)
    hw = h_src @ p["w"]
    out = np.zeros((num_dst, hw.shape[1]), np.float32)
    for s, d in zip(src_v, dst_v):
        out[d] += hw[s] / np.sqrt(out_deg[s])
    for v in range(num_dst):
        if in_deg[v] > 0:
            out[v] /= np.sqrt(in_deg[v])
    return out + p["b"]


def np_gat_layer(p, h_src, src, dst, num_dst, slope=0.2):
    H, d_out = p["attn_l"].shape
    z = (h_src @ p["w"].reshape(h_src.shape[1], -1)).reshape(-1, H, d_out)
    el = (z * p["attn_l"]).sum(-1)
    er = (z * p["attn_r"]).sum(-1)
    valid = dst >= 0
    out = np.zeros((num_dst, H, d_out), np.float32)
    for v in range(num_dst):
        mask = valid & (dst == v)
        if not mask.any():
            out[v] = p["b"]
            continue
        e = el[src[mask]] + er[v]
        e = np.where(e > 0, e, slope * e)
        a = np.exp(e - e.max(0))
        a = a / a.sum(0)
        out[v] = (z[src[mask]] * a[:, :, None]).sum(0) + p["b"]
    return out


def _np_params(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def test_sage_parity(sampled):
    ds, cfg, batch, feats = sampled
    model = GraphSAGE(cfg, in_dim=12, hidden_dim=8, num_classes=5)
    params = model.init(jax.random.PRNGKey(1))
    logits = np.asarray(model.apply(params, jnp.asarray(feats), batch))
    S = static_cum_sizes(cfg)
    npar = _np_params(params)
    h = feats
    L = cfg.num_hops
    for i in range(L):
        k = L - 1 - i
        h = np_sage_layer(npar["layers"][i], h[:S[k + 1]],
                          np.asarray(batch.edge_src[k]),
                          np.asarray(batch.edge_dst[k]), S[k])
        if i != L - 1:
            h = np.maximum(h, 0)
    np.testing.assert_allclose(logits, h[:cfg.batch_size], rtol=2e-5,
                               atol=2e-5)


def test_gcn_parity(sampled):
    ds, cfg, batch, feats = sampled
    model = GCN(cfg, in_dim=12, hidden_dim=8, num_classes=5)
    params = model.init(jax.random.PRNGKey(2))
    logits = np.asarray(model.apply(params, jnp.asarray(feats), batch))
    S = static_cum_sizes(cfg)
    npar = _np_params(params)
    h = feats
    L = cfg.num_hops
    for i in range(L):
        k = L - 1 - i
        h = np_gcn_layer(npar["layers"][i], h[:S[k + 1]],
                         np.asarray(batch.edge_src[k]),
                         np.asarray(batch.edge_dst[k]), S[k])
        if i != L - 1:
            h = np.maximum(h, 0)
    np.testing.assert_allclose(logits, h[:cfg.batch_size], rtol=2e-5,
                               atol=2e-5)


def test_gat_chunked_attention_matches_dense(sampled):
    """The fanout-chunked attention scan (the memory-bounded path that
    replaces the [fanout, F, H, d] materialization at products-scale GAT)
    must match the dense path exactly."""
    from legion_tpu.ops import hop_agg
    ds, cfg, batch, feats = sampled
    model = GAT(cfg, in_dim=12, hidden_dim=4, num_classes=5, heads=(2, 1),
                feat_drop=0.0, attn_drop=0.0)
    params = model.init(jax.random.PRNGKey(3))
    dense = np.asarray(model.apply(params, jnp.asarray(feats), batch))
    orig = hop_agg._ATTN_DENSE_LIMIT
    try:
        hop_agg._ATTN_DENSE_LIMIT = 0      # force the scan path
        chunked = np.asarray(model.apply(params, jnp.asarray(feats),
                                         batch))
    finally:
        hop_agg._ATTN_DENSE_LIMIT = orig
    np.testing.assert_allclose(dense, chunked, rtol=2e-5, atol=2e-5)


def test_gat_parity(sampled):
    ds, cfg, batch, feats = sampled
    model = GAT(cfg, in_dim=12, hidden_dim=4, num_classes=5, heads=(2, 1),
                feat_drop=0.0, attn_drop=0.0)
    params = model.init(jax.random.PRNGKey(3))
    logits = np.asarray(model.apply(params, jnp.asarray(feats), batch))
    S = static_cum_sizes(cfg)
    npar = _np_params(params)
    h = feats
    L = cfg.num_hops
    for i in range(L):
        k = L - 1 - i
        out = np_gat_layer(npar["layers"][i], h[:S[k + 1]],
                           np.asarray(batch.edge_src[k]),
                           np.asarray(batch.edge_dst[k]), S[k])
        if i != L - 1:
            out = out.reshape(out.shape[0], -1)
            out = np.where(out > 0, out, np.expm1(out))  # ELU
        else:
            out = out.mean(1)
        h = out.astype(np.float32)
    np.testing.assert_allclose(logits, h[:cfg.batch_size], rtol=1e-4,
                               atol=1e-4)


def test_lp_sage_loss_and_grad(sampled):
    ds, cfg_old, batch, feats = sampled
    cfg = SamplerConfig(fanouts=(3, 2), batch_size=18)  # 18 % 3 == 0
    model = LinkPredSAGE(cfg, in_dim=12, hidden_dim=8)
    params = model.init(jax.random.PRNGKey(4))
    seed_valid = jnp.ones((cfg.batch_size,), bool)
    loss, grads = jax.value_and_grad(model.loss)(
        params, jnp.asarray(feats), batch, seed_valid)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_dropout_active_in_train_mode(sampled):
    ds, cfg, batch, feats = sampled
    model = GraphSAGE(cfg, in_dim=12, hidden_dim=8, num_classes=5,
                      dropout=0.5)
    params = model.init(jax.random.PRNGKey(5))
    a = model.apply(params, jnp.asarray(feats), batch, train=True,
                    rng=jax.random.PRNGKey(10))
    b = model.apply(params, jnp.asarray(feats), batch, train=True,
                    rng=jax.random.PRNGKey(11))
    c = model.apply(params, jnp.asarray(feats), batch, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    d = model.apply(params, jnp.asarray(feats), batch, train=False,
                    rng=jax.random.PRNGKey(12))
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))

"""End-to-end trainer: fused sample -> feature gather -> model -> update.

This collapses the reference's three cooperating layers — the sampling server
hot loop (server.cu:302-332), the CUDA-IPC handoff (ipc_service.cu), and the
DDP trainer processes (legion_graphsage.py:121-183) — into ONE jitted SPMD
program per step. On TPU the sampler and model share the chip, so the
zero-copy process handoff is simply function composition, and DDP+NCCL
becomes a `lax.pmean` over the mesh.

Zero-host-traffic hot loop: all seed sets live on device as padded "banks"
(the device-side analog of BatchGenerate's seed slicing,
operator_impl.cu:92-172), the step/epoch counters and RNG keys are device
state, and losses/metrics accumulate on device. A training step consumes NO
host inputs — the host only chooses which compiled function to invoke, so
steps pipeline back-to-back with async dispatch (the reference needed a
3-stream event DAG + semaphore pipeline for the same overlap).

Data parallelism: `shard_map` over the ("clique", "member") mesh; each device
samples from its own partition's seeds with its own position map and RNG
stream, computes grads, and grads/metrics are mean/sum-reduced across the
mesh — exactly the reference's one-replica-per-GPU + allreduce structure
(legion_graphsage.py:139-140).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map

    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _esm

    def _shard_map(f, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from legion_tpu.config import LegionConfig
from legion_tpu.models import make_model
from legion_tpu.parallel.mesh import DP_AXES, dp_axes, dp_size, make_mesh
from legion_tpu.pipeline import Mode, Schedule
from legion_tpu.sampling import NeighborSampler

# Sharding specs are built per-Trainer from the mesh's axis names, so a
# multi-host mesh ("host", "clique", "member") works unchanged — every mesh
# axis is data-parallel; "member" additionally carries cache collectives.


def _masked_ce(logits: jax.Array, labels: jax.Array,
               valid: jax.Array) -> jax.Array:
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(labels, 0))
    w = valid.astype(logits.dtype)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1)


@dataclass
class EpochStats:
    epoch: int
    train_loss: float
    valid_acc: float
    seconds: float


def _build_bank(sets: List[np.ndarray], steps: int, static_bs: int,
                batch_sizes: List[int]) -> np.ndarray:
    """[n_dev, steps*static_bs] seed bank; step s of device d occupies
    [s*static_bs, s*static_bs + batch_sizes[d]), -1 padded — this encodes
    the per-partition batch sizes of the reference coordinator
    (ipc_service.cu:88-115) while keeping every device's slice uniform."""
    n_dev = len(sets)
    bank = np.full((n_dev, steps * static_bs), -1, np.int32)
    for d, ids in enumerate(sets):
        bs = batch_sizes[d]
        for s in range(steps):
            chunk = ids[s * bs:(s + 1) * bs]
            bank[d, s * static_bs: s * static_bs + len(chunk)] = chunk
    return bank


class Trainer:
    def __init__(self, dataset, config: LegionConfig,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.config = config
        self.dataset = dataset
        self.mesh = mesh if mesh is not None else make_mesh(config.mesh)
        self.n_dev = dp_size(self.mesh)
        self.axes = dp_axes(self.mesh)
        self._DP = P(self.axes)
        self._DPN = P(self.axes, None)
        meta = dataset.meta
        V = meta.num_nodes
        scfg = config.sampler

        rep = NamedSharding(self.mesh, P())
        dpn = NamedSharding(self.mesh, self._DPN)

        # --- seed sets ---
        if hasattr(dataset, "device_arrays"):
            train_sets, valid_sets, test_sets = dataset.seed_sets(self.n_dev)
        else:
            train_sets = [dataset.seeds_for_partition("train", d, self.n_dev)
                          for d in range(self.n_dev)]
            valid_sets = [dataset.seeds_for_partition("valid", d, self.n_dev)
                          for d in range(self.n_dev)]
            test_sets = [dataset.seeds_for_partition("test", d, self.n_dev)
                         for d in range(self.n_dev)]

        self.schedule = Schedule.build(
            [len(s) for s in train_sets], [len(s) for s in valid_sets],
            [len(s) for s in test_sets], scfg.batch_size,
            config.train.epochs, scfg.eval_batch_size)
        sch = self.schedule

        # --- device-resident seed banks ---
        self.train_bank = jax.device_put(
            _build_bank([np.asarray(s) for s in train_sets], sch.train_step,
                        scfg.batch_size, [sch.train_batch_size] * self.n_dev),
            dpn)
        self.valid_bank = jax.device_put(
            _build_bank([np.asarray(s) for s in valid_sets], sch.valid_step,
                        scfg.eval_batch_size, list(sch.valid_batch_sizes)),
            dpn)
        self.test_bank = jax.device_put(
            _build_bank([np.asarray(s) for s in test_sets], sch.test_step,
                        scfg.eval_batch_size, list(sch.test_batch_sizes)),
            dpn)

        # --- samplers (the train sampler may be rebuilt with measured
        # buffer caps by _setup_storage's presampling) ---
        self.sampler_t = NeighborSampler(scfg, V)
        eval_scfg = replace(scfg, batch_size=scfg.eval_batch_size,
                            node_caps=None, auto_compact=False)
        self.sampler_e = NeighborSampler(eval_scfg, V)

        # --- storage residency + PreSc (presample -> caps -> cost model ->
        # cache FillUp), reference server.cu:90-117 ---
        self._setup_storage(rep)

        # --- models (shapes follow the final sampler configs) ---
        self.model_t = make_model(config.train, self.sampler_t.config,
                                  meta.feature_dim, meta.num_classes)
        self.model_e = make_model(config.train, eval_scfg, meta.feature_dim,
                                  meta.num_classes)
        self.tx = optax.adam(config.train.lr)

        self.is_lp = config.train.model == "lp_sage"
        if self.is_lp:
            assert scfg.batch_size % 3 == 0 and \
                scfg.eval_batch_size % 3 == 0, (
                    "lp_sage batches are (anchor, pos, neg) thirds "
                    "(lp_sage.py:86-97)")
        if self._staged_host:
            self._build_staged_steps()
        else:
            self._train_step = self._build_train_step()
            self._eval_steps = {
                Mode.VALID: self._build_eval_step(sch.valid_step,
                                                  "valid_ctr"),
                Mode.TEST: self._build_eval_step(sch.test_step, "test_ctr"),
            }
        self.test_acc: Optional[float] = None

    # ------------------------------------------------------------------
    def _setup_storage(self, rep) -> None:
        """Decide residency and run the PreSc pipeline when needed:
        presample hotness/buffer-sizing -> measured node caps -> cost
        model -> cache FillUp -> cached access paths
        (reference: server.cu:90-117, cache.cu:360-611)."""
        from legion_tpu.cache import plan_cache, presample_hotness
        from legion_tpu.cache.unified_cache import (
            CachedFeatureSource, DeviceFeatureSource, UnifiedCache)
        from legion_tpu.sampling.access import (CachedTopoAccess,
                                                DeviceCSRAccess)

        dataset, config = self.dataset, self.config
        meta = dataset.meta
        V = meta.num_nodes
        scfg = config.sampler
        cache_cfg = config.cache
        self.cache_plan = None
        self.compact_caps = None
        self._use_clique = False
        self._staged_host = False
        self.member_rows = jnp.zeros((1, 1, 1), jnp.float32)

        device_ds = hasattr(dataset, "device_arrays")
        feat_host = cache_cfg.enabled and \
            cache_cfg.feature_residency == "host"
        topo_host = cache_cfg.enabled and cache_cfg.topo_residency == "host"
        host_indptr = host_indices = host_feats = None
        dev_feats = None

        def _hbm_access(csr):
            if scfg.neighbor_window:
                from legion_tpu.sampling.access import WindowedCSRAccess
                return WindowedCSRAccess.from_csr(csr,
                                                  scfg.neighbor_window)
            return DeviceCSRAccess(csr)

        if device_ds:
            assert not cache_cfg.enabled, (
                "host-cached storage needs a host dataset")
            self.csr, dev_feats, self.labels = dataset.device_arrays()
            base_access = _hbm_access(self.csr)
            degrees = self.csr.degrees()
        else:
            self.labels = jax.device_put(
                np.asarray(dataset.labels[:V], np.int32), rep)
            host_indptr = np.asarray(dataset.graph.indptr)
            host_indices = np.asarray(dataset.graph.indices)
            host_feats = np.ascontiguousarray(dataset.features, np.float32)
            if topo_host:
                # presampling reads adjacency from host memory, matching
                # the reference's UVA pre_sample (operator_impl.cu:301-397)
                self.csr = None
                base_access = CachedTopoAccess(
                    row_map=jnp.full((V,), -1, jnp.int32),
                    sub_indptr=jnp.zeros((2,), jnp.int64),
                    sub_indices=jnp.full((1,), -1, jnp.int32),
                    host_indptr=host_indptr, host_indices=host_indices)
                degrees = jnp.asarray(
                    (host_indptr[1:] - host_indptr[:-1]).astype(np.int32))
            else:
                self.csr = dataset.graph.to_device(rep)
                base_access = _hbm_access(self.csr)
                degrees = self.csr.degrees()

        Kg = self.mesh.shape["member"]
        use_clique = feat_host and Kg > 1
        want_compact = scfg.auto_compact and scfg.node_caps is None
        na = ea = None
        if cache_cfg.enabled or want_compact:
            if cache_cfg.enabled and self.n_dev > 1:
                assert use_clique and not topo_host, (
                    "multi-device cached storage currently supports "
                    "host features via the clique-aggregated cache with "
                    "HBM topology; host topology + multi-device lands "
                    "later")
            steps = cache_cfg.presample_steps or self.schedule.train_step
            steps = max(1, min(steps, self.schedule.train_step))
            na, ea, mx = presample_hotness(
                self.sampler_t, base_access, self.train_bank[0], steps,
                jax.random.PRNGKey(config.train.seed + 17))
            if want_compact:
                mxv = np.asarray(mx)
                caps = [scfg.batch_size]
                for k in range(1, len(mxv)):
                    # 1.2x headroom like InitializeFeaturesBuffer
                    # (server.cu:277), rounded up to lane multiples
                    c = max(int(mxv[k] * 1.2) + 8, caps[-1] + 1)
                    caps.append(-(-c // 128) * 128)
                scfg = replace(scfg, node_caps=tuple(caps))
                self.sampler_t = NeighborSampler(scfg, V)
                self.compact_caps = tuple(caps)

        from legion_tpu.utils.layout import put_row_major

        def _feat_cast(arr):
            # bf16 feature storage halves HBM residency and the hot
            # feature-gather bytes; aggregation accumulates in f32
            # (ops/hop_agg.py), matmuls promote, so training math holds
            if config.train.compute_dtype == "bfloat16":
                import jax.numpy as _jnp
                return arr.astype(_jnp.bfloat16) if hasattr(arr, "astype") \
                    else arr
            return arr

        if not cache_cfg.enabled:
            self.graph_access = base_access
            if device_ds:
                self.feature_source = DeviceFeatureSource(
                    put_row_major(_feat_cast(dev_feats)))
            else:
                import ml_dtypes
                hf = host_feats if config.train.compute_dtype != "bfloat16" \
                    else host_feats.astype(ml_dtypes.bfloat16)
                self.feature_source = DeviceFeatureSource(
                    put_row_major(hf, rep))
            return

        # topology hotness only matters if topology actually needs caching
        ea_eff = ea if topo_host else jnp.zeros_like(ea)
        na_eff = na if feat_host else jnp.zeros_like(na)
        plan = plan_cache(na_eff, ea_eff, degrees, cache_cfg.cache_bytes,
                          meta.feature_dim, cache_cfg.alpha_step,
                          group_size=Kg)
        self.cache_plan = plan

        if use_clique:
            # clique-aggregated interleaved feature cache over the member
            # axis (cache_impl.cuh:104-109); peer reads ride ICI
            from legion_tpu.cache.collective import (CliqueFeatureCache,
                                                     build_clique_cache)
            slot_map, member_rows, R = build_clique_cache(
                np.asarray(plan.feature_order), plan.feature_capacity,
                host_feats, Kg)
            self.member_rows = jax.device_put(
                member_rows,
                NamedSharding(self.mesh, P("member", None, None)))
            self.feature_source = CliqueFeatureCache(
                jax.device_put(jnp.asarray(slot_map), rep), host_feats,
                Kg, R)
            self._use_clique = True
            self.graph_access = _hbm_access(self.csr)
            return
        cache = UnifiedCache.build_from_host(
            plan, host_feats if feat_host else None,
            host_indptr if topo_host else None,
            host_indices if topo_host else None, V)

        if topo_host:
            self.graph_access = CachedTopoAccess(
                cache.row_map if cache.row_map is not None
                else jnp.full((V,), -1, jnp.int32),
                cache.sub_indptr if cache.sub_indptr is not None
                else jnp.zeros((2,), jnp.int64),
                cache.sub_indices if cache.sub_indices is not None
                else jnp.full((1,), -1, jnp.int32),
                host_indptr, host_indices)
        else:
            self.graph_access = _hbm_access(self.csr)
        if feat_host:
            assert cache.slot_map is not None, (
                "feature cache budget resolved to zero rows")
            transfer = cache_cfg.host_transfer
            if transfer == "auto":
                transfer = "staged" if jax.default_backend() == "tpu" \
                    else "callback"
            if transfer == "staged":
                # miss rows cross host->device between two programs (no
                # in-program callback needed — see CacheConfig.host_transfer)
                assert self.n_dev == 1, (
                    "staged host-feature transfer is single-device; "
                    "multi-device host features use the clique cache")
                self._staged_host = True
                self._cache = cache
                self._host_feats = np.ascontiguousarray(
                    host_feats, np.float32)
                self.feature_source = None
            else:
                self.feature_source = CachedFeatureSource(cache, host_feats)
        else:
            self.feature_source = DeviceFeatureSource(
                put_row_major(host_feats, rep))

    # ------------------------------------------------------------------
    def init_state(self, key: Optional[jax.Array] = None) -> Dict:
        if key is None:
            key = jax.random.PRNGKey(self.config.train.seed)
        rep = NamedSharding(self.mesh, P())
        dp = NamedSharding(self.mesh, self._DP)
        params = jax.device_put(self.model_t.init(key), rep)
        opt_state = jax.device_put(self.tx.init(params), rep)
        pos_map = jax.device_put(
            np.full((self.n_dev, self.sampler_t.state_size),
                    np.iinfo(np.int32).max, np.int32), dp)
        z = lambda: jax.device_put(np.int32(0), rep)
        mdt = np.float32 if getattr(self, "is_lp", False) else np.int32
        zm = lambda: jax.device_put(mdt(0), rep)
        return {"params": params, "opt_state": opt_state,
                "pos_map": pos_map, "train_ctr": z(), "valid_ctr": z(),
                "test_ctr": z(), "correct": zm(), "total": zm(),
                "base_key": jax.device_put(
                    jax.random.PRNGKey(self.config.train.seed + 1), rep)}

    # ------------------------------------------------------------------
    def _device_key(self, base_key: jax.Array, ctr: jax.Array,
                    tag: int) -> jax.Array:
        dev = jnp.int32(0)
        for a in self.axes:
            dev = dev * self.mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.fold_in(base_key, ctr)
        k = jax.random.fold_in(k, tag)
        return jax.random.fold_in(k, dev)

    def _build_train_step(self):
        sampler, model, tx = self.sampler_t, self.model_t, self.tx
        bs = self.config.sampler.batch_size
        n_steps = self.schedule.train_step

        use_clique = self._use_clique

        def step(params, opt_state, pos_map, ctr, base_key, bank, access,
                 fsource, member_rows, labels):
            pos_map, bank = pos_map[0], bank[0]
            lid = ctr % n_steps
            seeds = jax.lax.dynamic_slice(bank, (lid * bs,), (bs,))
            k = self._device_key(base_key, ctr, 0)
            batch, pos_map = sampler.sample_fn(access, seeds, pos_map, k)
            # fetch only the model-visible id prefix; the ids buffer's
            # frontier-slack tail never feeds a layer
            nid = jax.lax.slice(batch.node_ids, (0,), (sampler.max_ids,))
            if use_clique:
                x, feat_hits = fsource.fetch(nid, member_rows[0])
            else:
                x, feat_hits = fsource.fetch(nid)
            y = labels[jnp.clip(seeds, 0, labels.shape[0] - 1)]
            valid = seeds >= 0

            if self.is_lp:
                def loss_fn(p):
                    return model.loss(p, x, batch, valid, train=True,
                                      rng=jax.random.fold_in(k, 7))
            else:
                def loss_fn(p):
                    logits = model.apply(p, x, batch, train=True,
                                         rng=jax.random.fold_in(k, 7))
                    return _masked_ce(logits, y, valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, self.axes)
            loss = jax.lax.pmean(loss, self.axes)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # per-step counters for StepMetrics (the live PCM analog,
            # monitor.cuh:83-135 role): trained edges, fetched id slots
            edges = jnp.sum(batch.num_edges, dtype=jnp.int32)
            slots = jnp.sum(nid >= 0, dtype=jnp.int32)
            return params, opt_state, pos_map[None], ctr + 1, loss, \
                jax.lax.psum(feat_hits, self.axes), \
                jax.lax.psum(edges, self.axes), \
                jax.lax.psum(slots, self.axes)

        mr_spec = P("member", None, None) if use_clique else P()
        sm = _shard_map(
            step, self.mesh,
            in_specs=(P(), P(), self._DP, P(), P(), self._DPN, P(), P(),
                      mr_spec, P()),
            out_specs=(P(), P(), self._DP, P(), P(), P(), P(), P()))
        return jax.jit(sm, donate_argnums=(0, 1, 2, 3))

    def _build_eval_step(self, n_steps: int, ctr_name: str):
        sampler, model = self.sampler_e, self.model_e
        bs = self.config.sampler.eval_batch_size

        use_clique = self._use_clique

        def step(params, pos_map, ctr, correct, total, base_key, bank,
                 access, fsource, member_rows, labels):
            pos_map, bank = pos_map[0], bank[0]
            lid = ctr % n_steps
            seeds = jax.lax.dynamic_slice(bank, (lid * bs,), (bs,))
            k = self._device_key(base_key, ctr, 1)
            batch, pos_map = sampler.sample_fn(access, seeds, pos_map, k)
            nid = jax.lax.slice(batch.node_ids, (0,), (sampler.max_ids,))
            if use_clique:
                x, _ = fsource.fetch(nid, member_rows[0])
            else:
                x, _ = fsource.fetch(nid)
            y = labels[jnp.clip(seeds, 0, labels.shape[0] - 1)]
            valid = seeds >= 0
            if self.is_lp:
                # validation metric is mean link-prediction loss, like the
                # reference's valid_one_step (lp_sage.py:99-115,206-215)
                loss = model.loss(params, x, batch, valid, train=False)
                t = jnp.sum(valid[: bs // 3], dtype=jnp.int32)
                c = loss * t.astype(jnp.float32)
                c = jax.lax.psum(c, self.axes)
                t = jax.lax.psum(t, self.axes)
                return pos_map[None], ctr + 1, correct + c, \
                    total + t.astype(jnp.float32)
            logits = model.apply(params, x, batch, train=False)
            pred = jnp.argmax(logits, axis=-1)
            c = jnp.sum((pred == y) & valid, dtype=jnp.int32)
            t = jnp.sum(valid, dtype=jnp.int32)
            c = jax.lax.psum(c, self.axes)
            t = jax.lax.psum(t, self.axes)
            return pos_map[None], ctr + 1, correct + c, total + t

        mr_spec = P("member", None, None) if use_clique else P()
        sm = _shard_map(
            step, self.mesh,
            in_specs=(P(), self._DP, P(), P(), P(), P(), self._DPN, P(), P(),
                      mr_spec, P()),
            out_specs=(self._DP, P(), P(), P()))
        jitted = jax.jit(sm, donate_argnums=(1, 2, 3, 4))

        def run(state: Dict, bank) -> Dict:
            pos_map, ctr, correct, total = jitted(
                state["params"], state["pos_map"], state[ctr_name],
                state["correct"], state["total"], state["base_key"], bank,
                self.graph_access, self.feature_source, self.member_rows,
                self.labels)
            return dict(state, pos_map=pos_map, correct=correct,
                        total=total, **{ctr_name: ctr})

        return run

    # ------------------------------------------------------------------
    # Staged host-feature path: the reference streams miss rows over
    # zero-copy UVA inside its kernels (cache_impl.cuh:239-272); without
    # in-program host callbacks the step splits into
    #   [sample + cache lookup + miss compaction]  (device program A)
    #   C++ parallel host gather of the compacted miss rows + device_put
    #   [assemble features + fwd/bwd + update]     (device program B)
    # The miss buffer's static width comes from an epoch-wide probe pass
    # (the reference presamples max sizes over the whole epoch,
    # server.cu:275-283); a rare batch overflowing the cap DROPS the tail
    # misses (zero rows) like every other overflow in the system — no
    # mid-training recompile.
    #
    # Inter-batch overlap (INTERBATCH_CON=2, system_config.cuh:47):
    # program A for step N+1 is dispatched before step N's host gather, so
    # the device runs [A_{N+1}, B_N] while the host gathers N+1's rows.

    def _build_staged_steps(self) -> None:
        from concurrent.futures import ThreadPoolExecutor
        sch = self.schedule
        bs_t = self.config.sampler.batch_size
        self._sample_train = self._make_staged_sample(
            self.sampler_t, sch.train_step, bs_t, tag=0)
        bs_e = self.config.sampler.eval_batch_size
        self._sample_eval = self._make_staged_sample(
            self.sampler_e, max(sch.valid_step, 1), bs_e, tag=1)
        self._sample_eval_test = self._make_staged_sample(
            self.sampler_e, max(sch.test_step, 1), bs_e, tag=1)
        # pipeline-owned sampler state: the train sample chain donates and
        # re-emits this buffer; eval keeps using state["pos_map"] — safe
        # because every sample fully clears its marks (ClearPosMap), so all
        # post-sample maps are content-equivalent
        self._staged_pm = jax.device_put(
            np.full((1, self.sampler_t.state_size),
                    np.iinfo(np.int32).max, np.int32))
        self._miss_cap = self._probe_miss_cap()
        self._eval_miss_cap = self._probe_eval_miss_cap()
        self._train_core = self._make_train_core(self._miss_cap)
        # one-step sample lookahead (the reference's INTERBATCH_CON=2
        # producer/consumer pipeline, system_config.cuh:47): device runs
        # [A_{N+1}, B_N] while a worker thread host-gathers step N+1's rows
        self._gather_pool = ThreadPoolExecutor(max_workers=1)
        self._prefetch: Optional[Tuple] = None   # (ctr, outs, gather future)
        self._last_ctr_obj = None                # resync detector
        self._staged_ctr = 0
        self._eval_steps = {
            Mode.VALID: self._make_staged_eval(Mode.VALID, "valid_ctr"),
            Mode.TEST: self._make_staged_eval(Mode.TEST, "test_ctr"),
        }

    def _staged_key(self, base_key, ctr, tag: int):
        k = jax.random.fold_in(base_key, ctr)
        k = jax.random.fold_in(k, tag)
        return jax.random.fold_in(k, 0)  # single device => dev index 0

    def _make_staged_sample(self, sampler, n_steps: int, bs: int, tag: int):
        M = sampler.max_ids
        imax = jnp.iinfo(jnp.int32).max

        def sample(pos_map, ctr, base_key, bank, access, slot_map):
            pos_map, bank = pos_map[0], bank[0]
            lid = ctr % n_steps
            seeds = jax.lax.dynamic_slice(bank, (lid * bs,), (bs,))
            k = self._staged_key(base_key, ctr, tag)
            batch, pos_map = sampler.sample_fn(access, seeds, pos_map, k)
            nid = jax.lax.slice(batch.node_ids, (0,), (M,))
            slot = jnp.where(
                nid >= 0,
                slot_map[jnp.clip(nid, 0, slot_map.shape[0] - 1)], -1)
            miss = (nid >= 0) & (slot < 0)
            lane = jnp.arange(M, dtype=jnp.int32)
            mkey = jnp.where(miss, lane, imax)
            sk, m_ids, m_pos = jax.lax.sort((mkey, nid, lane), dimension=0,
                                            num_keys=1)
            mvalid = sk != imax
            m_ids = jnp.where(mvalid, m_ids, -1)
            m_pos = jnp.where(mvalid, m_pos, -1)
            n_miss = jnp.sum(miss, dtype=jnp.int32)
            hits = jnp.sum(slot >= 0, dtype=jnp.int32)
            edges = jnp.sum(batch.num_edges, dtype=jnp.int32)
            return (batch, pos_map[None], seeds, slot, m_ids, m_pos,
                    n_miss, hits, edges)

        return jax.jit(sample, donate_argnums=(0,))

    def _probe_miss_cap(self) -> int:
        """Measure worst-case cache misses over (up to) a full epoch of
        batches and size the static miss buffer at 1.2x — the reference's
        epoch-wide presample sizing rule (server.cu:275-283). Batches are
        cheap here: only program A runs, no features move."""
        M = self.sampler_t.max_ids
        probes = min(self.schedule.train_step, 64)
        worst = 0
        key = jax.random.PRNGKey(self.config.train.seed + 1)
        counts = []
        for i in range(probes):
            out = self._sample_train(self._staged_pm, jnp.int32(i), key,
                                     self.train_bank, self.graph_access,
                                     self._cache.slot_map)
            self._staged_pm = out[1]
            counts.append(out[6])
        for c in counts:
            worst = max(worst, int(c))
        cap = int(worst * 1.2) + 256
        return min(M, -(-cap // 512) * 512)

    def _probe_eval_miss_cap(self) -> int:
        """Same sizing rule for the eval sampler's miss buffer (round-1
        advisor: eval gathered the full max_ids-wide buffer per step)."""
        M = self.sampler_e.max_ids
        worst = 0
        key = jax.random.PRNGKey(self.config.train.seed + 1)
        pm = jax.device_put(
            np.full((1, self.sampler_e.state_size),
                    np.iinfo(np.int32).max, np.int32))
        for i in range(min(max(self.schedule.valid_step, 1), 8)):
            out = self._sample_eval(pm, jnp.int32(i), key,
                                    self.valid_bank, self.graph_access,
                                    self._cache.slot_map)
            pm = out[1]
            worst = max(worst, int(out[6]))
        cap = int(worst * 1.5) + 256
        return min(M, -(-cap // 512) * 512)

    def _make_train_core(self, cap: int):
        sampler, model, tx = self.sampler_t, self.model_t, self.tx
        M = sampler.max_ids
        cache_rows = self._cache.cache_rows

        def core(params, opt_state, ctr, base_key, batch, seeds, slot,
                 m_pos, x_miss, labels):
            x = jnp.where(
                (slot >= 0)[:, None],
                cache_rows[jnp.clip(slot, 0, cache_rows.shape[0] - 1)], 0)
            mp = jax.lax.slice(m_pos, (0,), (cap,))
            x = x.at[jnp.where(mp >= 0, mp, M)].set(x_miss, mode="drop")
            k = self._staged_key(base_key, ctr, 0)
            y = labels[jnp.clip(seeds, 0, labels.shape[0] - 1)]
            valid = seeds >= 0

            if self.is_lp:
                def loss_fn(p):
                    return model.loss(p, x, batch, valid, train=True,
                                      rng=jax.random.fold_in(k, 7))
            else:
                def loss_fn(p):
                    logits = model.apply(p, x, batch, train=True,
                                         rng=jax.random.fold_in(k, 7))
                    return _masked_ce(logits, y, valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, ctr + 1, loss

        return jax.jit(core, donate_argnums=(0, 1))

    def _make_staged_eval(self, mode: Mode, ctr_name: str):
        from legion_tpu import native
        sampler, model = self.sampler_e, self.model_e
        bs = self.config.sampler.eval_batch_size
        M = sampler.max_ids
        cap = self._eval_miss_cap
        cache_rows = self._cache.cache_rows
        sample = self._sample_eval if mode == Mode.VALID \
            else self._sample_eval_test

        def core(params, correct, total, batch, seeds, slot, m_pos,
                 x_miss, labels):
            x = jnp.where(
                (slot >= 0)[:, None],
                cache_rows[jnp.clip(slot, 0, cache_rows.shape[0] - 1)], 0)
            mp = jax.lax.slice(m_pos, (0,), (cap,))
            x = x.at[jnp.where(mp >= 0, mp, M)].set(x_miss, mode="drop")
            y = labels[jnp.clip(seeds, 0, labels.shape[0] - 1)]
            valid = seeds >= 0
            if self.is_lp:
                loss = model.loss(params, x, batch, valid, train=False)
                t = jnp.sum(valid[: bs // 3], dtype=jnp.int32)
                return correct + loss * t.astype(jnp.float32), \
                    total + t.astype(jnp.float32)
            logits = model.apply(params, x, batch, train=False)
            pred = jnp.argmax(logits, axis=-1)
            c = jnp.sum((pred == y) & valid, dtype=jnp.int32)
            return correct + c, total + jnp.sum(valid, dtype=jnp.int32)

        core_j = jax.jit(core, donate_argnums=(1, 2))

        def run(state: Dict, bank) -> Dict:
            (batch, pos_map, seeds, slot, m_ids, m_pos, n_miss,
             hits, edges) = sample(state["pos_map"], state[ctr_name],
                                   state["base_key"], bank,
                                   self.graph_access, self._cache.slot_map)
            rows = native.gather_rows(self._host_feats,
                                      np.asarray(m_ids)[:cap])
            x_miss = jax.device_put(rows)
            correct, total = core_j(state["params"], state["correct"],
                                    state["total"], batch, seeds, slot,
                                    m_pos, x_miss, self.labels)
            return dict(state, pos_map=pos_map, correct=correct,
                        total=total, **{ctr_name: state[ctr_name] + 1})

        return run

    def _gather_train_miss(self, m_ids) -> jax.Array:
        """Worker-thread half of the pipeline: block on the sample program's
        miss ids, gather their rows from host features (parallel C++), ship
        to HBM. The reference does this inside its kernels over UVA
        (cache_impl.cuh:239-272); staged it overlaps with device compute."""
        from legion_tpu import native
        ids_np = np.asarray(m_ids)[: self._miss_cap]
        rows = native.gather_rows(self._host_feats, ids_np)
        return jax.device_put(rows)

    def _dispatch_staged_sample(self, pm, ctr: int, base_key):
        out = self._sample_train(pm, jnp.int32(ctr), base_key,
                                 self.train_bank, self.graph_access,
                                 self._cache.slot_map)
        # pm was donated into the sample; the chain head is its output
        self._staged_pm = out[1]
        fut = self._gather_pool.submit(self._gather_train_miss, out[4])
        return ctr, out, fut

    def _staged_train_step(self, state: Dict) -> Tuple[Dict, jax.Array]:
        if state["train_ctr"] is not self._last_ctr_obj:
            # fresh/restored state: resync the host ctr mirror and drop any
            # stale lookahead (its pos_map chain stays valid — cleared maps
            # are content-equivalent)
            self._staged_ctr = int(state["train_ctr"])
            if self._prefetch is not None and \
                    self._prefetch[0] != self._staged_ctr:
                self._prefetch = None
        ctr_host = self._staged_ctr
        if self._prefetch is None:
            self._prefetch = self._dispatch_staged_sample(
                self._staged_pm, ctr_host, state["base_key"])
        _, out, fut = self._prefetch
        (batch, pm, seeds, slot, m_ids, m_pos, n_miss, hits, edges) = out
        # dispatch step N+1's sample before blocking on step N's gather:
        # the device executes A_{N+1} while the host feeds B_N
        self._prefetch = self._dispatch_staged_sample(
            pm, ctr_host + 1, state["base_key"])
        x_miss = fut.result()
        params, opt_state, ctr, loss = self._train_core(
            state["params"], state["opt_state"], state["train_ctr"],
            state["base_key"], batch, seeds, slot, m_pos, x_miss,
            self.labels)
        self._staged_ctr = ctr_host + 1
        self._last_ctr_obj = ctr
        self.last_feat_hits = hits
        self.last_edges = edges
        self.last_slots = hits + n_miss
        return dict(state, params=params, opt_state=opt_state,
                    train_ctr=ctr), loss

    # ------------------------------------------------------------------
    def train_step(self, state: Dict) -> Tuple[Dict, jax.Array]:
        if self._staged_host:
            return self._staged_train_step(state)
        (params, opt_state, pos_map, ctr, loss, feat_hits, edges,
         slots) = self._train_step(
            state["params"], state["opt_state"], state["pos_map"],
            state["train_ctr"], state["base_key"], self.train_bank,
            self.graph_access, self.feature_source, self.member_rows,
            self.labels)
        self.last_feat_hits = feat_hits
        self.last_edges = edges
        self.last_slots = slots
        return dict(state, params=params, opt_state=opt_state,
                    pos_map=pos_map, train_ctr=ctr), loss

    def _reset_metrics(self, state: Dict) -> Dict:
        # two distinct buffers — both are donated by the eval step
        rep = NamedSharding(self.mesh, P())
        dt = jnp.float32 if self.is_lp else jnp.int32
        return dict(state,
                    correct=jax.device_put(jnp.zeros((), dt), rep),
                    total=jax.device_put(jnp.zeros((), dt) + 0, rep))

    def run_eval(self, state: Dict, mode: Mode) -> Tuple[Dict, float]:
        state = self._reset_metrics(state)
        bank = self.valid_bank if mode == Mode.VALID else self.test_bank
        n = self.schedule.valid_step if mode == Mode.VALID \
            else self.schedule.test_step
        stepper = self._eval_steps[mode]
        for _ in range(n):
            state = stepper(state, bank)
        acc = float(state["correct"]) / max(float(state["total"]), 1.0)
        return state, acc

    # ------------------------------------------------------------------
    def fit(self, state: Optional[Dict] = None, verbose: bool = True
            ) -> Tuple[Dict, List[EpochStats]]:
        """Run the full reference schedule: per epoch train then valid;
        test once at the end (ipc_service.cu:213-253). Prints epoch wall
        time and accuracies like legion_graphsage.py:158-180."""
        if state is None:
            state = self.init_state()
        sch = self.schedule
        stats: List[EpochStats] = []
        for epoch in range(sch.epochs):
            t0 = time.time()
            losses = []
            hits = []
            for _ in range(sch.train_step):
                state, loss = self.train_step(state)
                losses.append(loss)
                hits.append(self.last_feat_hits)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses \
                else float("nan")
            # cache-hit counters come off-device once per epoch (the live
            # replacement for the reference's disabled PCM monitor)
            total_hits = int(jnp.sum(jnp.stack(hits))) if hits else 0
            state, acc = self.run_eval(state, Mode.VALID)
            dt = time.time() - t0
            stats.append(EpochStats(epoch, train_loss, acc, dt))
            if verbose:
                hit_info = ""
                if self._use_clique or self.cache_plan is not None:
                    hit_info = f" | feat cache hits {total_hits}"
                print(f"Epoch {epoch:03d} | time {dt:.2f}s | "
                      f"loss {train_loss:.4f} | val acc {acc:.4f}"
                      f"{hit_info}")
        state, self.test_acc = self.run_eval(state, Mode.TEST)
        if verbose:
            print(f"Test acc {self.test_acc:.4f}")
        return state, stats

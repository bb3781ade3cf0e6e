"""legion_tpu — a TPU-native mini-batch GNN training framework.

A from-scratch rebuild of the capabilities of RC4ML/Legion (USENIX ATC'23:
"Automatically Pushing the Envelope of Multi-GPU System for Billion-Scale GNN
Training") designed for TPU hardware: JAX/XLA/Pallas compute, `shard_map` over
`jax.sharding.Mesh` for multi-chip scale, and a C-native host runtime for IO.

Subsystem map (reference parity, see SURVEY.md):
  - data/       Legion-compatible binary dataset IO + synthetic graphs
                (reference: dataset/, storage_management.cu)
  - graph.py    CSR graph containers, host/device residency
                (reference: src/storage/graph_storage.cu)
  - sampling/   multi-hop fanout neighbor sampling, static shapes
                (reference: src/engine/operator_impl.cu)
  - cache/      hotness-driven unified feature/topology cache + cost model
                (reference: src/cache/cache.cu)
  - models/     GraphSAGE / GCN / GAT / link-prediction SAGE
                (reference: training_backend/legion_*.py)
  - ops/        segment/aggregation ops (XLA forms; measured Pallas
                alternatives kept as an experiment harness)
  - parallel/   mesh construction, cache groups, collectives
  - pipeline/   async prefetch, train/valid/test scheduling
                (reference: src/engine/ipc_service.cu — obsoleted by
                same-process async dispatch on TPU)
  - native/     C++ host runtime (mmap loaders, parallel feature gather,
                edge-list -> CSR converter)

int64 note: billion-edge graphs need 64-bit CSR offsets; we enable JAX x64
at import and keep all floating point math explicitly float32/bfloat16.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: sampler/train-step programs at production
# shapes take minutes to compile (XLA TPU scatter lowering is heavy); cache
# executables across processes. Override location with LEGION_TPU_CACHE_DIR,
# disable with LEGION_TPU_CACHE_DIR="".
_cache_dir = _os.environ.get(
    "LEGION_TPU_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "legion_tpu_xla"))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from legion_tpu.config import (  # noqa: E402
    DatasetMeta,
    SamplerConfig,
    CacheConfig,
    TrainConfig,
    MeshConfig,
    LegionConfig,
)
from legion_tpu.graph import CSRGraph  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "DatasetMeta",
    "SamplerConfig",
    "CacheConfig",
    "TrainConfig",
    "MeshConfig",
    "LegionConfig",
    "CSRGraph",
]

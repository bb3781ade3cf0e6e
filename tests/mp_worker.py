"""Standalone worker for the 2-process multi-host test (launched by
test_multiprocess.py, NOT collected by pytest). Each process contributes 4
virtual CPU devices to an 8-device ("host", "clique", "member") mesh and
trains the same synthetic dataset; losses must match across processes
(gradient pmean crosses the process boundary over gloo)."""

import json
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from legion_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,  # noqa
                               SamplerConfig, TrainConfig)
from legion_tpu.data import synthesize_dataset  # noqa: E402
from legion_tpu.pipeline import Mode  # noqa: E402
from legion_tpu.train import Trainer  # noqa: E402

ds = synthesize_dataset(num_nodes=3000, avg_degree=8, feature_dim=16,
                        num_classes=5, batch_size=32, train_frac=0.5,
                        seed=11)
mesh = multihost.make_multihost_mesh(clique_size=2)
cfg = LegionConfig(
    dataset=ds.meta,
    sampler=SamplerConfig(fanouts=(4, 3), batch_size=32,
                          eval_batch_size=32, dedup="sort",
                          auto_compact=False),
    cache=CacheConfig(),
    train=TrainConfig(model="graphsage", hidden_dim=16, epochs=1,
                      compute_dtype="float32"),
    mesh=MeshConfig.for_devices(4, clique_size=2),
)
trainer = Trainer(ds, cfg, mesh=mesh)
assert dict(trainer.mesh.shape) == {"host": nproc, "clique": 2,
                                    "member": 2}, trainer.mesh.shape
state = trainer.init_state()
losses = []
for _ in range(4):
    state, loss = trainer.train_step(state)
    losses.append(round(float(loss), 6))
state, acc = trainer.run_eval(state, Mode.VALID)
print("RESULT " + json.dumps({"pid": pid, "losses": losses,
                              "acc": round(float(acc), 6)}), flush=True)

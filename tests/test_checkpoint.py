"""Checkpoint/resume: save mid-training, restore into a fresh Trainer, and
verify bit-identical continuation."""

import jax
import jax.numpy as jnp
import numpy as np

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                               SamplerConfig, TrainConfig)
from legion_tpu.train import Trainer
from legion_tpu.utils import restore_checkpoint, save_checkpoint


def _cfg(ds):
    return LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=32,
                              eval_batch_size=32),
        cache=CacheConfig(),
        train=TrainConfig(model="graphsage", hidden_dim=16, epochs=2),
        mesh=MeshConfig.for_devices(1),
    )


def test_save_restore_resume_identical(small_dataset, tmp_path):
    ds = small_dataset
    trainer = Trainer(ds, _cfg(ds))
    state = trainer.init_state()
    for _ in range(3):
        state, loss = trainer.train_step(state)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=3)

    # continue original
    cont = state
    for _ in range(2):
        cont, loss_a = trainer.train_step(cont)

    # restore into a FRESH trainer and continue
    trainer2 = Trainer(ds, _cfg(ds))
    restored = restore_checkpoint(str(tmp_path / "ckpt"), trainer2)
    assert int(restored["train_ctr"]) == 3
    for _ in range(2):
        restored, loss_b = trainer2.train_step(restored)

    assert float(loss_a) == float(loss_b)
    la = jax.tree_util.tree_leaves(cont["params"])
    lb = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

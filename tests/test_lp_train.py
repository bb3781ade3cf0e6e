"""End-to-end link-prediction (lp_sage) training: loss decreases over
epochs, eval metric is mean loss (reference lp_sage.py:206-215)."""

import numpy as np

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                               SamplerConfig, TrainConfig)
from legion_tpu.train import Trainer


def test_lp_sage_trains(small_dataset):
    ds = small_dataset
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=66,
                              eval_batch_size=66),
        cache=CacheConfig(),
        train=TrainConfig(model="lp_sage", hidden_dim=32, epochs=4,
                          dropout=0.2),
        mesh=MeshConfig.for_devices(2),
    )
    trainer = Trainer(ds, cfg)
    assert trainer.is_lp
    state, stats = trainer.fit(verbose=False)
    losses = [s.train_loss for s in stats]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    # valid_acc holds the mean eval loss for lp models
    assert np.isfinite(stats[-1].valid_acc)
    assert stats[-1].valid_acc < stats[0].valid_acc

"""End-to-end training with host features served by the clique-aggregated
cache over a (1 clique x 4 member) mesh."""

import numpy as np

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,
                               SamplerConfig, TrainConfig)
from legion_tpu.train import Trainer


def test_clique_cached_training_learns(small_dataset):
    ds = small_dataset
    feat_dim = ds.meta.feature_dim
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=(4, 3), batch_size=16,
                              eval_batch_size=64),
        # group budget covers 400 hot rows of the 2000 vertices
        cache=CacheConfig(cache_bytes=100 * feat_dim * 4,
                          feature_residency="host", presample_steps=4),
        train=TrainConfig(model="graphsage", hidden_dim=32, epochs=8,
                          dropout=0.2),
        mesh=MeshConfig(num_cliques=1, clique_size=4),
    )
    trainer = Trainer(ds, cfg)
    assert trainer._use_clique
    assert trainer.cache_plan.feature_capacity > 0
    state, stats = trainer.fit(verbose=False)
    assert stats[-1].train_loss < stats[0].train_loss * 0.7
    assert stats[-1].valid_acc > 0.5, stats
    # the collective path must actually serve hits
    assert int(trainer.last_feat_hits) > 0

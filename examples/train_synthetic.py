"""Train GraphSAGE end-to-end on a synthetic power-law community graph.

Usage:
    python examples/train_synthetic.py --nodes 50000 --model graphsage
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from legion_tpu.config import (CacheConfig, LegionConfig, MeshConfig,  # noqa
                               SamplerConfig, TrainConfig)
from legion_tpu.data import synthesize_dataset  # noqa: E402
from legion_tpu.train import Trainer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--avg-degree", type=int, default=15)
    ap.add_argument("--feature-dim", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--fanouts", type=int, nargs="+", default=[10, 5])
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--model", default="graphsage",
                    choices=["graphsage", "gcn", "gat"])
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--devices", type=int, default=1)
    args = ap.parse_args()

    ds = synthesize_dataset(
        num_nodes=args.nodes, avg_degree=args.avg_degree,
        feature_dim=args.feature_dim, num_classes=args.classes,
        batch_size=args.batch, seed=0)
    cfg = LegionConfig(
        dataset=ds.meta,
        sampler=SamplerConfig(fanouts=tuple(args.fanouts),
                              batch_size=args.batch),
        cache=CacheConfig(),
        train=TrainConfig(model=args.model, hidden_dim=args.hidden,
                          epochs=args.epochs),
        mesh=MeshConfig.for_devices(args.devices),
    )
    trainer = Trainer(ds, cfg)
    print(f"schedule: {trainer.schedule}")
    state, stats = trainer.fit()


if __name__ == "__main__":
    main()

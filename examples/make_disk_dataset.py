"""Write a learnable Legion-format dataset to disk for end-to-end runs.

Generates the homophilous graph from ab_accuracy.py (class-clustered
features + homophilous edges, so val/test accuracy reflects real
learning) and writes it in the Legion binary layout. Drive training off
it with the launcher, exercising the mmap loaders end to end:

  python examples/make_disk_dataset.py --out /tmp/legion_ds
  python -m legion_tpu.run --dataset-name custom --dataset-path /tmp/legion_ds \
      --train-batch-size 2000 --epoch 3 --hidden 128
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ab_accuracy import homophilous_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--avg-degree", type=int, default=25)
    ap.add_argument("--feature-dim", type=int, default=64)
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ds = homophilous_dataset(args.nodes, args.avg_degree,
                             args.feature_dim, args.classes,
                             batch_size=2000, seed=args.seed)
    from legion_tpu.data.format import write_legion_dataset
    write_legion_dataset(args.out, ds.graph, ds.features, ds.labels,
                         ds.train_ids, ds.valid_ids, ds.test_ids)
    print(f"wrote {args.out}: V={ds.meta.num_nodes} "
          f"E={ds.meta.num_edges} F={ds.meta.feature_dim} "
          f"classes={ds.meta.num_classes}")


if __name__ == "__main__":
    main()

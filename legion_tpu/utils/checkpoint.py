"""Checkpoint/resume via Orbax.

The reference has NO checkpointing (SURVEY.md §5 — a crash loses the run and
leaves stale IPC segments behind); this is table stakes for the rebuild.

What is saved: params, optimizer state, the schedule counters, and the base
RNG key — everything needed to resume mid-epoch deterministically. The
position map and eval accumulators are scratch (pos_map is INT32_MAX-clean
between batches by construction) and are re-created on restore.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

_SAVED_KEYS = ("params", "opt_state", "train_ctr", "valid_ctr", "test_ctr",
               "base_key")


def save_checkpoint(path: str, state: Dict, step: int) -> None:
    """Write checkpoint for `state` (a Trainer state dict) at `step`."""
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        payload = {k: state[k] for k in _SAVED_KEYS}
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()


def latest_step(path: str) -> int:
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        s = mgr.latest_step()
    return -1 if s is None else int(s)


def restore_checkpoint(path: str, trainer, step: int = -1) -> Dict:
    """Restore into a fresh Trainer state (pos_map/metrics re-initialized)."""
    path = os.path.abspath(path)
    state = trainer.init_state()
    with ocp.CheckpointManager(path) as mgr:
        if step < 0:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {path}")
        template = {k: state[k] for k in _SAVED_KEYS}
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    out = dict(state)
    for k in _SAVED_KEYS:
        out[k] = restored[k]
    # the inter-batch pipeline carry is scratch: re-sample it for the
    # restored train_ctr (init_state primed it for ctr=0)
    if hasattr(trainer, "prime_carry"):
        out = trainer.prime_carry(out)
    return out

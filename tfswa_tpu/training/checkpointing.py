"""Orbax checkpointing with the reference's epoch/best/latest semantics
(reference: trainer.py:525-573: checkpoint_epoch_{n}.pt / best_model.pt /
latest_model.pt written via torch.save).

Layout:
    ckpt_dir/
      epoch_{n:06d}/   orbax pytree {params, batch_stats, opt_state, meta}
      best/            copy of the best checkpoint so far
      latest/          copy of the most recent checkpoint
      config.json      full Config for reconstruction at load time
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Saves/restores train state with best/latest tracking."""

    def __init__(self, ckpt_dir: str, config: Optional[Config] = None,
                 keep: int = 5):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()
        if config is not None:
            with open(os.path.join(self.ckpt_dir, "config.json"), "w") as fh:
                json.dump(config.to_dict(), fh, indent=2)

    # ------------------------------------------------------------------ io
    def _save_tree(self, path: str, tree: Dict) -> None:
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, _to_host(tree))
        self._ckptr.wait_until_finished()

    def save(
        self,
        state,
        epoch: int,
        global_step: int,
        best_val_loss: float,
        is_best: bool = False,
    ) -> str:
        """Save epoch checkpoint + update latest (and best when flagged)
        (reference: trainer.py:525-554)."""
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "meta": {
                "epoch": epoch,
                "global_step": global_step,
                "best_val_loss": best_val_loss,
            },
        }
        path = os.path.join(self.ckpt_dir, f"epoch_{epoch:06d}")
        self._save_tree(path, tree)
        self._save_tree(os.path.join(self.ckpt_dir, "latest"), tree)
        if is_best:
            self._save_tree(os.path.join(self.ckpt_dir, "best"), tree)
        self._gc()
        return path

    def _gc(self) -> None:
        epochs = sorted(
            d for d in os.listdir(self.ckpt_dir) if d.startswith("epoch_")
        )
        for d in epochs[: -self.keep] if self.keep > 0 else []:
            shutil.rmtree(os.path.join(self.ckpt_dir, d), ignore_errors=True)

    def restore(self, which: str = "latest", state=None) -> Tuple[Dict, Dict]:
        """Restore (tree, meta).  With a template ``state``, opt_state keeps
        its optax structure; without, arrays come back as nested dicts
        (enough for inference)."""
        path = os.path.join(self.ckpt_dir, which)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        if state is not None:
            template = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "meta": {"epoch": 0, "global_step": 0, "best_val_loss": 0.0},
            }
            template = jax.tree_util.tree_map(np.asarray, template)
            tree = self._ckptr.restore(path, template)
        else:
            tree = self._ckptr.restore(path)
        return tree, tree.get("meta", {})


def restore_variables(
    checkpoint_path: str,
) -> Tuple[Dict, Optional[Dict]]:
    """Restore {'params', 'batch_stats'} for inference from a checkpoint dir
    (either an epoch dir or a ckpt_dir containing best/latest)."""
    path = checkpoint_path
    if os.path.isdir(os.path.join(path, "best")):
        path = os.path.join(path, "best")
    elif os.path.isdir(os.path.join(path, "latest")):
        path = os.path.join(path, "latest")
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    cfg = None
    for cfg_dir in (checkpoint_path, os.path.dirname(path)):
        cfg_path = os.path.join(cfg_dir, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as fh:
                cfg = json.load(fh)
            break
    return variables, cfg

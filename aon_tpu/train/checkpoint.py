"""Checkpointing: orbax-backed, val/psnr-ranked top-k retention + last.

Replaces the reference's Lightning ``ModelCheckpoint`` (``run.py:62-71``:
monitor val/psnr mode max, save_top_k=5, save_last, every_n_epochs=10).
State saved is {params, opt_state, step}; latent tables are params leaves so
the auto-decoder's code library checkpoints for free (cf. the reference's
manual ``load_latent_codes`` surgery, utils/__init__.py:117-147).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 5):
        self.directory = os.path.abspath(directory)
        self.save_top_k = save_top_k
        os.makedirs(self.directory, exist_ok=True)
        self._index_path = os.path.join(self.directory, "index.json")
        self._ckptr = ocp.StandardCheckpointer()
        self._index = {"ranked": [], "last": None}
        if os.path.exists(self._index_path):
            with open(self._index_path) as fh:
                self._index = json.load(fh)

    def _write_index(self):
        with open(self._index_path, "w") as fh:
            json.dump(self._index, fh, indent=2)

    def _save_tree(self, name: str, state: Any) -> str:
        path = os.path.join(self.directory, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()
        return path

    def save_last(self, state: Any, epoch: int) -> None:
        self._save_tree("last.ckpt", state)
        self._index["last"] = {"name": "last.ckpt", "epoch": epoch, "step": int(state.step)}
        self._write_index()

    def save_ranked(self, state: Any, epoch: int, val_psnr: float) -> None:
        name = f"epoch={epoch}.ckpt"
        self._save_tree(name, state)
        ranked = [r for r in self._index["ranked"] if r["name"] != name]
        ranked.append({"name": name, "epoch": epoch, "psnr": float(val_psnr)})
        ranked.sort(key=lambda r: -r["psnr"])
        for stale in ranked[self.save_top_k :]:
            p = os.path.join(self.directory, stale["name"])
            if os.path.exists(p):
                shutil.rmtree(p)
        self._index["ranked"] = ranked[: self.save_top_k]
        self._write_index()

    def restore(self, state: Any, name: Optional[str] = None) -> Any:
        """Restore into the structure of ``state`` (a fresh init)."""
        name = name or "last.ckpt"
        # --ckpt_path may be a full path to any checkpoint dir (reference
        # run.py:156-163); bare names resolve inside this run's directory
        if os.path.isdir(name):
            path = os.path.abspath(name)  # orbax requires absolute paths
        else:
            path = os.path.join(self.directory, name)
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        tree = self._ckptr.restore(path, target=template)
        return state.replace(
            params=tree["params"], opt_state=tree["opt_state"], step=int(tree["step"])
        )

    def best(self) -> Optional[dict]:
        return self._index["ranked"][0] if self._index["ranked"] else None


def extract_model_params(tree: Any, prefix: str = "model") -> Any:
    """Pull one params subtree out of a checkpointed params dict — the
    analogue of the reference's ``extract_model_state_dict`` prefix surgery
    (utils/__init__.py:117-131); with pytrees this is a key lookup."""
    return tree[prefix] if isinstance(tree, dict) and prefix in tree else tree


def load_latent_codes(directory: str, name: str = "last.ckpt") -> Any:
    """Restore only the auto-decoder latent tables from a checkpoint
    (reference ``load_latent_codes``, utils/__init__.py:140-147).

    Returns the ``code_library`` params subtree as host numpy arrays.
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.join(directory, name)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    params = tree["params"] if "params" in tree else tree
    if "code_library" not in params:
        raise KeyError(f"no code_library subtree in checkpoint {path}")
    return jax.tree.map(np.asarray, params["code_library"])

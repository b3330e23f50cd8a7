"""Checkpointing with the reference's artifact contract.

Parity with /root/reference/deepclr/utils/checkpoint.py:12-99:
  * full checkpoints ``ckpt_{it}.msgpack`` = {epoch, iteration, train state},
  * weights-only ``weights_{it}.msgpack`` (params pytree, loadable by
    models.load_weights),
  * ``ckpt.msgpack`` / ``weights.msgpack`` symlinks to the latest,
  * rolling window of ``n_saved`` regular checkpoints,
  * special checkpoints (final / interrupt / exception) kept outside the ring.

Serialization is flax msgpack; restoring requires a template state (the
freshly initialized one), which guarantees structural compatibility.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, List

import flax.serialization

__all__ = ["Checkpointer", "load_checkpoint_bytes", "restore_checkpoint"]


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _relink(link: str, target: str) -> None:
    if osp.islink(link) or osp.exists(link):
        os.remove(link)
    os.symlink(osp.basename(target), link)


class Checkpointer:
    """Writes full + weights-only checkpoints with latest-symlinks."""

    def __init__(self, output_dir: str, n_saved: int = 10,
                 create_dir: bool = True):
        self._dir = output_dir
        self._n_saved = n_saved
        self._saved: List[str] = []
        if create_dir:
            os.makedirs(output_dir, exist_ok=True)

    def _write(self, tag: str, epoch: int, iteration: int, state: Any,
               params: Any, ema_params: Any = None) -> str:
        payload: Dict[str, Any] = {
            "epoch": epoch,
            "iteration": iteration,
            "state": state,
        }
        ckpt_path = osp.join(self._dir, f"ckpt_{tag}.msgpack")
        weights_path = osp.join(self._dir, f"weights_{tag}.msgpack")
        _atomic_write(ckpt_path, flax.serialization.to_bytes(payload))
        _atomic_write(weights_path, flax.serialization.to_bytes(params))
        _relink(osp.join(self._dir, "ckpt.msgpack"), ckpt_path)
        _relink(osp.join(self._dir, "weights.msgpack"), weights_path)
        if ema_params is not None:
            # Polyak-averaged weights (optimizer.weight_ema_decay > 0):
            # same variables-dict format, separate artifact so inference can
            # pick either via --weights
            ema_path = osp.join(self._dir, f"weights_ema_{tag}.msgpack")
            _atomic_write(ema_path, flax.serialization.to_bytes(ema_params))
            _relink(osp.join(self._dir, "weights_ema.msgpack"), ema_path)
        return ckpt_path

    def save_checkpoint(self, epoch: int, iteration: int, state: Any,
                        params: Any, ema_params: Any = None) -> str:
        """Regular checkpoint; prunes the ring buffer beyond n_saved."""
        path = self._write(str(iteration), epoch, iteration, state, params,
                           ema_params)
        self._saved.append(str(iteration))
        while len(self._saved) > self._n_saved:
            tag = self._saved.pop(0)
            for prefix in ("ckpt", "weights", "weights_ema"):
                old = osp.join(self._dir, f"{prefix}_{tag}.msgpack")
                if osp.exists(old):
                    os.remove(old)
        return path

    def save_special_checkpoint(self, name: str, epoch: int, iteration: int,
                                state: Any, params: Any,
                                ema_params: Any = None) -> str:
        """final / interrupt / exception checkpoints, never pruned."""
        return self._write(f"{name}_{iteration}", epoch, iteration, state,
                           params, ema_params)


def load_checkpoint_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def restore_checkpoint(path: str, state_template: Any) -> Dict[str, Any]:
    """Restore {'epoch', 'iteration', 'state'} against a template state."""
    template = {"epoch": 0, "iteration": 0, "state": state_template}
    return flax.serialization.from_bytes(template, load_checkpoint_bytes(path))

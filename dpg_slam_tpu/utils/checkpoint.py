"""Checkpoint / resume for SLAM sessions.

The reference has no persistence — a crash loses the session; its only
recovery story is that (nodes, odometry log) suffice to rebuild the graph
in reoptimize() (SURVEY.md §5). Here the entire engine state is one pytree
of arrays, so checkpointing is orbax-native: save the SlamState + config,
restore into a fresh engine, and `reoptimize` (or just continue) works.
"""

from __future__ import annotations

import json
import pathlib

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]

_STATE_FILE = "state.npz"
_CONFIG_FILE = "config.json"


def _flatten_state(state) -> dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str | pathlib.Path, engine) -> None:
    """Persist an engine session (config + full array state).

    Uses a plain npz + json pair: the state is a flat dict of arrays, which
    keeps checkpoints portable across refactors (orbax's tree-structure
    checkpoints break when a NamedTuple field is added). Atomic via
    write-to-temp + rename.
    """
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = _flatten_state(engine.state)
    tmp = path / (_STATE_FILE + ".tmp")
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **flat)
    tmp.replace(path / _STATE_FILE)
    (path / _CONFIG_FILE).write_text(engine.config.to_json())


def load_checkpoint(path: str | pathlib.Path):
    """Restore an engine from a checkpoint directory.

    Fields present in the current SlamState but missing from the
    checkpoint keep their initialized defaults (forward compatibility);
    unknown stored fields are ignored.
    """
    from dpg_slam_tpu.config import DpgConfig
    from dpg_slam_tpu.engine import DpgSlamEngine

    path = pathlib.Path(path)
    config = DpgConfig.from_json((path / _CONFIG_FILE).read_text())
    engine = DpgSlamEngine(config)

    stored = dict(np.load(path / _STATE_FILE, allow_pickle=False))
    state = engine.state
    current = _flatten_state(state)

    import jax.numpy as jnp

    def rebuild(obj, prefix=""):
        if hasattr(obj, "_fields"):  # NamedTuple pytree node
            vals = {}
            for name in obj._fields:
                child = getattr(obj, name)
                key = f"{prefix}{name}"
                if hasattr(child, "_fields"):
                    vals[name] = rebuild(child, prefix=key + "/")
                elif key in stored:
                    vals[name] = jnp.asarray(stored[key])
                else:
                    vals[name] = child
            return type(obj)(**vals)
        return obj

    engine.state = rebuild(state)
    # Sanity: shapes must match the config-derived capacities.
    for key, arr in _flatten_state(engine.state).items():
        if key in current and current[key].shape != arr.shape:
            raise ValueError(
                f"checkpoint field {key} has shape {arr.shape}, "
                f"config expects {current[key].shape}"
            )
    return engine

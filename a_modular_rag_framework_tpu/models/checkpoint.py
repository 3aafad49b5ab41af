"""Training-state checkpoint/resume for the encoder (orbax-backed).

The reference had no run checkpointing (SURVEY.md §5: "checkpoint/resume —
absent for runs"); here the training loop can stop and resume exactly:
(params, opt_state, step) round-trip through orbax, with a numpy .npz
fallback when orbax is unavailable.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}


def _unflatten(template, data) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        if key not in data:
            raise KeyError(f"missing checkpoint leaf {key}")
        leaves.append(np.asarray(data[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(path: str | Path, params, opt_state, step: int) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save((path / f"state_{step}").resolve(),
                   {"params": params, "opt_state": opt_state},
                   force=True)
        ckptr.wait_until_finished()
    except Exception as e:
        logger.warning("orbax save failed (%r); using npz fallback", e)
        np.savez(path / f"state_{step}.npz",
                 **{f"params/{k}": v for k, v in _flatten(params).items()},
                 **{f"opt/{k}": v for k, v in _flatten(opt_state).items()})
    (path / "latest.json").write_text(json.dumps({"step": step}))


def restore_train_state(
    path: str | Path, params_template, opt_state_template
) -> Optional[Tuple[Any, Any, int]]:
    """Return (params, opt_state, step) or None when no checkpoint exists."""
    path = Path(path)
    latest = path / "latest.json"
    if not latest.exists():
        return None
    step = int(json.loads(latest.read_text())["step"])

    ckpt_dir = path / f"state_{step}"
    if ckpt_dir.exists():
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(
                ckpt_dir.resolve(),
                {"params": params_template, "opt_state": opt_state_template},
            )
            return restored["params"], restored["opt_state"], step
        except Exception as e:
            logger.warning("orbax restore failed (%r); trying npz", e)

    npz = path / f"state_{step}.npz"
    if npz.exists():
        data = np.load(npz)
        params = _unflatten(params_template,
                            {k[len("params/"):]: data[k] for k in data.files
                             if k.startswith("params/")})
        opt_state = _unflatten(opt_state_template,
                               {k[len("opt/"):]: data[k] for k in data.files
                                if k.startswith("opt/")})
        return params, opt_state, step
    return None

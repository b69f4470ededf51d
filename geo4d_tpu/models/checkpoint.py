"""Native checkpoint save/restore (orbax) + torch import entry point.

Parity surface: the reference accepts Lightning and DeepSpeed torch formats
(infer_geo4d.py:53-80); our native format is an orbax checkpoint of the
params pytree (+ optional TrainState for mid-run resume — a capability the
reference lacks: SURVEY.md §5 'Checkpoint/resume: model checkpoints only').
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, params: Any, step: Optional[int] = None):
    """Save a params pytree (or full TrainState) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (shape/dtype source)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template
    )
    return ckptr.restore(path, target)


def import_torch_checkpoint(
    ckpt_path: str,
    vae_ckpt_path: Optional[str],
    out_path: str,
    image_size=(256, 576),
):
    """One-shot torch -> orbax conversion (the `.ckpt`s from the reference's
    data/download_ckpt.sh). Re-runs of the pipeline then load orbax directly."""
    from geo4d_tpu.cli.common import build_model_and_params

    _, params = build_model_and_params(ckpt_path, vae_ckpt_path, image_size)
    save_checkpoint(out_path, params)
    return out_path

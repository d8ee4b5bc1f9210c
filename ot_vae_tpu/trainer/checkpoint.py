"""Checkpointing: Orbax pytree checkpoints + transform-spec sidecar +
partial checkpoint loading
(reference: Lightning ModelCheckpoint + inference-transform persistence
model/base.py:231-241 + PartialCheckpoint utils/partial_checkpoint.py:24-78).
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ot_vae_tpu.data.transforms import from_spec, to_spec

__all__ = ["save_checkpoint", "load_checkpoint", "PartialCheckpoint",
           "apply_partial_checkpoints", "human_format"]


def human_format(num: float) -> str:
    """1234567 → '1.23M' (reference: utils/partial_checkpoint.py)."""
    num = float(f"{num:.3g}")
    magnitude = 0
    while abs(num) >= 1000:
        magnitude += 1
        num /= 1000.0
    return f"{num:g}{['', 'K', 'M', 'B', 'T'][magnitude]}"


def save_checkpoint(path, state, model=None, metadata: Optional[dict] = None):
    """Save a TrainState (or raw variables pytree) + a JSON sidecar carrying
    the model's inference transforms so a restored model can consume raw data
    (reference: model/base.py:231-241)."""
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    tree = dataclasses.asdict(state) if dataclasses.is_dataclass(state) else state
    if hasattr(state, "params"):  # TrainState (flax PyTreeNode)
        tree = {
            "step": state.step,
            "params": state.params,
            "mutable": state.mutable,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
        }
    ckptr.save(path, tree, force=True)
    # multi-process: every process participates in the orbax save (it
    # coordinates internally over the jax.distributed runtime), but the JSON
    # sidecar is plain file IO — primary-only to avoid write races
    if jax.process_index() == 0:
        side = dict(metadata or {})
        if model is not None:
            side["inference_preprocess"] = to_spec(model.inference_preprocess)
            side["inference_postprocess"] = to_spec(model.inference_postprocess)
        with open(path / "sidecar.json", "w") as f:
            json.dump(side, f)


def load_checkpoint(path, model=None):
    """Load the raw pytree + sidecar; if ``model`` is given, restore its
    variables and inference transforms (reference: model/base.py:237-241)."""
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(path)
    side = {}
    sidecar = path / "sidecar.json"
    if sidecar.exists():
        with open(sidecar) as f:
            side = json.load(f)
    if model is not None:
        params = tree["params"]
        mutable = tree.get("mutable") or {}
        model.variables = {"params": params, **mutable}
        if "inference_preprocess" in side:
            model.inference_preprocess = from_spec(side["inference_preprocess"])
        if "inference_postprocess" in side:
            model.inference_postprocess = from_spec(side["inference_postprocess"])
    return tree, side


@dataclasses.dataclass
class PartialCheckpoint:
    """Load a sub-tree of a checkpoint's params into one attribute path of a
    model's params, with key-prefix rewrite and optional freeze
    (reference: utils/partial_checkpoint.py:24-78).

    :param checkpoint_path: checkpoint directory (as saved by save_checkpoint)
    :param replace_str: source subtree path in the checkpoint params,
                        '/'-separated (e.g. 'autoencoder/encoder')
    :param strict: require the subtree structures to match exactly
    :param freeze: mark the loaded subtree as non-trainable
    """

    checkpoint_path: str
    replace_str: str = ""
    strict: bool = True
    freeze: bool = False

    def subtree(self, collection: str = "params"):
        tree, _ = load_checkpoint(self.checkpoint_path)
        if collection == "params":
            node = tree["params"]
        else:
            node = (tree.get("mutable") or {}).get(collection)
        if node is None:
            return None
        if self.replace_str:
            for part in self.replace_str.split("/"):
                if not isinstance(node, dict) or part not in node:
                    return None
                node = node[part]
        return node


def _set_path(tree: Dict, path: str, value) -> Dict:
    tree = dict(tree)
    parts = path.split("/")
    if len(parts) == 1:
        tree[parts[0]] = value
        return tree
    tree[parts[0]] = _set_path(dict(tree[parts[0]]), "/".join(parts[1:]), value)
    return tree


def _get_path(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def apply_partial_checkpoints(variables, checkpoints: Dict[str, PartialCheckpoint]):
    """Graft checkpoint subtrees into the model variables.

    Grafts every collection present on both sides (params, batch_stats,
    prior_stats, ...) — the reference's state_dict-based loading moves module
    buffers (e.g. batchnorm running stats) along with the weights
    (reference hook: model/base.py:192-195, utils/partial_checkpoint.py:24-78).
    """
    variables = dict(variables)
    for attr, pc in checkpoints.items():
        for collection in variables:
            sub = pc.subtree(collection)
            if sub is None:
                continue
            try:
                target = _get_path(variables[collection], attr)
            except (KeyError, TypeError):
                continue
            if pc.strict and collection == "params":
                t_struct = jax.tree_util.tree_structure(target)
                s_struct = jax.tree_util.tree_structure(sub)
                if t_struct != s_struct:
                    raise ValueError(
                        f"partial checkpoint structure mismatch for '{attr}':"
                        f" {s_struct} vs {t_struct}"
                    )
            variables[collection] = _set_path(variables[collection], attr, sub)
    return variables

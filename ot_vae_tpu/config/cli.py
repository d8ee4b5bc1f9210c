"""YAML config system + CLI
(reference: VisionCLI/DadCLI + jsonargparse class_path/init_args configs,
ot_vae_lightning/model/base.py:295-352, model/discrete_auto_diffuser.py:98-135,
configs/*.yaml, run.sh).

Capabilities kept from the reference:
* ``class_path``/``init_args`` polymorphic instantiation
* composable configs — repeated ``-c`` flags deep-merged left to right
* cross-field shape links (the load-bearing part): data img size → networks,
  encoder ``out_size`` → prior ``latent_size``, encoder token count → decoder
  and AR-decoder ``n_input_tokens``, prior ``num_embeddings`` → AR
  ``vocab_size``, data inference transforms → model
* config snapshot saved as ``cli_config.yaml``
"""
from __future__ import annotations

import argparse
import copy
import importlib
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

__all__ = ["load_configs", "instantiate", "build", "main", "parse_overrides", "apply_overrides"]

# bare scientific notation that YAML 1.1 mis-reads as a string ("1e-4",
# "2.5E+3") — the ONLY shape parse_overrides coerces to float
_SCI_NOTATION = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)[eE][+-]?\d+$")


def _deep_merge(base: Dict, extra: Dict) -> Dict:
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_configs(paths: List[str]) -> Dict:
    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = _deep_merge(cfg, yaml.safe_load(f) or {})
    return cfg


def _import_path(path: str):
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate(node: Any) -> Any:
    """Recursively build objects from {class_path, init_args} nodes
    (jsonargparse semantics; reference configs/vae/defaults.yaml)."""
    if isinstance(node, dict):
        if "class_path" in node:
            cls = _import_path(node["class_path"])
            kwargs = {k: instantiate(v) for k, v in (node.get("init_args") or {}).items()}
            return cls(**kwargs)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def _get(node: Dict, *path, default=None):
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return default
        node = node[p]
    return node


def _setdefault(node: Dict, *path, value):
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node.setdefault(path[-1], value)


def apply_links(cfg: Dict) -> Dict:
    """Cross-field shape links (reference: model/base.py:296-346 VisionCLI +
    discrete_auto_diffuser.py:99-135 DadCLI). Links only fill values the user
    left unset."""
    cfg = copy.deepcopy(cfg)
    model_args = _get(cfg, "model", "init_args", default={})

    # top-level precision: bf16 → network dtype=bfloat16 (activations bf16,
    # params/optimizer stay f32 — the TPU mixed-precision recipe; reference:
    # Lightning AMP flag `precision: 16`, configs/ddp.yaml:5)
    prec = cfg.get("precision")
    if prec in ("bf16", "bfloat16", 16, "16"):
        import jax.numpy as jnp

        for key in ("encoder", "decoder", "autoencoder",
                    "autoregressive_decoder"):
            node = model_args.get(key)
            if isinstance(node, dict) and "class_path" in node:
                _setdefault(node, "init_args", "dtype", value=jnp.bfloat16)
    elif prec not in (None, "f32", "float32", 32, "32"):
        raise ValueError(f"unknown precision {prec!r} (use bf16 or f32)")

    # data img size → ViT image_size (DadCLI: data.IMG_SIZE link)
    data_node = cfg.get("data")
    img_size = None
    if data_node:
        data_probe = instantiate(copy.deepcopy(data_node))
        img_size = getattr(data_probe, "img_size", None)

    def is_vit(node):
        return isinstance(node, dict) and "ViT" in str(node.get("class_path", "")) or (
            isinstance(node, dict) and "AutoRegressive" in str(node.get("class_path", ""))
        )

    for key in ("encoder", "decoder", "autoregressive_decoder"):
        node = model_args.get(key)
        if is_vit(node) and img_size is not None:
            _setdefault(node, "init_args", "image_size", value=img_size[0])

    # encoder-dependent links need a constructed encoder (shape contracts are
    # config-only properties — no parameters are created here)
    enc_node = model_args.get("encoder")
    if isinstance(enc_node, dict) and "class_path" in enc_node:
        encoder = instantiate(copy.deepcopy(enc_node))
        out_size = tuple(getattr(encoder, "out_size", ()) or ())
        total_tokens = getattr(encoder, "total_num_tokens", None)

        # encoder out_size → prior latent_size (DadCLI last link)
        prior_node = model_args.get("prior")
        if isinstance(prior_node, dict) and "class_path" in prior_node and out_size:
            if "CodebookPrior" in prior_node["class_path"]:
                _setdefault(prior_node, "init_args", "latent_size", value=list(out_size))

        # encoder token count → decoder / AR-decoder n_input_tokens
        for key in ("decoder", "autoregressive_decoder"):
            node = model_args.get(key)
            if is_vit(node) and total_tokens is not None:
                _setdefault(node, "init_args", "n_input_tokens", value=total_tokens)

        # prior num_embeddings → AR vocab_size
        ar_node = model_args.get("autoregressive_decoder")
        if isinstance(ar_node, dict) and isinstance(prior_node, dict):
            n_comp = _get(prior_node, "init_args", "n_components")
            if n_comp is not None:
                _setdefault(ar_node, "init_args", "vocab_size", value=n_comp)

    return cfg


def _inject_default_callbacks(trainer, model) -> None:
    """Reference parity (VisionCLI, model/base.py:311-342): every run gets
    EarlyStopping, a top-10 ModelCheckpoint with a monitor-linked filename,
    and a Collage logger UNLESS the config already lists a callback of that
    type — so a default ``run.sh`` fit writes checkpoints and collages out
    of the box. Opt out with ``trainer: {default_callbacks: false}``."""
    from ot_vae_tpu.trainer.callbacks import (
        Collage,
        EarlyStopping,
        ModelCheckpointCallback,
    )

    have = {type(cb) for cb in trainer.callbacks}
    monitor = getattr(model, "monitor", None)
    if EarlyStopping not in have:
        # reference defaults: min_delta 0.1, patience 5 (model/base.py:316-324)
        trainer.callbacks.append(EarlyStopping(min_delta=0.1, patience=5))
    if ModelCheckpointCallback not in have:
        # reference defaults: save_top_k 10, filename carries the monitored
        # metric's name and value (model/base.py:327-333)
        filename = (
            f"epoch{{epoch:02d}}-{monitor}{{value:.3f}}"
            if monitor else "epoch{epoch:02d}-{value:.3f}"
        )
        trainer.callbacks.append(
            ModelCheckpointCallback(save_top_k=10, filename=filename)
        )
    if Collage not in have:
        trainer.callbacks.append(Collage())


def build(cfg: Dict):
    """Instantiate (model, datamodule, trainer) from a merged config."""
    cfg = apply_links(cfg)
    model = instantiate(cfg["model"])
    datamodule = instantiate(cfg["data"])
    trainer_cfg = cfg.get("trainer", {})
    default_callbacks = True
    if isinstance(trainer_cfg, dict):
        # the opt-out works for BOTH trainer forms: plain kwargs dicts and
        # class_path trainers (popped before instantiation either way)
        trainer_cfg = dict(trainer_cfg)
        default_callbacks = trainer_cfg.pop("default_callbacks", True)
    if isinstance(trainer_cfg, dict) and "class_path" not in trainer_cfg:
        from ot_vae_tpu.trainer import Trainer

        trainer_cfg = {k: instantiate(v) for k, v in trainer_cfg.items()}
        trainer = Trainer(**trainer_cfg)
    else:
        trainer = instantiate(trainer_cfg)
    if default_callbacks and hasattr(trainer, "callbacks"):
        _inject_default_callbacks(trainer, model)
    return model, datamodule, trainer


def parse_overrides(extras: List[str]) -> List[tuple]:
    """jsonargparse-grade dotted command-line overrides (reference:
    LightningCLI accepts ``--model.init_args...`` for any config field,
    model/base.py:295-352): ``--a.b.c=value`` or ``--a.b.c value``; values
    are YAML-parsed (``16`` → int, ``[1,2]`` → list, ``null`` → None)."""
    overrides, i = [], 0
    while i < len(extras):
        tok = extras[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unrecognized argument: {tok}")
        tok = tok[2:]
        if "=" in tok:
            path, _, raw = tok.partition("=")
            i += 1
        else:
            path = tok
            if i + 1 >= len(extras) or extras[i + 1].startswith("--"):
                raise SystemExit(f"override --{path} is missing a value")
            raw = extras[i + 1]
            i += 2
        if "." not in path:
            raise SystemExit(
                f"unknown option --{path} (overrides use dotted keys, e.g. "
                f"--model.init_args.learning_rate=1e-4)"
            )
        value = yaml.safe_load(raw)
        if isinstance(value, str) and _SCI_NOTATION.match(value):
            # YAML 1.1 reads bare scientific notation ("1e-4") as a string;
            # only that exact shape is coerced — '1_000', 'nan', 'inf' and
            # other float()-parseable text stay strings so string-typed
            # fields can receive numeric-looking values
            value = float(value)
        overrides.append((path, value))
    return overrides


def apply_overrides(cfg: Dict, overrides: List[tuple]) -> Dict:
    """Set dotted-key overrides into a merged config (after ``-c`` merging,
    before shape links — links still only fill what the user left unset)."""
    cfg = copy.deepcopy(cfg)
    for path, value in overrides:
        node = cfg
        keys = path.split(".")
        for depth, k in enumerate(keys[:-1]):
            nxt = node.get(k)
            if nxt is None:
                nxt = {}
                node[k] = nxt
            elif not isinstance(nxt, dict):
                # never silently destroy an existing scalar (a typo like
                # --model.class_path.foo=1 would wipe class_path and surface
                # as an unrelated instantiation error)
                raise SystemExit(
                    f"override --{path}: '{'.'.join(keys[:depth + 1])}' is "
                    f"{nxt!r} (not a section) — cannot set a key under it"
                )
            node = nxt
        node[keys[-1]] = value
    return cfg


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(
        description="ot-vae-tpu CLI (reference entry: run.sh / VisionCLI)"
    )
    parser.add_argument("command", choices=["fit", "validate", "test", "predict"])
    parser.add_argument("-c", "--config", action="append", required=True,
                        help="YAML config; repeatable, merged left to right")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--save-config", default="cli_config.yaml")
    args, extras = parser.parse_known_args(argv)

    cfg = load_configs(args.config)
    cfg = apply_overrides(cfg, parse_overrides(extras))
    if args.seed is not None:
        cfg["seed"] = args.seed
    if args.save_config:
        with open(args.save_config, "w") as f:
            yaml.safe_dump(cfg, f)

    model, datamodule, trainer = build(cfg)
    if cfg.get("seed") is not None:
        trainer.seed = int(cfg["seed"])
        datamodule.seed = int(cfg["seed"])

    if args.command == "fit":
        trainer.fit(model, datamodule)
        results = trainer.test(model, datamodule)
    else:
        results = getattr(trainer, args.command)(model, datamodule)
    print(results)
    return results


if __name__ == "__main__":
    main()

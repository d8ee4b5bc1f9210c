"""Hyperparameter sweep runner.

The reference ships a wandb sweep spec (reference: configs/dad/sweep.yaml:1-51)
and relies on ``wandb agent`` to drive it. This environment is offline, so the
same spec format is consumed by a small local driver: grid or random search
over dotted config paths, each trial running ``fit`` through the standard
config/CLI ``build`` path, results ranked by the spec's metric.

Spec format (the wandb subset the reference uses)::

    command: [fit, -c, configs/dad/defaults.yaml]   # base configs
    method: random | grid
    metric: {name: "val/metrics/psnr", goal: maximize}
    parameters:
      model.init_args.learning_rate:
        values: [1e-4, 1e-3]                        # categorical
        # OR value: 20                              # fixed
        # OR distribution: log_uniform_values / uniform with min/max

Run: ``python -m ot_vae_tpu.config.sweep -s configs/dad/sweep.yaml -n 8``.
"""
from __future__ import annotations

import argparse
import itertools
import json
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

from ot_vae_tpu.config.cli import build, load_configs

__all__ = ["load_sweep", "sample_trials", "set_dotted", "run_sweep", "main"]


def load_sweep(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    """Set ``a.b.c`` into a nested dict config in place."""
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _draw(spec: Dict, rng: np.random.Generator) -> Any:
    if "value" in spec:
        return spec["value"]
    if "values" in spec:
        return spec["values"][int(rng.integers(len(spec["values"])))]
    dist = spec.get("distribution")
    lo, hi = float(spec["min"]), float(spec["max"])
    if dist == "log_uniform_values":
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    if dist == "uniform":
        return float(rng.uniform(lo, hi))
    raise ValueError(f"unsupported parameter spec: {spec}")


def sample_trials(sweep: Dict, n: Optional[int], seed: int = 0) -> List[Dict[str, Any]]:
    """Trial list of {dotted_path: value}. Grid = cartesian product of the
    categorical axes (continuous distributions are invalid for grid); random =
    ``n`` seeded draws."""
    params: Dict[str, Dict] = sweep.get("parameters", {})
    method = sweep.get("method", "grid")
    if method == "grid":
        axes, fixed = [], {}
        for name, spec in params.items():
            if "value" in spec:
                fixed[name] = spec["value"]
            elif "values" in spec:
                axes.append([(name, v) for v in spec["values"]])
            else:
                raise ValueError(
                    f"grid sweep requires discrete values for '{name}'"
                )
        trials = [dict(fixed, **dict(combo)) for combo in itertools.product(*axes)]
        return trials[:n] if n else trials
    if method != "random":
        raise ValueError(f"unsupported sweep method: {method}")
    rng = np.random.default_rng(seed)
    n = n or 10
    return [{name: _draw(spec, rng) for name, spec in params.items()}
            for _ in range(n)]


def _base_config_paths(sweep: Dict) -> List[str]:
    cmd = sweep.get("command", [])
    return [cmd[i + 1] for i, tok in enumerate(cmd[:-1]) if tok == "-c"]


def run_sweep(
    sweep: Dict,
    n: Optional[int] = None,
    seed: int = 0,
    dry_run: bool = False,
    results_path: str = "sweep_results.json",
) -> List[Dict]:
    """Run (or dry-run) every trial; returns records sorted best-first by the
    spec's metric. Each record: {params, metric, value} (value None on dry
    run / missing metric)."""
    metric = sweep.get("metric", {}) or {}
    metric_name = metric.get("name")
    sign = -1.0 if metric.get("goal") == "maximize" else 1.0
    base_paths = _base_config_paths(sweep)
    trials = sample_trials(sweep, n, seed)

    records = []
    for i, overrides in enumerate(trials):
        cfg = load_configs(base_paths) if base_paths else {}
        for dotted, value in overrides.items():
            set_dotted(cfg, dotted, value)
        record = {"trial": i, "params": overrides, "metric": metric_name,
                  "value": None}
        if not dry_run:
            model, datamodule, trainer = build(cfg)
            trainer.fit(model, datamodule)
            value = trainer.logged_metrics.get(metric_name)
            record["value"] = float(value) if value is not None else None
        records.append(record)

    records.sort(key=lambda r: sign * r["value"] if r["value"] is not None else np.inf)
    if results_path:
        with open(results_path, "w") as f:
            json.dump(records, f, indent=2)
    return records


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description="local sweep runner")
    parser.add_argument("-s", "--sweep", required=True, help="sweep spec YAML")
    parser.add_argument("-n", "--num-trials", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dry-run", action="store_true",
                        help="print trial configs without training")
    parser.add_argument("--results", default="sweep_results.json")
    args = parser.parse_args(argv)
    records = run_sweep(load_sweep(args.sweep), args.num_trials, args.seed,
                        args.dry_run, args.results)
    for r in records:
        print(json.dumps(r))
    return records


if __name__ == "__main__":
    main()

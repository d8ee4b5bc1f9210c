"""Sweep runner (parity: the reference's wandb sweep spec
configs/dad/sweep.yaml:1-51, driven locally because the env is offline)."""
import json

import numpy as np

from ot_vae_tpu.config.sweep import (
    load_sweep,
    run_sweep,
    sample_trials,
    set_dotted,
)


def test_set_dotted():
    cfg = {"model": {"init_args": {"learning_rate": 1e-3}}}
    set_dotted(cfg, "model.init_args.learning_rate", 5e-4)
    set_dotted(cfg, "trainer.max_epochs", 3)
    assert cfg["model"]["init_args"]["learning_rate"] == 5e-4
    assert cfg["trainer"]["max_epochs"] == 3


def test_grid_trials_cartesian_product():
    sweep = {
        "method": "grid",
        "parameters": {
            "a": {"values": [1, 2, 3]},
            "b": {"values": [10, 20]},
            "c": {"value": 7},
        },
    }
    trials = sample_trials(sweep, None)
    assert len(trials) == 6
    assert all(t["c"] == 7 for t in trials)
    assert {(t["a"], t["b"]) for t in trials} == {
        (a, b) for a in (1, 2, 3) for b in (10, 20)
    }


def test_random_trials_seeded():
    sweep = {
        "method": "random",
        "parameters": {
            "lr": {"distribution": "log_uniform_values", "min": 1e-4, "max": 1e-2},
            "n": {"values": [64, 128]},
        },
    }
    t1 = sample_trials(sweep, 5, seed=3)
    t2 = sample_trials(sweep, 5, seed=3)
    assert t1 == t2 and len(t1) == 5
    lrs = [t["lr"] for t in t1]
    assert all(1e-4 <= v <= 1e-2 for v in lrs)
    assert len(set(lrs)) > 1


def test_dry_run_real_spec(tmp_path):
    """The shipped DAD sweep spec parses and yields runnable trial configs."""
    sweep = load_sweep("configs/dad/sweep.yaml")
    out = tmp_path / "results.json"
    records = run_sweep(sweep, n=3, dry_run=True, results_path=str(out))
    assert len(records) == 3
    assert all(r["value"] is None for r in records)
    assert all(
        "model.init_args.prior.init_args.n_components" in r["params"]
        for r in records
    )
    saved = json.loads(out.read_text())
    assert len(saved) == 3

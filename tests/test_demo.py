"""examples/demo.py smoke run — the reference's demo.py is bit-rotted (stale
import path, reference demo.py:17); ours must actually run end-to-end:
multi-level training + per-level Gaussian feature transport + restored PSNR
(reference: demo.py:28-87)."""
import os
import sys

import numpy as np


def test_demo_runs_end_to_end():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import demo

    results = demo.main(epochs=1, batch_size=32, n_train=128)
    assert len(results) == demo.LEVELS
    for r in results:
        assert np.isfinite(r["cost"]) and r["cost"] >= 0
        assert np.isfinite(r["psnr"])
    # deeper levels lose more information: restored PSNR is finite everywhere
    # and the level-1 restoration beats pure noise (> 5 dB)
    assert results[0]["psnr"] > 5.0, results

"""Per-op device-time profile of the FFHQ128-scale train step.

Runs the jitted train step under ``jax.profiler.trace``, parses the
Chrome-trace JSON (``*.trace.json.gz``) for per-op device durations on the
TensorCore lanes, and prints a category budget (conv / attention / fusion /
copy / rng / ...) plus the top-30 ops. This is the measurement loop behind
the round-3 MFU workstream (ROADMAP.md): every optimization there was
admitted or rejected by this budget, not by intuition.

Usage (real TPU, ~1 min):
    python examples/profile_step.py [batch_size=32] [f32]

The reference has no profiling subsystem (SURVEY §5 — it explicitly
disables torch.autograd.profiler, demo.py:22-23); the TPU build treats the
profile as a first-class artifact.
"""
import collections
import functools
import glob
import gzip
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (repo-root bench.py: shared model builders)
import optax  # noqa: E402


def make_step(model, batch_size, dtype, img_shape=(128, 128, 3)):
    """jitted full train step (fwd+bwd+adam) on random device-resident data."""
    xdtype = dtype or jnp.float32
    batch = (jnp.zeros((batch_size, *img_shape), xdtype),
             jnp.zeros((batch_size,), jnp.int32))
    variables = dict(model.init_variables(jax.random.PRNGKey(0), batch))
    params = variables.pop("params")
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # pre-staged input pool (mirrors bench.py): the profile should charge
    # the model, not on-device synthesis of the batch
    pool = jax.random.normal(
        jax.random.PRNGKey(3), (2, batch_size, *img_shape), xdtype)

    @jax.jit
    def step(params, opt_state, mutable, key, x):
        pbatch = model.batch_preprocess(
            (x, jnp.zeros((x.shape[0],), jnp.int32)), key, train=True)

        def lf(p):
            v = {"params": p, **mutable}
            loss, (logs, outputs, mutated) = model.loss_fn(
                v, pbatch, 0, {"prior": key, "dropout": key})
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {**mutable, **mutated}, loss

    return step, params, opt_state, variables, pool


CATS = [
    ("attention", ("softmax", "attention", "fused_attention")),
    ("conv", ("conv",)),
    ("dot", ("dot",)),
    ("reduce", ("reduce",)),
    ("fusion", ("fusion", "loop_")),
    ("copy", ("copy", "transpose", "bitcast", "reshape", "slice", "concat",
              "pad", "dynamic")),
    ("rng", ("rng", "threefry")),
    ("other", ()),
]


def parse_trace(tracedir):
    """Sum per-op device durations from the newest Chrome trace under
    ``tracedir`` (TensorCore process lanes only; step/jit markers skipped)."""
    files = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {tracedir}"
    f = max(files, key=os.path.getmtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "Core" in nm or "device" in nm.lower():
                dev_pids.add(e["pid"])
    by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if (name.startswith("Steps") or name.startswith("jit_")
                or re.fullmatch(r"\d+", name)):
            continue
        dur = e.get("dur", 0)
        by_name[name] += dur
        total += dur
    return by_name, total, f


def bucket(by_name):
    agg = collections.Counter()
    for name, dur in by_name.items():
        lname = name.lower()
        for cat, keys in CATS:
            if any(k in lname for k in keys):
                agg[cat] += dur
                break
        else:
            agg["other"] += dur
    return agg


def hlo_shapes(step, *args):
    """Map HLO instruction name -> (shape, one-line def) from the compiled
    module. Trace event names are HLO instruction names (modulo a lowered
    suffix), so joining gives per-op SHAPES next to per-op durations —
    without this the copy/fusion budget is unattributable."""
    txt = step.lower(*args).compile().as_text()
    out = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\S+) ", line)
        if m:
            out[m.group(1)] = (m.group(2), line.strip()[:240])
    return out


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    dtype = jnp.float32 if "f32" in sys.argv[1:] else jnp.bfloat16
    img_shape = (128, 128, 3)
    if "vit" in sys.argv[1:]:  # round-4 ViT campaign target
        model = bench._build_vit_big_model(dtype=dtype, head_dim=128)
    elif "vit_cond" in sys.argv[1:]:
        model = bench._build_vit_cond_model(dtype=dtype)
        img_shape = (32, 32, 3)
    elif "dad" in sys.argv[1:]:
        model = bench._build_dad_model(dtype=dtype)
    else:
        model = bench._build_big_model(dtype=dtype, attn_head_dim=64)
    step, params, opt_state, variables, pool = make_step(
        model, bs, dtype, img_shape=img_shape)
    key = jax.random.PRNGKey(7)
    params, opt_state, variables, loss = step(
        params, opt_state, variables, key, pool[0])
    float(loss)  # value-fetch sync (block_until_ready lies on this backend)
    shapes = hlo_shapes(step, params, opt_state, variables, key, pool[0])
    tracedir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tracedir}")
    n_steps = 5
    with jax.profiler.trace(tracedir):
        for i in range(n_steps):
            params, opt_state, variables, loss = step(
                params, opt_state, variables, jax.random.fold_in(key, i),
                pool[i % pool.shape[0]])
        float(loss)
    by_name, total, f = parse_trace(tracedir)
    agg = bucket(by_name)
    print(f"trace: {f}\ntotal device us over {n_steps} steps: {total:.0f} "
          f"(per step {total/n_steps/1000:.2f} ms)")
    for cat, dur in agg.most_common():
        print(f"  {cat:10s} {dur/n_steps/1000:7.2f} ms/step  "
              f"{100*dur/total:5.1f}%")
    print("\ntop 30 ops:")
    for name, dur in by_name.most_common(30):
        shape = shapes.get(name, ("?",))[0]
        print(f"  {dur/n_steps/1000:8.3f} ms  {name[:60]:60s}  {shape[:60]}")
    # per-category top offenders with HLO one-liners: the copy budget is
    # only actionable once each copy has a shape + operand attached
    for cat in ("copy", "fusion"):
        keys = CATS[[c for c, _ in CATS].index(cat)][1]
        members = [(n, d) for n, d in by_name.items()
                   if any(k in n.lower() for k in keys)]
        members.sort(key=lambda t: -t[1])
        print(f"\ntop {cat} ops (with HLO):")
        for name, dur in members[:12]:
            _, line = shapes.get(name, ("?", "<not in compiled module>"))
            print(f"  {dur/n_steps/1000:8.3f} ms  {line[:200]}")

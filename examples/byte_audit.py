"""Per-op HBM byte accounting of a compiled train step (VERDICT r3 Next #4).

BENCH_CLIFF shows the FFHQ128-scale bs128 step running AT its HBM roofline
(196 MB/img of cost-analysis traffic) — "speed-of-light for this traffic".
This tool makes that claim auditable at the op level: it parses the
compiled HLO module of the single train step and charges every top-level
instruction its write bytes (its result buffers) plus its read bytes (its
operands' result buffers), i.e. the traffic XLA's fusion boundaries commit
to HBM. Buckets by op kind and by the model-module `op_name` metadata, so
"the norm chain costs X MB/img" is a printed number, not an estimate.

This over-approximates true DMA (reuse of a buffer resident in VMEM across
consumers is not modeled) but matches the compiler's own bytes-accessed
accounting at fusion granularity — the same quantity the roofline uses.

Usage (TPU or CPU — the HLO module is backend-specific, measure on TPU):
    python examples/byte_audit.py [batch_size=128] [f32] [vit]
"""
import collections
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from profile_step import make_step  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2,
                "u16": 2, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape string, incl. tuple shapes '(f32[2], ...)'."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_OPND_RE = re.compile(r"%([\w.\-]+)")
_META_RE = re.compile(r'op_name="([^"]+)"')
_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")


def _parse_instr(line):
    """(name, shape_str, kind) of one HLO line; shape may be a NESTED tuple
    ('((f32[..]), f32[..], s32[])' — async wrappers), so scan balanced
    parens instead of regexing."""
    m = _NAME_RE.match(line)
    if not m:
        return None
    rest = line[m.end():]
    if rest.startswith("("):
        depth = 0
        for i, c in enumerate(rest):
            depth += c == "("
            depth -= c == ")"
            if depth == 0:
                break
        shape, rest = rest[: i + 1], rest[i + 1:]
    else:
        sp = rest.find(" ")
        shape, rest = rest[:sp], rest[sp:]
    kind = rest.strip().split("(", 1)[0].strip()
    return m.group(1), shape, kind


def audit(step, *args, batch_size: int = 1, top: int = 25):
    txt = step.lower(*args).compile().as_text()
    # ENTRY computation only: fusion internals don't touch HBM
    entry = []
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            entry.append(line)

    out_bytes = {}
    rows = []
    for line in entry:
        parsed = _parse_instr(line)
        if not parsed:
            continue
        name, shape, kind = parsed
        out_b = shape_bytes(shape)
        out_bytes[name] = out_b
        meta = _META_RE.search(line)
        rows.append((name, kind, out_b, line, meta.group(1) if meta else ""))

    by_kind = collections.Counter()
    by_module = collections.Counter()
    scored = []
    # metadata-free pseudo-ops: bitcasts and tuple plumbing move no data;
    # async transfers are charged once at their -done (the -start names the
    # same buffers)
    free = ("parameter", "constant", "get-tuple-element", "tuple", "bitcast",
            "after-all")
    for name, kind, out_b, line, op_name in rows:
        if kind in free or kind.endswith("-start"):
            continue
        # reads: operands that are other top-level instructions' results
        body = line.split("=", 1)[1]
        call_args = body[body.find("("):]
        read_b = sum(out_bytes.get(o, 0) for o in _OPND_RE.findall(call_args)
                     if o != name)
        traffic = out_b + read_b
        by_kind[kind] += traffic
        # charge to the innermost model module in op_name (strip jit/transpose
        # wrappers): e.g. ".../encoder/ConvBlock_3/BatchNorm_0/..." -> that
        mod = "<none>"
        if op_name:
            parts = [p for p in op_name.split("/")
                     if not p.startswith(("jit", "while", "body", "closed",
                                          "transpose", "jvp", "multiply",
                                          "add", "convert", "reduce", "sub",
                                          "div", "rsqrt"))]
            mod = "/".join(parts[-3:]) if parts else op_name[-60:]
        by_module[mod] += traffic
        scored.append((traffic, name, kind, op_name))

    total = sum(by_kind.values())
    print(f"total fusion-boundary traffic: {total/1e6:.0f} MB/step "
          f"({total/1e6/batch_size:.1f} MB/img at bs{batch_size})")
    print("\nby HLO kind:")
    for kind, b in by_kind.most_common():
        print(f"  {kind:24s} {b/1e6:9.1f} MB  {100*b/total:5.1f}%")
    print(f"\ntop {top} modules by traffic:")
    for mod, b in by_module.most_common(top):
        print(f"  {b/1e6:9.1f} MB  {100*b/total:5.1f}%  {mod[:100]}")
    print(f"\ntop {top} single ops:")
    scored.sort(reverse=True)
    for traffic, name, kind, op_name in scored[:top]:
        print(f"  {traffic/1e6:9.1f} MB  {kind:12s} {name[:40]:40s} "
              f"{op_name[-80:]}")
    return by_kind, by_module, total


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128
    dtype = jnp.float32 if "f32" in sys.argv[1:] else jnp.bfloat16
    if "vit" in sys.argv[1:]:
        model = bench._build_vit_big_model(dtype=dtype, head_dim=128)
    else:
        model = bench._build_big_model(dtype=dtype, attn_head_dim=64)
    step, params, opt_state, variables, pool = make_step(model, bs, dtype)
    key = jax.random.PRNGKey(7)
    audit(step, params, opt_state, variables, key, pool[0], batch_size=bs)

"""Per-op device-time breakdown from a ``jax.profiler`` trace.

The MFU number (utils/flops.py) says how far from peak a step is; this
tool says WHERE the rest of the time goes. It parses the raw
``*.xplane.pb`` written by ``jax.profiler.start_trace`` (e.g. bench.py's
``BENCH_PROFILE=<dir>``) with TensorFlow's own xplane proto — the
tensorboard profile plugin's converters are unusable here (stale
vendored *_pb2 files vs the installed protobuf), and we only need the
device-plane aggregation anyway.

XSpace layout (tsl/profiler/protobuf/xplane.proto): planes (one per
device + host planes) -> lines -> events with ``offset_ps`` /
``duration_ps``. On this TPU backend the ``XLA Ops`` line is a NESTED
flame (a ``while`` event covers its body's events on the same line), so
busy time must be computed as SELF time (event duration minus covered
children) — naive duration sums overcount ~8x. Ops carry no
category/flops stats here; categories are derived from the HLO
instruction text (``%dot_add_fusion = ... fusion(...)``).

Fusion names alone cannot separate MXU from VPU work (a backward
matmul can hide in a ``convert_reduce_fusion``): pass ``--hlo`` the
compiled module text (``jitted.lower(...).compile().as_text()``,
gzipped ok) and each fusion is categorized by the opcodes of the
``%fused_computation`` it calls — a fusion containing a
``convolution``/``dot`` is MXU work regardless of its name.

Usage::

    python -m vln_hamt_tpu.utils.xprof <trace_dir> [--top 25] \
        [--hlo il_update_hlo.txt.gz]

Prints a per-category rollup (MXU matmul work vs VPU elementwise, RNG,
data movement, loop bookkeeping), the async-DMA overlap time, and the
top ops by self time, plus ONE trailing JSON line for scripts. No
reference-repo counterpart: the reference has no profiler tooling
beyond printed timings; this is the TPU-side observability needed to
attack the MFU gap with evidence.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from collections import defaultdict
from typing import Dict, List, Tuple


def find_xplane_files(logdir: str) -> List[str]:
    """All ``*.xplane.pb`` under a trace dir (any nesting/session)."""
    pat = os.path.join(logdir, "**", "*.xplane.pb")
    return sorted(glob.glob(pat, recursive=True))


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _is_device_plane(plane) -> bool:
    # "/device:TPU:0" here; CPU backends emit only host planes.
    name = plane.name.lower()
    return "/device:" in name and "cpu" not in name and "custom" not in name


_CATEGORY_RULES: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    # order matters: first token hit wins. Matched against the lowercase
    # HLO text, so fusion names like "dot_add_fusion" and operands like
    # "convolution(" both count.
    ("matmul (MXU)", ("convolution", "dot(", "dot.", "%dot", "einsum",
                      "megacore_fusion")),
    ("rng", ("rng-bit-generator", "rng_bit", "threefry", "philox")),
    ("collective", ("all-reduce", "all-gather", "reduce-scatter",
                    "collective", "ppermute", "all-to-all")),
    ("data movement", ("copy", "slice", "transpose", "bitcast", "pad(",
                       "pad.", "pad_", "concatenate", "reverse", "gather",
                       "scatter", "dynamic-update", "reshape",
                       "iota", "broadcast(", "%broadcast")),
    ("loop/control", ("while", "condition", "tuple", "parameter",
                      "constant", "infeed", "outfeed", "select-and")),
    ("reduce (VPU)", ("reduce",)),
    # anything else — elementwise fusions, softmax/exp/tanh chains, etc.
)


def categorize(hlo_text: str) -> str:
    low = hlo_text.lower()
    for cat, tokens in _CATEGORY_RULES:
        if any(t in low for t in tokens):
            return cat
    return "elementwise (VPU)"


_SUFFIX = re.compile(r"[.\d]+$")


def _op_key(display: str) -> str:
    """Stable per-op key: HLO name with the trailing .N/counter removed."""
    return _SUFFIX.sub("", display) or display


# ---- compiled-HLO fusion-contents index -------------------------------

_COMP_HEADER = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*->.*\{")
_INSTR = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*)$")
# opcode = first lowercase token followed by '(' in the post-'=' text;
# shape/layout parens are uppercase (T(8,128), S(1)) so they don't match
_OPCODE = re.compile(r"(?:^|\s)([a-z][\w\-]*)\(")
_CALLS = re.compile(r"calls=%?([\w.\-]+)")

_MXU_OPS = ("convolution", "dot")
_VPU_OPS = ("reduce", "exponential", "tanh", "erf", "log", "rsqrt", "sqrt",
            "power", "divide", "multiply", "add", "subtract", "maximum",
            "minimum", "compare", "select", "and", "or", "not", "xor",
            "negate", "abs", "floor", "clamp", "convert", "sign",
            "reduce-window", "map", "exponential-minus-one")
_MOVE_OPS = ("copy", "copy-start", "copy-done", "slice", "dynamic-slice",
             "dynamic-update-slice", "gather", "scatter", "concatenate",
             "pad", "transpose", "reshape", "bitcast", "broadcast",
             "reverse", "iota", "tuple", "get-tuple-element")


def _opcode_category(opcodes) -> str:
    """Category of a fused computation from its member opcodes."""
    ops = set(opcodes)
    if ops & set(_MXU_OPS):
        return "matmul (MXU)"
    if "rng-bit-generator" in ops:
        return "rng"
    if any(o.startswith("all-") or o == "collective-permute" for o in ops):
        return "collective"
    if ops & set(_VPU_OPS):
        return "elementwise/reduce (VPU)"
    if ops & set(_MOVE_OPS):
        return "data movement"
    return "other"


def load_hlo_index(path: str) -> Dict[str, str]:
    """instruction name -> category, from compiled-module HLO text.

    Parses every computation (entry, while bodies, fused computations);
    fusion instructions are categorized by the opcodes of the
    computation they ``calls=`` (one level — fused computations hold
    only primitive ops).
    """
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    comp_ops: Dict[str, List[str]] = {}
    instrs: List[Tuple[str, str, str]] = []  # (name, opcode, calls)
    current: str = ""
    with opener(path, "rt") as f:
        for line in f:
            m = _COMP_HEADER.match(line)
            if m:
                current = m.group(1)
                comp_ops.setdefault(current, [])
                continue
            m = _INSTR.match(line)
            if not m:
                continue
            name, rest = m.group(1), m.group(2)
            om = _OPCODE.search(rest)
            if not om:
                continue
            opcode = om.group(1)
            cm = _CALLS.search(rest) if opcode == "fusion" else None
            comp_ops.setdefault(current, []).append(opcode)
            instrs.append((name, opcode, cm.group(1) if cm else ""))

    by_name: Dict[str, str] = {}
    for name, opcode, calls in instrs:
        if opcode == "fusion" and calls in comp_ops:
            cat = _opcode_category(comp_ops[calls])
        elif opcode == "rng-bit-generator":
            cat = "rng"
        elif opcode in _MXU_OPS:
            cat = "matmul (MXU)"
        elif opcode in ("while", "conditional", "call", "parameter",
                        "constant", "after-all"):
            cat = "loop/control"
        else:
            cat = _opcode_category([opcode])
        by_name[name] = cat
    # stripped-name fallback: usable only when unambiguous across all
    # same-named instructions (profile display names sometimes lose the
    # exact suffix)
    stripped: Dict[str, set] = defaultdict(set)
    for name, cat in list(by_name.items()):
        stripped[_op_key(name)].add(cat)
    for key, cats in stripped.items():
        if key not in by_name and len(cats) == 1:
            by_name[key] = next(iter(cats))
    return by_name


def _self_times(events) -> List[Tuple[int, int, int]]:
    """(metadata_id, self_ps, duration_ps) per event on a nested line.

    Events on one line form a flame: sort by (offset, -duration); a
    stack of open intervals attributes each event's duration to its
    parent's child-sum, so self = duration - children.
    """
    evs = sorted(((e.offset_ps, -e.duration_ps, e.metadata_id)
                  for e in events))
    out: List[Tuple[int, int, int]] = []
    # stack entries: [end_ps, child_sum_ps, metadata_id, duration_ps]
    stack: List[list] = []
    for off, neg_dur, mid in evs:
        dur = -neg_dur
        while stack and stack[-1][0] <= off:
            _, child_sum, smid, sdur = stack.pop()
            out.append((smid, max(sdur - child_sum, 0), sdur))
        if stack:
            stack[-1][1] += dur
        stack.append([off + dur, 0, mid, dur])
    while stack:
        _, child_sum, smid, sdur = stack.pop()
        out.append((smid, max(sdur - child_sum, 0), sdur))
    return out


def _event_category(display: str, hlo_text: str,
                    hlo_index: Dict[str, str] | None) -> str:
    if hlo_index:
        cat = hlo_index.get(display) or hlo_index.get(_op_key(display))
        if cat:
            return cat
    return categorize(hlo_text)


def op_breakdown(xspace, hlo_index: Dict[str, str] | None = None,
                 ) -> Tuple[Dict[str, dict], dict]:
    """Aggregate device-plane op SELF times by (stripped name, category).

    Returns (ops, extras): extras carries the async-DMA line total
    (overlapped with compute — not part of busy time) and the wall span
    of the op line. With ``hlo_index`` (load_hlo_index), each event is
    categorized by its fusion's CONTENTS; otherwise by name tokens.
    """
    ops: Dict[str, dict] = {}
    extras = {"async_copy_us": 0.0, "span_us": 0.0}
    for plane in xspace.planes:
        if not _is_device_plane(plane):
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if lname == "xla ops":
                if line.events:
                    lo = min(e.offset_ps for e in line.events)
                    hi = max(e.offset_ps + e.duration_ps
                             for e in line.events)
                    extras["span_us"] += (hi - lo) / 1e6
                for mid, self_ps, _dur in _self_times(line.events):
                    md = plane.event_metadata[mid]
                    display = md.display_name or md.name
                    cat = _event_category(display, md.name, hlo_index)
                    key = f"{_op_key(display)}|{cat}"
                    rec = ops.setdefault(key, {
                        "name": _op_key(display), "category": cat,
                        "occurrences": 0, "self_us": 0.0})
                    rec["occurrences"] += 1
                    rec["self_us"] += self_ps / 1e6
            elif lname == "async xla ops":
                # async DMA (copy-start/done, slice-start): overlapped
                # with compute; track the total separately
                for mid, self_ps, _dur in _self_times(line.events):
                    extras["async_copy_us"] += self_ps / 1e6
    return ops, extras


def category_rollup(ops: Dict[str, dict]) -> List[dict]:
    cats = defaultdict(lambda: {"self_us": 0.0, "occurrences": 0, "ops": 0})
    for rec in ops.values():
        c = cats[rec["category"]]
        c["self_us"] += rec["self_us"]
        c["occurrences"] += rec["occurrences"]
        c["ops"] += 1
    total = sum(c["self_us"] for c in cats.values()) or 1.0
    rows = [{"category": k, **v, "share": v["self_us"] / total}
            for k, v in cats.items()]
    rows.sort(key=lambda r: -r["self_us"])
    return rows


def plane_summary(xspace) -> List[str]:
    out = []
    for plane in xspace.planes:
        out.append(f"{plane.name}: "
                   + ", ".join(f"{ln.name}[{len(ln.events)}]"
                               for ln in plane.lines))
    return out


def analyze(logdir: str, top: int = 25, hlo: str | None = None) -> dict:
    files = find_xplane_files(logdir)
    if not files:
        return {"error": f"no *.xplane.pb under {logdir}"}
    hlo_index = load_hlo_index(hlo) if hlo else None
    ops: Dict[str, dict] = {}
    planes: List[str] = []
    extras = {"async_copy_us": 0.0, "span_us": 0.0}
    for path in files:
        xs = load_xspace(path)
        planes += plane_summary(xs)
        fops, fex = op_breakdown(xs, hlo_index)
        for k in extras:
            extras[k] += fex[k]
        for key, rec in fops.items():
            dst = ops.setdefault(key, {
                "name": rec["name"], "category": rec["category"],
                "occurrences": 0, "self_us": 0.0})
            dst["occurrences"] += rec["occurrences"]
            dst["self_us"] += rec["self_us"]
    cats = category_rollup(ops)
    top_ops = sorted(
        ({**r, "name": r["name"][:70]} for r in ops.values()),
        key=lambda r: -r["self_us"])[:top]
    return {
        "files": files, "planes": planes, "categories": cats,
        "top_ops": top_ops, **extras,
        "device_busy_us": sum(r["self_us"] for r in ops.values()),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--hlo", default=None,
                   help="compiled-module HLO text (.txt or .txt.gz) to "
                        "categorize fusions by their contents")
    args = p.parse_args(argv)
    res = analyze(args.logdir, args.top, args.hlo)
    if "error" in res:
        print(json.dumps(res))
        return
    if not res["categories"]:
        print("No device-plane op events found (CPU backends emit only "
              "host planes). Planes present:")
        for s in res["planes"]:
            print(" ", s)
    else:
        busy = res["device_busy_us"]
        print(f"device busy (XLA Ops self time): {busy/1e3:.3f} ms over a "
              f"{res['span_us']/1e3:.3f} ms op-line span "
              f"({100*busy/max(res['span_us'],1e-9):.1f}% occupied); "
              f"async DMA (overlapped): {res['async_copy_us']/1e3:.3f} ms")
        print(f"{'category':<20} {'time_ms':>10} {'share':>7} {'#evts':>9}")
        for c in res["categories"]:
            print(f"{c['category']:<20} {c['self_us']/1e3:>10.3f} "
                  f"{c['share']*100:>6.1f}% {c['occurrences']:>9}")
        print()
        print(f"{'op':<48} {'category':<18} {'time_ms':>9} {'#':>7}")
        for o in res["top_ops"]:
            print(f"{o['name']:<48} {o['category']:<18} "
                  f"{o['self_us']/1e3:>9.3f} {o['occurrences']:>7}")
    print(json.dumps({
        "metric": "xprof_device_busy_ms",
        "value": round(res["device_busy_us"] / 1e3, 3),
        "span_ms": round(res["span_us"] / 1e3, 3),
        "async_copy_ms": round(res["async_copy_us"] / 1e3, 3),
        "categories": {c["category"]: round(c["share"], 4)
                       for c in res["categories"]},
    }))


if __name__ == "__main__":
    main()

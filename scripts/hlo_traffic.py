#!/usr/bin/env python
"""Attribute HBM traffic in an optimized-HLO dump (.hlo text from
``compiled.as_text()``, e.g. scripts/anti_scaling_probe.py --hlo-dir).

Two reports:
  * top output-bytes shapes by op kind (fusion/convolution/copy/dot/
    custom-call) — where the bytes go;
  * op_name attribution for an op kind (default: copy) — which model code
    causes it. Layout copies and scatter/gather ops showing up here are the
    usual targets (see NOTES_ROUND3.md: the fp32-norm and scatter-add finds
    both came out of exactly this report).

Usage: python scripts/hlo_traffic.py /tmp/antiscale_hlo/large_b8.hlo
           [--top 25] [--attr copy|scatter|fusion] [--attr-top 15]
"""

import argparse
import collections
import re

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

INS = re.compile(
    r'%\S+ = ([a-z0-9]+)\[([0-9,]*)\][^ ]* '
    r'(fusion|convolution|copy|dot|custom-call|all-reduce|all-gather|'
    r'reduce-scatter|scatter|gather)\('
)
OPNAME = re.compile(r'op_name="([^"]*)"')


def shape_bytes(dtype: str, dims: str) -> int:
    if dtype not in DTYPE_BYTES:
        return 0
    n = 1
    for x in dims.split(","):
        if x:
            n *= int(x)
    return n * DTYPE_BYTES[dtype]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--attr", default="copy",
                    help="op kind to attribute to op_name metadata")
    ap.add_argument("--attr-top", type=int, default=15)
    args = ap.parse_args()

    by_shape = collections.Counter()
    count = collections.Counter()
    attr = collections.Counter()
    attr_bytes = collections.Counter()
    total = 0
    with open(args.hlo) as f:
        for line in f:
            m = INS.search(line)
            if not m:
                continue
            dtype, dims, op = m.groups()
            b = shape_bytes(dtype, dims)
            # In-place updates: a fusion whose backend_config declares
            # aliasing_operands writes only its update window, not the whole
            # output (e.g. dynamic-update-slice fusions) — counting the full
            # output shape here overstated the subsampling boundary by ~3 GB
            # in round 3 until cost_analysis bytes-accessed contradicted it.
            # Rank them separately at zero credited bytes.
            if '"aliasing_operands"' in line:
                op += "(in-place)"
                b = 0
            total += b
            key = f"{op:12s} {dtype}[{dims}]"
            by_shape[key] += b
            count[key] += 1
            if op.startswith(args.attr):
                nm = OPNAME.search(line)
                if nm:
                    name = nm.group(1).split("transpose(jvp(")[-1]
                    attr[name] += 1
                    attr_bytes[name] += b

    print(f"total ranked output bytes: {total/1e9:.1f} GB "
          f"(whole module incl. nested computations — an upper bound)")
    print(f"\n== top {args.top} output-bytes shapes ==")
    for k, b in by_shape.most_common(args.top):
        print(f"  {b/1e9:7.2f} GB  x{count[k]:4d}  {k}")
    if attr:
        print(f"\n== '{args.attr}*' attribution by op_name ==")
        for name, b in attr_bytes.most_common(args.attr_top):
            print(f"  {b/1e9:7.2f} GB  x{attr[name]:4d}  {name}")


if __name__ == "__main__":
    main()

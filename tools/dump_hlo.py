"""Dump the optimized HLO of the n=8 fused stereo program and print the
bodies of named ops (for attributing trace-op names to source).

Usage: python tools/dump_hlo.py [op_name_substring ...]
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tools.trace_ops import build_run

    names = sys.argv[1:] or ["select_reduce_fusion"]
    run, pairs = build_run()
    txt = jax.jit(run.__wrapped__).lower(pairs).compile().as_text()
    out = "/tmp/hlo_n8.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")
    lines = txt.splitlines()
    for pat in names:
        print(f"\n=== ops matching {pat!r} ===")
        for i, l in enumerate(lines):
            if pat in l and ("= fusion" in l or "fusion(" in l or " = " in l):
                if f"%{pat}" in l or f" {pat}" in l or pat in l.split("=")[0]:
                    print(l[:400])


if __name__ == "__main__":
    main()

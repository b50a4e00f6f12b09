#!/usr/bin/env python3
"""Split `graft.Explain` output into plans/<tag>/<query>_<suffix>.txt.

Usage: split_plans.py <explain-output-file> <out-dir> <suffix>
The Explain main prints `========== <query> ==========` separators.
"""
import os
import re
import sys

src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
name, buf = None, []


def flush():
    if name and buf:
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write("".join(buf).strip() + "\n")


for line in open(src, errors="replace"):
    m = re.match(r"=+ (\S+) =+\s*$", line)
    if m:
        flush()
        name, buf = m.group(1), []
    elif name and not line.startswith(("[info]", "[success]", "[warn]")):
        buf.append(line)
flush()
print("wrote", len(os.listdir(outdir)), "files to", outdir)

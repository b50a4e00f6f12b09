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
    if line.startswith("[info] "):  # pre-r21 builds prefix forked stdout
        line = line[len("[info] "):]
    # only the Explain main's `========== qNN_name ==========` headers
    # start a new file — explain("formatted") prints its own
    # `===== Subqueries =====` section header, which belongs to the
    # current query's plan
    m = re.match(r"=+ (q\d+\S*) =+\s*$", line)
    if m:
        flush()
        name, buf = m.group(1), []
    elif name and not line.startswith(("[success]", "[warn]", "[error]")):
        buf.append(line)
flush()
print("wrote", len(os.listdir(outdir)), "files to", outdir)

"""Fetch SuiteSparse SPD benchmark matrices (BASELINE.md config 5).

Downloads Queen_4147 and Bump_2911 (the reference paper's large SPD test
matrices) from the SuiteSparse collection and extracts the .mtx files.

NOTE: the build/bench container has no network egress; run this on a
machine with internet access and copy the .mtx files to the bench host
(or point --dest at shared storage).  Offline, the Poisson generators
(acg_tpu.cli.poisson) cover the benchmark protocol.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import urllib.request

MATRICES = {
    "Queen_4147": "https://suitesparse-collection-website.herokuapp.com/MM/Janna/Queen_4147.tar.gz",
    "Bump_2911": "https://suitesparse-collection-website.herokuapp.com/MM/Janna/Bump_2911.tar.gz",
}


def fetch(name: str, url: str, dest: str) -> str:
    out = os.path.join(dest, f"{name}.mtx")
    if os.path.exists(out):
        print(f"{out} already present", file=sys.stderr)
        return out
    print(f"downloading {url} ...", file=sys.stderr)
    with urllib.request.urlopen(url) as r:
        data = r.read()
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
        member = next(m for m in tf.getmembers()
                      if m.name.endswith(f"{name}.mtx"))
        with tf.extractfile(member) as src, open(out, "wb") as dst:
            dst.write(src.read())
    print(f"wrote {out}", file=sys.stderr)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dest", default=".", help="output directory [.]")
    p.add_argument("names", nargs="*", default=list(MATRICES),
                   help=f"matrices to fetch {list(MATRICES)}")
    args = p.parse_args(argv)
    os.makedirs(args.dest, exist_ok=True)
    for name in args.names or list(MATRICES):
        if name not in MATRICES:
            print(f"unknown matrix {name!r}", file=sys.stderr)
            return 1
        fetch(name, MATRICES[name], args.dest)
    return 0


if __name__ == "__main__":
    sys.exit(main())

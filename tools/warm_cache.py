"""Produce a shippable XLA compile cache for the flagship serving shapes.

The full-model serving step costs minutes of XLA compile on a fresh host
(BENCH_r03 measured 376.7 s first-call on an empty cache). This tool runs
`bench.py` ITSELF as a direct subprocess against the repo's real
`.jax_cache/` and copies the entries that run produced into a committable
directory (`serving_cache/`); bench.py seeds them back into `.jax_cache` at
startup, so a fresh checkout skips the compile.

Key-stability findings this was built on (measured 2026-08-19, axon TPU):
- the persistent-cache key includes the COMPILE OPTIONS, and on this
  platform those embed the compilation-cache DIRECTORY PATH — two processes
  writing to the same dir reproduce each other's keys exactly; any other
  dir produces disjoint keys. Hence: warm the real `.jax_cache` path (the
  driver's checkout lives at the same absolute path), not a scratch dir.
- keys also hash the traced module + jaxlib + backend versions, so a stale
  entry can only MISS (normal compile), never load a wrong program.

Re-run this tool whenever bench.py or the model code changes.

Run ON the target backend (TPU):

    python tools/warm_cache.py [--out serving_cache]
"""

import argparse
import os
import shutil
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="serving_cache")
    args, bench_flags = ap.parse_known_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)
    cache = os.path.join(repo, ".jax_cache")
    bak = cache + ".warmbak"

    # stash the existing cache so the bench run compiles (and therefore
    # WRITES) every program it needs; merged back afterwards
    if os.path.isdir(cache):
        if os.path.isdir(bak):
            raise SystemExit(f"{bak} exists — a previous run died; merge it back first")
        os.rename(cache, bak)
    try:
        env = dict(os.environ)
        # the bench must not re-seed the old serving_cache/ into the freshly
        # stashed .jax_cache: the run has to compile (and so WRITE) every
        # program it needs, so `produced` below is exactly the current set
        env["UAVSAL_SKIP_CACHE_SEED"] = "1"
        cmd = [sys.executable, os.path.join(repo, "bench.py")] + bench_flags
        print("running:", " ".join(cmd), file=sys.stderr)
        rc = subprocess.run(cmd, env=env, cwd=repo).returncode
        if rc != 0:
            raise SystemExit(rc)
        produced = sorted(os.listdir(cache)) if os.path.isdir(cache) else []
        # prune first: stale entries (old code, old keys) can never hit again
        # and would otherwise bloat the committed dir forever
        stale = [f for f in os.listdir(out_dir) if f not in produced]
        for f in stale:
            os.remove(os.path.join(out_dir, f))
        if stale:
            print(f"pruned {len(stale)} stale entries from {out_dir}", file=sys.stderr)
        for f in produced:
            shutil.copyfile(os.path.join(cache, f), os.path.join(out_dir, f))
        total = sum(os.path.getsize(os.path.join(out_dir, f)) for f in produced)
        print(f"{len(produced)} cache entries, {total / 1e6:.1f} MB -> {out_dir}",
              file=sys.stderr)
    finally:
        if os.path.isdir(bak):
            os.makedirs(cache, exist_ok=True)
            for f in os.listdir(bak):
                dst = os.path.join(cache, f)
                if not os.path.exists(dst):
                    os.rename(os.path.join(bak, f), dst)
            shutil.rmtree(bak, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Produce, audit, and prune the shippable XLA compile cache.

The full-model serving step costs minutes of XLA compile on a fresh host
(BENCH_r03 measured 376.7 s first-call on an empty cache). The committed
`serving_cache/` holds the pre-compiled programs for the flagship serving
shapes; bench.py (and every CLI entry point) seeds them into `.jax_cache`
at startup, so a fresh checkout skips the compile.

`serving_cache/` is a VERSIONED BINARY ARTIFACT with a lifecycle, not a
grow-only dump:

- **warm** (default, run ON the TPU): runs `bench.py` against an emptied
  `.jax_cache/` so every needed program compiles and is captured, copies
  the produced entries to `--out`, DELETES entries the run did not
  produce (old keys can never hit again), writes `MANIFEST.json`
  recording the producing jax/jaxlib/backend versions, and enforces the
  size budget (`--budget-mb`, default 128 — exceeding it fails the run
  so bloat is a conscious decision, not drift).
- **--check** (no TPU needed): exits non-zero if the manifest's versions
  don't match the current environment (every entry would miss — the
  cache is dead weight) or the budget is exceeded.
- **--prune** (no TPU needed): on version mismatch, deletes ALL entries
  (they are unreachable by construction: keys hash jaxlib + backend
  versions) plus anything not listed in the manifest, leaving an empty
  cache ready for a re-warm on the target backend.

Key-stability findings this was built on (measured 2026-08-19, axon TPU):
- the persistent-cache key includes the COMPILE OPTIONS, and on this
  platform those embed the compilation-cache DIRECTORY PATH — two processes
  writing to the same dir reproduce each other's keys exactly; any other
  dir produces disjoint keys. Hence: warm the real `.jax_cache` path (the
  driver's checkout lives at the same absolute path), not a scratch dir.
- keys also hash the traced module + jaxlib + backend versions, so a stale
  entry can only MISS (normal compile), never load a wrong program.

Re-run the warm whenever bench.py or the model code changes.

    python tools/warm_cache.py [--out serving_cache] [--budget-mb 128]
    python tools/warm_cache.py --check
    python tools/warm_cache.py --prune
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

MANIFEST = "MANIFEST.json"


def _versions():
    import jax
    import jaxlib

    # platform only (no device kind): reading the device would claim the
    # TPU tunnel, and --check/--prune must run on hosts without one
    return {"jax": jax.__version__, "jaxlib": jaxlib.__version__,
            "backend": os.environ.get("JAX_PLATFORMS", "axon")}


def _entries(out_dir):
    return sorted(
        f for f in os.listdir(out_dir)
        if f != MANIFEST and os.path.isfile(os.path.join(out_dir, f))
    )


def _total_bytes(out_dir, names):
    return sum(os.path.getsize(os.path.join(out_dir, f)) for f in names)


def _load_manifest(out_dir):
    p = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def check(out_dir, budget_mb):
    """Report cache liveness vs the current env; rc 0 = all live + in budget."""
    names = _entries(out_dir)
    total = _total_bytes(out_dir, names)
    man = _load_manifest(out_dir)
    cur = _versions()
    ok = True
    print(f"{len(names)} entries, {total / 1e6:.1f} MB "
          f"(budget {budget_mb} MB)", file=sys.stderr)
    if man is None:
        print("no MANIFEST.json — re-warm to record producing versions",
              file=sys.stderr)
        ok = not names  # an empty un-manifested cache is fine
    else:
        for k in ("jax", "jaxlib"):
            if man["versions"].get(k) != cur[k]:
                print(f"STALE: produced under {k}={man['versions'].get(k)}, "
                      f"current {k}={cur[k]} — every entry will miss; "
                      f"run --prune then re-warm on the TPU", file=sys.stderr)
                ok = False
        unknown = [f for f in names if f not in man.get("entries", [])]
        if unknown:
            print(f"{len(unknown)} entries not in the manifest "
                  f"(hand-copied?): {unknown[:3]}...", file=sys.stderr)
            ok = False
        missing = [f for f in man.get("entries", []) if f not in names]
        if missing:
            print(f"{len(missing)} manifest entries MISSING on disk "
                  f"(gutted cache — the next fresh run pays the full cold "
                  f"compile): {missing[:3]}... — re-warm on the TPU",
                  file=sys.stderr)
            ok = False
    if total > budget_mb * 1e6:
        print(f"OVER BUDGET: {total / 1e6:.1f} MB > {budget_mb} MB — "
              f"re-warm with only the flagship shapes, or raise --budget-mb "
              f"deliberately", file=sys.stderr)
        ok = False
    if ok:
        print("cache OK: manifest matches current versions, within budget",
              file=sys.stderr)
    return 0 if ok else 1


def prune(out_dir):
    """Delete unreachable entries: all of them on a version mismatch (keys
    hash jaxlib+backend, so a mismatched entry can never hit), plus any
    file the manifest doesn't list."""
    names = _entries(out_dir)
    man = _load_manifest(out_dir)
    cur = _versions()
    if man is None:
        dead = names  # no provenance — treat as unreachable, force a re-warm
        why = "no manifest"
    elif any(man["versions"].get(k) != cur[k] for k in ("jax", "jaxlib")):
        dead = names
        why = (f"version mismatch (cache: jax={man['versions'].get('jax')} "
               f"jaxlib={man['versions'].get('jaxlib')}; current: "
               f"jax={cur['jax']} jaxlib={cur['jaxlib']})")
    else:
        dead = [f for f in names if f not in man.get("entries", [])]
        why = "not in manifest"
    for f in dead:
        os.remove(os.path.join(out_dir, f))
    if dead:
        mp = os.path.join(out_dir, MANIFEST)
        if len(dead) == len(names) and os.path.exists(mp):
            os.remove(mp)  # nothing left to describe
        print(f"pruned {len(dead)}/{len(names)} entries ({why}); "
              f"re-warm on the TPU: python tools/warm_cache.py",
              file=sys.stderr)
    else:
        print("nothing to prune: all entries live per manifest", file=sys.stderr)
    return 0


def warm(out_dir, budget_mb, bench_flags):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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
        # budget gate BEFORE any mutation of the committed dir: an
        # over-budget warm must leave serving_cache/ exactly as it was, so
        # "growth is a conscious decision" can't be bypassed by an
        # automation that ignores the exit code after seeing files change
        total = _total_bytes(cache, produced)
        if total > budget_mb * 1e6:
            raise SystemExit(
                f"over the {budget_mb} MB budget ({total / 1e6:.1f} MB): "
                f"{out_dir} left untouched — warm fewer shapes, or pass "
                f"--budget-mb to raise it deliberately")
        # prune first: stale entries (old code, old keys) can never hit again
        # and would otherwise bloat the committed dir forever
        stale = [f for f in _entries(out_dir) if f not in produced]
        for f in stale:
            os.remove(os.path.join(out_dir, f))
        if stale:
            print(f"pruned {len(stale)} stale entries from {out_dir}", file=sys.stderr)
        for f in produced:
            shutil.copyfile(os.path.join(cache, f), os.path.join(out_dir, f))
        with open(os.path.join(out_dir, MANIFEST), "w") as f:
            json.dump({
                "versions": _versions(),
                "entries": produced,
                "total_bytes": total,
                "budget_mb": budget_mb,
                "bench_flags": bench_flags,
            }, f, indent=1, sort_keys=True)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="serving_cache")
    ap.add_argument("--budget-mb", type=float, default=128,
                    help="committed-size budget; the warm run FAILS above it")
    ap.add_argument("--check", action="store_true",
                    help="audit only (no TPU): versions + budget; rc!=0 if stale")
    ap.add_argument("--prune", action="store_true",
                    help="delete unreachable entries (no TPU): all of them on "
                         "a jax/jaxlib mismatch, else manifest strays")
    args, bench_flags = ap.parse_known_args()

    out_dir = os.path.abspath(args.out)
    if args.check and args.prune:
        ap.error("--check and --prune are mutually exclusive")
    if args.check:
        raise SystemExit(check(out_dir, args.budget_mb))
    if args.prune:
        raise SystemExit(prune(out_dir))
    warm(out_dir, args.budget_mb, bench_flags)


if __name__ == "__main__":
    main()

"""Dataset regeneration manifest: sha256 digests for the generated datasets.

The quality datasets under ``data/`` are gitignored but deterministic — every
datagen config carries a ``seed`` (``datagen/data_gen.py:58``) and the soft
backend (``datagen/softsim.py``) is pure numpy.  This tool makes regeneration
*verifiable*: one digest per dataset, computed over the sorted relative file
list and each file's sha256, committed in ``datagen/MANIFEST.json``.

    python datagen/manifest.py --write       # refresh MANIFEST.json
    python datagen/manifest.py               # verify data/ against it

Reference counterpart: none (the reference regenerates via SAPIEN with no
integrity check, ``/root/reference/datagen/data_gen.py``).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "MANIFEST.json")


def dataset_digest(root: str) -> dict:
    """One digest per dataset tree: sha256 over 'relpath sha256(file)' lines."""
    h = hashlib.sha256()
    n = 0
    for dirpath, dirnames, filenames in os.walk(root):
        # skip derived caches (e.g. the AABB loader's .aabb_cache.json) —
        # the manifest covers only what datagen wrote
        dirnames[:] = sorted(d for d in dirnames if not d.startswith("."))
        for fn in sorted(f for f in filenames if not f.startswith(".")):
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as fh:
                fh_digest = hashlib.sha256(fh.read()).hexdigest()
            h.update(f"{rel} {fh_digest}\n".encode())
            n += 1
    return {"digest": h.hexdigest(), "files": n}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--data_dir", default=os.path.join(REPO, "data"))
    args = ap.parse_args()

    names = sorted(
        d for d in os.listdir(args.data_dir)
        if os.path.isdir(os.path.join(args.data_dir, d))
    ) if os.path.isdir(args.data_dir) else []

    if args.write:
        manifest = {
            name: dataset_digest(os.path.join(args.data_dir, name))
            for name in names
        }
        with open(MANIFEST, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
            fh.write("\n")
        print(f"wrote {MANIFEST} ({len(manifest)} datasets)")
        return 0

    with open(MANIFEST) as fh:
        manifest = json.load(fh)
    failed = []
    for name, want in sorted(manifest.items()):
        root = os.path.join(args.data_dir, name)
        if not os.path.isdir(root):
            print(f"MISSING  {name} (regenerate: python datagen/data_gen.py"
                  f" --config configs/datagen/<{name} configs>.json)")
            failed.append(name)
            continue
        got = dataset_digest(root)
        ok = got == want
        print(f"{'ok      ' if ok else 'MISMATCH'} {name}"
              f" files={got['files']} digest={got['digest'][:16]}…")
        if not ok:
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

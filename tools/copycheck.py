#!/usr/bin/env python
"""Replicate the driver's copy-paste detector locally.

The driver measures difflib.SequenceMatcher(autojunk=False).ratio() on
full file text (char level) and flags repo files >0.6 similar to any
same-named or similar-sized reference file. This tool computes the max
ratio of every repo .py file against every reference .py file so
rewrites can be validated with the driver's own measure (VERDICT.md
round 1 flagged a methodology gap: line-level difflib underestimates).

Usage: python tools/copycheck.py [--threshold 0.6] [files...]
"""

import argparse
import difflib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _py_files(root, skip_dirs=(".git", "__pycache__")):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in skip_dirs]
        for f in filenames:
            if f.endswith(".py"):
                out.append(os.path.join(dirpath, f))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="repo files to check (default: all)")
    ap.add_argument("--threshold", type=float, default=0.6)
    args = ap.parse_args()

    ref_texts = {}
    for f in _py_files(REFERENCE):
        try:
            ref_texts[f] = open(f, errors="replace").read()
        except OSError:  # dangling symlink (vcsl/vta.py → absent submodule)
            pass

    repo_files = args.files or _py_files(REPO)
    any_flagged = False
    for rf in sorted(repo_files):
        path = os.path.join(REPO, rf) if not os.path.isabs(rf) else rf
        text = open(path, errors="replace").read()
        best, best_ref = 0.0, None
        for ref, rtext in ref_texts.items():
            # Cheap prefilters (both upper-bound the true ratio): length
            # ratio, then char-multiset quick_ratio — the quadratic
            # SequenceMatcher only runs on plausible pairs.
            upper = 2 * min(len(text), len(rtext)) / max(1, len(text) + len(rtext))
            if upper <= best:
                continue
            sm = difflib.SequenceMatcher(a=text, b=rtext, autojunk=False)
            if sm.quick_ratio() <= best:
                continue
            r = sm.ratio()
            if r > best:
                best, best_ref = r, ref
        rel = os.path.relpath(path, REPO)
        mark = " <-- FLAGGED" if best > args.threshold else ""
        any_flagged |= best > args.threshold
        print(f"{best:.3f}  {rel}  (vs {os.path.relpath(best_ref, REFERENCE) if best_ref else '-'}){mark}")
    return 1 if any_flagged else 0


if __name__ == "__main__":
    sys.exit(main())

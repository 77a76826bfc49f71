#!/usr/bin/env python3
"""Regenerate tools/oracle_green_hashes.json — the per-key md5 of the
oracle SQL as of each key's last driver-green check.

``__spark_entry__.queries()`` front-loads any key whose CURRENT oracle
md5 differs from this snapshot (or that has no snapshot entry), so
editing an oracle automatically re-queues the key for the driver gate
instead of letting stale green evidence stand (automates the round-5
ROUND_NOTES oracle-drift audit).

Run at ROUND START, right after the driver drops the new
``CORRECTNESS_r*.json`` and BEFORE touching any oracle this round —
at that moment the working-tree oracle strings are byte-identical to
the ones the driver just checked, so "current md5" == "md5 at green".
If a key's oracle is known to have drifted since its last green (the
round-5 audit found exactly one: ``dedup_ngram_pairs``), pass it via
``--exclude`` so it re-queues.

Usage: python tools/record_green_hashes.py [--round-start] [--exclude key ...]

At round start pass ``--round-start`` so keys whose oracles were edited
(and then driver-verified) last round re-settle at their current md5;
without it, drifted keys keep their PRIOR hash and stay unsettled.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tools", "oracle_green_hashes.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exclude", nargs="*", default=[],
                    help="keys whose oracle drifted since their last "
                         "green check — omitted so they re-queue")
    ap.add_argument("--round-start", action="store_true",
                    help="accept oracle drift: re-settle drifted keys at "
                         "their CURRENT md5. Only safe immediately after "
                         "the driver drops CORRECTNESS_r*.json, when the "
                         "working-tree oracles are byte-identical to the "
                         "ones the driver just checked.")
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    import __spark_entry__ as m

    oracles = m.oracle_sql()
    # the ONE settling-policy implementation — latest record per key
    # wins — lives in __spark_entry__.latest_green(); consuming it here
    # makes snapshot and rotation provably consistent
    green, _ = m.latest_green()

    snapshot = {
        k: hashlib.md5(oracles[k].encode()).hexdigest()
        for k in sorted(green)
        if k in oracles and k not in set(args.exclude)
    }
    # Mid-round misuse guard: keys whose CURRENT oracle md5 differs
    # from the existing snapshot have been edited since their green
    # check — re-snapshotting them would silently settle unverified
    # SQL.  By DEFAULT the prior hash is kept (the key stays unsettled
    # and re-queues for the driver gate); pass --round-start to accept
    # the drift, which is only safe right after the driver's check.
    try:
        with open(OUT) as fh:
            prior = json.load(fh)
    except (OSError, ValueError):
        prior = {}
    drifted = [k for k, h in snapshot.items()
               if k in prior and prior[k] != h]
    if drifted and args.round_start:
        print(f"NOTE: re-settling {len(drifted)} drifted keys at their "
              f"current md5 (--round-start): {drifted}")
    elif drifted:
        for k in drifted:
            snapshot[k] = prior[k]
        print(f"WARNING: {len(drifted)} keys' oracles changed since the "
              f"prior snapshot; keeping their PRIOR hashes so they stay "
              f"unsettled and re-queue for the driver gate: {drifted}\n"
              f"  If this is round start (driver just verified these "
              f"exact oracles), re-run with --round-start.")
    with open(OUT, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {len(snapshot)} green keys "
          f"({len(green) - len(snapshot)} excluded/oracle-less)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

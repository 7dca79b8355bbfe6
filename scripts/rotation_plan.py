"""Compute the next driver-grading window under the post-exhaustion
cadence (SURVEY §0, round-12 addendum).

The written schedule closed in r12: every registry key has driver-side
evidence. From r13 on, each round fronts the 50 keys whose LATEST driver
grade is OLDEST — earliest round first, ties broken by position within
that round's CORRECTNESS file (i.e. refresh order follows grade order) —
giving a full-surface refresh roughly every ceil(545/50) = 11 rounds.

Two standing exceptions the operator applies by hand (this script only
reports the freshness order):
  (a) any key that graded non-green last round is fronted again NEXT
      round — regression evidence beats freshness;
  (b) any key whose plan materially changed during the round joins the
      window if slots allow — evidence should follow change.

Usage: python scripts/rotation_plan.py [N]   (default N=50)
Prints the window as a ready-to-paste FRONT_KEYS tuple body plus a
per-round freshness histogram. Pure computation — no Spark session.
After updating registry.FRONT_KEYS, vanilla-verify the window before
fronting:  python scripts/driver_sim.py <the 50 keys>.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_grades() -> dict[str, tuple[int, int]]:
    """key -> (latest round graded, position within that round's file).

    CORRECTNESS files are JSON objects; insertion order is the driver's
    grading order, which json.load preserves (Python dicts are ordered).
    """
    out: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for pos, key in enumerate(json.load(open(path))):
            out[key] = (rnd, pos)  # later rounds overwrite: latest wins
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from classification_problem_with_pyspark_spark import registry

    registry.load_all_modules()
    keys = list(registry.QUERIES)
    grades = latest_grades()

    ungraded = [k for k in keys if k not in grades]
    if ungraded:
        # Should be empty after r12; surface loudly if the pack reopened.
        print(f"# WARNING: {len(ungraded)} keys never driver-graded — "
              "front these first:", file=sys.stderr)
        for k in ungraded:
            print(f"#   {k}", file=sys.stderr)

    order = sorted(
        (k for k in keys if k in grades), key=lambda k: grades[k]
    )
    window = ungraded + order[: max(0, n - len(ungraded))]

    hist: dict[int, int] = {}
    for k in keys:
        rnd = grades.get(k, (0, 0))[0]
        hist[rnd] = hist.get(rnd, 0) + 1
    print("# latest-grade freshness histogram (round: keys):")
    for rnd in sorted(hist):
        label = rnd if rnd else "never"
        print(f"#   r{label}: {hist[rnd]}")
    oldest = grades[order[0]][0] if order else 0
    print(f"# next window: {len(window)} keys, oldest grade r{oldest}")
    print("FRONT_KEYS: tuple[str, ...] = (")
    for k in window:
        print(f'    "{k}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

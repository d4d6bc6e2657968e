"""Measure TPE proposal pathology in a study file (VERDICT r4 task 7).

Round 4 diagnosed the hand-rolled TPE's boundary-atom duplicate
pathology on coreness attempt 4 (~20 of 48 trials burned on one
duplicated boundary point) and fixed it (uniform-prior KDE + bound
reflection, subgnn_tpu/train/hpo.py). The surrogate validation
(validate_tpe shallow win 0.675 -> 0.725) covered synthetic objectives;
this tool quantifies the fix on REAL study files so before/after
attempt-4 vs attempt-5 numbers land in RESULTS.md.

Reported per study:
  - n_trials / n_pruned
  - dup_vectors:   trials whose full param vector exactly repeats an
                   earlier trial's (wasted budget)
  - max_param_multiplicity: worst per-param exact-value repeat count
                   over FLOAT params (a KDE atom: continuous draws
                   should essentially never collide exactly)
  - bound_atoms:   float params sitting exactly on a space bound
                   (the round-4 pathology was an atom AT a bound)

Usage:
  PYTHONPATH=/root/repo python scripts/tpe_dedup_stats.py \
      harvest/coreness5k_s53_seedavg_S_e200a4/study.json [more.json ...]
"""
from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

# float-param bounds of the seed_avg_search deep space (scripts/
# seed_avg_search.py objective); int/categorical params legitimately
# repeat values, so only floats count toward atoms
FLOAT_BOUNDS = {
    "learning_rate": (1e-4, 1e-2),
    "grad_clip": (0.0, 0.5),
    "lin_dropout": (0.0, 0.4),
    "lstm_dropout": (0.0, 0.3),
}


def stats(path: Path) -> dict:
    trials = json.loads(path.read_text())["trials"]
    seen, dup_vectors = set(), 0
    per_param_vals: dict[str, Counter] = {}
    bound_atoms = 0
    for t in trials:
        key = json.dumps(t["params"], sort_keys=True, default=float)
        if key in seen:
            dup_vectors += 1
        seen.add(key)
        for name, v in t["params"].items():
            if name in FLOAT_BOUNDS:
                per_param_vals.setdefault(name, Counter())[float(v)] += 1
                lo, hi = FLOAT_BOUNDS[name]
                if float(v) in (lo, hi):
                    bound_atoms += 1
    multiplicity = {name: c.most_common(1)[0]
                    for name, c in per_param_vals.items()}
    worst = max((m for _, m in multiplicity.values()), default=0)
    return {
        "study": path.parent.name,
        "n_trials": len(trials),
        "n_pruned": sum(1 for t in trials if t.get("pruned")),
        "dup_vectors": dup_vectors,
        "max_param_multiplicity": worst,
        "param_multiplicity": {n: {"value": v, "count": c}
                               for n, (v, c) in multiplicity.items()},
        "bound_atoms": bound_atoms,
    }


def main():
    for arg in sys.argv[1:]:
        s = stats(Path(arg))
        print("TPE_DEDUP " + json.dumps(s, default=float), flush=True)


if __name__ == "__main__":
    main()

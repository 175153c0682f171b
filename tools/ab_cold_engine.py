"""Alternating COLD A/B of the r14 IVM/COW changes under the driver's
protocol (fresh JVM per measurement, same warm-up path as bench.py).

Arms (each differs from HEAD by exactly one env gate):
  head      — all three r14 changes active (current defaults)
  nockpt    — DLIS_IVM_CHECKPOINT_DELTAS=0 (eager localCheckpoints off)
  nooverlap — DLIS_COW_OVERLAP_CDF=0       (sequential CDF+data writes)
  nosigned  — DLIS_IVM_SIGNED_DELTA=0      (netted join-agg delta)
  r13ish    — all three gates off

Runs rounds in arm-rotating order so host drift hits every arm equally;
prints per-arm min/median for q183 / q113 / ivm refresh.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

ARMS: dict[str, dict[str, str]] = {
    "head": {},
    "nockpt": {"DLIS_IVM_CHECKPOINT_DELTAS": "0"},
    "nooverlap": {"DLIS_COW_OVERLAP_CDF": "0"},
    "nosigned": {"DLIS_IVM_SIGNED_DELTA": "0"},
    "r13ish": {
        "DLIS_IVM_CHECKPOINT_DELTAS": "0",
        "DLIS_COW_OVERLAP_CDF": "0",
        "DLIS_IVM_SIGNED_DELTA": "0",
    },
    "nooptwrite": {"DLIS_OPTIMIZE_WRITE": "0"},
    "bigcoalesce": {"DLIS_OPTIMIZE_WRITE_COALESCE_ROWS": "0"},
}


def main() -> None:
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    only = os.environ.get("AB_ARMS")
    arms = {
        k: v
        for k, v in ARMS.items()
        if only is None or k in only.split(",")
    }
    results: dict[str, list[dict]] = {k: [] for k in arms}
    arm_list = list(arms.items())
    for rnd in range(rounds):
        # rotate order each round so slow host windows hit arms equally
        order = arm_list[rnd % len(arm_list):] + arm_list[: rnd % len(arm_list)]
        for arm, env_over in order:
            env = dict(os.environ)
            env.update(env_over)
            p = subprocess.run(
                [sys.executable, os.path.join(HERE, "cold_probe_engine_surface.py")],
                env=env,
                capture_output=True,
                text=True,
                timeout=900,
            )
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                print(f"round {rnd} arm {arm}: FAILED\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                continue
            results[arm].append(rec)
            print(
                f"round {rnd} {arm:10s} q183={rec['q183_materialized_view_sql']:.3f} "
                f"q113={rec['q113_versioned_merge_diff']:.3f} "
                f"ivm_refresh={rec['join_agg_mv_refresh_fixed_delta']:.3f}",
                flush=True,
            )
    print("\n=== summary (min / median over rounds) ===")
    for metric in (
        "q183_materialized_view_sql",
        "q113_versioned_merge_diff",
        "join_agg_mv_refresh_fixed_delta",
        "join_agg_mv_bootstrap",
    ):
        for arm, recs in results.items():
            vals = [r[metric] for r in recs if metric in r]
            if not vals:
                continue
            print(
                f"{metric:34s} {arm:10s} min={min(vals):.3f} "
                f"med={statistics.median(vals):.3f} n={len(vals)}"
            )


if __name__ == "__main__":
    main()

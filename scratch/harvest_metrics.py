"""Summarize a live/killed training run's metrics.jsonl for BENCH.md.

Run: python scratch/harvest_metrics.py <metrics.jsonl>
"""

import json
import sys


def _subsample_with_last(seq, n):
    """Every len/n-th record plus the final one, deduplicating the tail —
    same idiom as benchmarks/config3_e2e_tpu.py."""
    sub = seq[:: max(1, len(seq) // n)]
    if seq and (not sub or sub[-1] != seq[-1]):
        sub = sub + seq[-1:]
    return sub


def main():
    path = sys.argv[1]
    curve, curve_al, growth, last, last_stats = [], [], [], {}, {}
    for line in open(path):
        r = json.loads(line)
        if "val/psnr" in r:
            curve.append([r.get("_step"), round(float(r["val/psnr"]), 2)])
            if "val/psnr_aligned" in r:
                curve_al.append(
                    [r.get("_step"), round(float(r["val/psnr_aligned"]), 2)])
        if "n_gaussians" in r:
            growth.append([r.get("_step"), int(r["n_gaussians"])])
            last_stats = {k: int(v) for k, v in r.items()
                          if k.startswith("stats/")}
            last = r
    print(json.dumps({
        "last_step": last.get("_step"),
        "steps_per_sec_last": round(float(last.get("steps_per_sec", 0)), 2),
        "n_gaussians_last": int(last.get("n_gaussians", 0)),
        "best_psnr": max((c[1] for c in curve), default=None),
        "best_psnr_aligned": max((c[1] for c in curve_al), default=None),
        "psnr_curve": curve,
        "psnr_curve_aligned": curve_al or None,
        "growth": _subsample_with_last(growth, 24),
        "stats_last": last_stats,
    }, indent=1))


if __name__ == "__main__":
    main()

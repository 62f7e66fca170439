#!/usr/bin/env python3
"""Three-point power-law fit over ScaleStress measurements (VERDICT
r13 #2): every 100x ratio so far is a single two-point comparison,
which cannot separate fixed-latency-plus-linear from mildly
super-linear. With walls at 1x, 10x and 30x we fit

    t(n) = a + b * n^p      (n = scale factor, a = fixed latency)

by solving for p from the latency-free ratio
    (t30 - t1) / (t10 - t1) = (30^p - 1) / (10^p - 1)
via bisection (monotone in p), then a and b follow. p <= ~1.1 means
linear-with-latency; p materially above 1 flags a rewrite.

Usage: python3 tools/scale_fit.py docs/SCALE_r14_10x.json \
           docs/SCALE_r14_30x.json [docs/SCALE_r14_fit.json]
"""
import json
import sys


def solve_p(r, f1, f2):
    """Solve (f2^p - 1)/(f1^p - 1) = r for p in (0.05, 3)."""
    def g(p):
        return (f2 ** p - 1.0) / (f1 ** p - 1.0) - r
    lo, hi = 0.05, 3.0
    if g(lo) * g(hi) > 0:
        return None  # ratio outside the representable band
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if g(lo) * g(mid) <= 0:
            hi = mid
        else:
            lo = mid
    return (lo + hi) / 2.0


def main():
    f10, f30 = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "docs/SCALE_r14_fit.json"
    d10 = json.load(open(f10))
    d30 = json.load(open(f30))
    assert d10["factor"] == 10 and d30["factor"] == 30
    ops10 = {**d10.get("data_ops", {}), **d10.get("meta_ops", {})}
    ops30 = {**d30.get("data_ops", {}), **d30.get("meta_ops", {})}
    rows = {}
    for name in sorted(set(ops10) & set(ops30)):
        # base walls measured twice in each run; min across both runs
        t1 = min(min(ops10[name]["t_base"]), min(ops30[name]["t_base"]))
        t10 = min(ops10[name]["t_scaled"])
        t30 = min(ops30[name]["t_scaled"])
        row = {"t_1x": t1, "t_10x": t10, "t_30x": t30,
               "ratio_10x": round(t10 / t1, 2), "ratio_30x": round(t30 / t1, 2)}
        if t30 > t10 > t1:
            r = (t30 - t1) / (t10 - t1)
            p = solve_p(r, 10.0, 30.0)
            if p is not None:
                b = (t10 - t1) / (10.0 ** p - 1.0)
                row["p"] = round(p, 3)
                row["a_fixed_sec"] = round(t1 - b, 3)
                row["b_per_unit"] = round(b, 4)
                row["verdict"] = ("linear" if p <= 1.1 else
                                  "mildly-super-linear" if p <= 1.3 else
                                  "SUPER-LINEAR")
            else:
                row["verdict"] = "ratio-outside-band"
        else:
            # non-monotone walls: latency dominates, nothing to fit
            row["p"] = None
            row["verdict"] = "latency-dominated (non-monotone walls)"
        rows[name] = row
    res = {"model": "t = a + b*n^p (n = scale factor)",
           "sources": [f10, f30], "ops": rows}
    json.dump(res, open(out, "w"), indent=1)
    for n, r in rows.items():
        print(f"{n:28s} p={r.get('p')} {r['verdict']} "
              f"(1x={r['t_1x']:.2f}s 10x={r['t_10x']:.2f}s 30x={r['t_30x']:.2f}s)")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-only: compare two graft.Bench JSON lines (per-query regressions).

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [threshold]

Accepts either a raw Bench stdout file (first line starting with
{"metric"...) or a driver BENCH_r*.json wrapper with a "tail" field.
"""
import json, re, sys

def load(path):
    txt = open(path).read()
    try:
        d = json.loads(txt)
        if isinstance(d, dict) and "queries" in d:
            return d
        if isinstance(d, dict) and "tail" in d and d["tail"]:
            m = re.search(r'\{"metric".*\}', d["tail"])
            if m:
                return json.loads(m.group(0))
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', txt)
    return json.loads(m.group(0))

def main(old_p, new_p, thresh=1.10):
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  old total {sum(oq[q] for q in shared):.1f}s  "
          f"new total {sum(nq[q] for q in shared):.1f}s")
    regs = []
    for q in shared:
        if nq[q] > oq[q] * thresh and nq[q] - oq[q] > 0.15:
            regs.append((nq[q] / oq[q], q, oq[q], nq[q]))
    for r, q, o, n in sorted(regs, reverse=True):
        print(f"REGRESSION {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    print(f"{len(regs)} regressions > {thresh}x")
    news = sorted(set(nq) - set(oq))
    if news:
        print("new queries:", ", ".join(f"{q}={nq[q]:.2f}s" for q in news))
    if "sf1_growth" in new:
        print(f"sf1 growth: {new['sf1_growth']}")
        slowest = sorted(nq.items(), key=lambda kv: -kv[1])[:8]
        print("slowest at sf0.1:", ", ".join(f"{q}={t:.2f}s" for q, t in slowest))
        if "sf1_queries" in new:
            g = [(new["sf1_queries"][q] / max(nq[q], 1e-9), q) for q in nq
                 if q in new.get("sf1_queries", {})]
            worst = sorted(g, reverse=True)[:8]
            print("worst sf1/sf0.1 growth:",
                  ", ".join(f"{q}={r:.1f}x" for r, q in worst))

if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.10
    main(sys.argv[1], sys.argv[2], t)

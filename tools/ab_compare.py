#!/usr/bin/env python3
"""A/B bench adjudication with a noise floor.

Reads two full-suite bench outputs (old binary, head binary), ranks
shared queries by |delta|, and emits the adjudication skeleton for
bench_ab/rN.json. Verdicts are only SLOWER/FASTER when the ISOLATED
delta exceeds max(0.3 s, 10% of the old median) — below that the row
says WITHIN-NOISE (the r16 verdict's #6: don't label box jitter as a
regression).
"""
import json
import sys


def load(path):
    pq = tot = None
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if d.get("metric") == "per_query":
            pq = d["queries"]
        elif d.get("metric") == "total":
            tot = d["value"]
    return pq, tot


def verdict(iso_old, iso_head):
    mo, mh = min(iso_old), min(iso_head)
    delta = mh - mo
    floor = max(0.3, 0.10 * mo)
    if abs(delta) <= floor:
        return "WITHIN-NOISE (floor %.2fs)" % floor
    if delta > 0:
        return "HEAD SLOWER %.2fx" % (mh / mo)
    return "HEAD FASTER %.2fx" % (mo / mh)


if __name__ == "__main__":
    old_path, head_path, topn = sys.argv[1], sys.argv[2], int(sys.argv[3])
    qo, to = load(old_path)
    qh, th = load(head_path)
    shared = [k for k in qh if k in qo]
    deltas = sorted(shared, key=lambda k: -abs(qh[k] - qo[k]))[:topn]
    so = sum(qo[k] for k in shared)
    sh = sum(qh[k] for k in shared)
    out = {
        "full_suite": {
            "old_total_sec": round(to, 2),
            "head_total_sec": round(th, 2),
            "shared_min_sum": {
                "old": round(so, 2), "head": round(sh, 2),
                "ratio": round(sh / so, 3)},
            "new_queries": {k: round(qh[k], 3) for k in qh
                            if k not in qo},
        },
        "top_delta": [
            {"query": k, "full_old": round(qo[k], 3),
             "full_head": round(qh[k], 3),
             "delta": round(qh[k] - qo[k], 3)}
            for k in deltas],
    }
    print(json.dumps(out, indent=1))

#!/usr/bin/env python3
"""Triage .explain("formatted") dumps (plans/r16/*_<tag>.txt).

For each plan: count Exchange nodes (by kind), join operators (by
strategy), scans whose PushedFilters is empty while a Filter sits
above a scan, and rows whose ReadSchema looks unpruned (heuristic:
>12 columns). Output a per-query table sorted by Exchange count so a
human can cross-check the expensive queries' shapes against the code.

Usage: python3 tools/plan_triage.py plans/r16 before [name_filter]
"""
import os, re, sys, collections

def triage(path):
    text = open(path, encoding="utf-8").read()
    if text.startswith("PLAN FAILED"):
        return {"failed": True}
    ops = collections.Counter()
    for m in re.finditer(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*([A-Za-z][A-Za-z0-9]+)", text, re.M):
        ops[m.group(1)] += 1
    # \bExchange\b never matches inside "BroadcastExchange" (no word
    # boundary between 't' and 'E'), so broadcast-heavy plans were
    # under-ranked in the triage sort (r16 advice). Count the two
    # kinds separately: shuffles are the expensive axis the sort
    # ranks on; broadcasts ride along as their own column.
    bcast = len(re.findall(r"\bBroadcastExchange\b", text))
    exchanges = len(re.findall(r"\bExchange\b|\bShuffleExchange", text))
    reused = len(re.findall(r"ReusedExchange", text))
    joins = collections.Counter()
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        n = text.count(j)
        if n: joins[j] = n
    scans = len(re.findall(r"Scan parquet|FileScan parquet|Scan orc|Scan csv|Scan json", text))
    nopush = len(re.findall(r"PushedFilters: \[\]", text))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", text))
    wide = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        ncols = m.group(1).count(",") + 1 if m.group(1) else 0
        if ncols > 12: wide.append(ncols)
    rowudf = text.count("BatchEvalPython") + text.count("ArrowEvalPython")
    sorts = text.count("Sort ")
    aqe = "AdaptiveSparkPlan" in text
    return dict(failed=False, exchanges=exchanges, bcast=bcast,
                reused=reused,
                joins=dict(joins), scans=scans, nopush=nopush,
                pushed=pushed, wide=wide, sorts=sorts, aqe=aqe)

def main():
    d, tag = sys.argv[1], sys.argv[2]
    filt = sys.argv[3] if len(sys.argv) > 3 else ""
    rows = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(f"_{tag}.txt"): continue
        name = f[: -len(f"_{tag}.txt")]
        if filt and filt not in name: continue
        rows.append((name, triage(os.path.join(d, f))))
    rows.sort(key=lambda r: (-r[1].get("exchanges", 0), r[0]))
    print(f"{'query':34s} {'exch':>4} {'bcast':>5} {'reuse':>5} {'scan':>4} {'nopush':>6} {'sort':>4}  joins / notes")
    for name, t in rows:
        if t.get("failed"):
            print(f"{name:34s} FAILED"); continue
        js = ",".join(f"{k.replace('Join','')}x{v}" for k, v in t["joins"].items())
        notes = []
        if t["wide"]: notes.append(f"wideRead{t['wide']}")
        if not t["aqe"]: notes.append("noAQE")
        print(f"{name:34s} {t['exchanges']:4d} {t.get('bcast', 0):5d} {t['reused']:5d} {t['scans']:4d} "
              f"{t['nopush']:6d} {t['sorts']:4d}  {js} {' '.join(notes)}")

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev tool: compare two bench artifacts (bench/bench_r*.json or the
driver's BENCH_r*.json tail captures) query by query.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold] [--cpu]

Prints per-query ratios over `threshold` (default 1.5), the common-query
geomean, and queries present on only one side. Tolerates the driver's
truncated tail captures by best-effort parsing the partial JSON line.

--cpu compares the `cpu_s` (executor CPU seconds) field instead of wall
seconds — the host-noise-immune signal bench artifacts carry from round
6. A query that regressed in wall time but not CPU is a host/IO effect,
not an engine change (the round-5 cross-boot ambiguity this resolves).
"""
import sys, json, math, re


def load(path, field="queries"):
    text = open(path).read()
    try:
        d = json.loads(text)
        if field != "queries":
            if field in d:
                return {k: v for k, v in d[field].items()
                        if isinstance(v, (int, float)) and v >= 0}
            print(f"note: {path} has no '{field}' field (pre-round-6 "
                  "artifact?) — falling back to wall seconds")
        if "queries" in d:
            return {k: v for k, v in d["queries"].items()
                    if isinstance(v, (int, float)) and v >= 0}
        # bench_r*.json full artifact: {"queries": {...}} or flat medians
        if "medians" in d:
            return {k: v for k, v in d["medians"].items() if v >= 0}
        if "tail" in d:  # driver wrapper: the one JSON line, truncated
            pairs = re.findall(r'"(q[\w]+|cdc_pipeline_2m)":([0-9.]+)',
                               d["tail"])
            return {k: float(v) for k, v in pairs}
        return {k: v for k, v in d.items() if isinstance(v, (int, float))}
    except json.JSONDecodeError:
        # driver tail capture: grab every "name":number pair we can see
        pairs = re.findall(r'"(q[\w]+|cdc_pipeline_2m)":([0-9.]+)', text)
        return {k: float(v) for k, v in pairs}


def main(argv):
    field = "cpu_s" if "--cpu" in argv else "queries"
    argv = [a for a in argv if a != "--cpu"]
    old, new = load(argv[0], field), load(argv[1], field)
    thr = float(argv[2]) if len(argv) > 2 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries"); return 1
    ratios = {q: new[q] / max(old[q], 1e-9) for q in common}
    geo = math.exp(sum(math.log(max(r, 1e-9)) for r in ratios.values())
                   / len(ratios))
    print(f"common queries: {len(common)}   geomean new/old: {geo:.3f}")
    slow = {q: r for q, r in ratios.items() if r > thr}
    for q in sorted(slow, key=lambda q: -slow[q]):
        print(f"  REGRESSED {q}: {old[q]:.2f}s -> {new[q]:.2f}s "
              f"({slow[q]:.1f}x)")
    fast = {q: r for q, r in ratios.items() if r < 1 / thr}
    for q in sorted(fast, key=lambda q: fast[q])[:10]:
        print(f"  improved  {q}: {old[q]:.2f}s -> {new[q]:.2f}s "
              f"({fast[q]:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): "
              + ", ".join(f"{q}={new[q]:.2f}s" for q in only_new))
    only_old = sorted(set(old) - set(new))
    if only_old:
        print(f"old-only ({len(only_old)}): " + ", ".join(only_old))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

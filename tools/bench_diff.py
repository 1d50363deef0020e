#!/usr/bin/env python3
"""Per-query bench regression diff: BENCH_r{N}.json vs BENCH_r{N-1}.json.

Usage:
    python3 tools/bench_diff.py NEW.json OLD.json [--ratio 1.3]

Handles both raw bench lines ({"metric":...,"queries":{...}}) and the
driver's wrapper ({"parsed": {...}} or the line embedded in "tail").

Per-query ratios are first divided by the run's MEDIAN ratio — a loaded
box slows the whole suite uniformly (1.3x whole-run drift observed
between back-to-back runs) and that is environment, not regression.
Residual variance is still ~±20%, so a single normalized >1.3x flag is
only a WATCH; a query flagged in two consecutive diffs (state carried in
tools/bench_flags.json, keyed by the NEW file's name) is a REGRESSION.
Exit code 1 iff any REGRESSION.
"""
import json
import re
import sys
from pathlib import Path

FLAGS_PATH = Path(__file__).parent / "bench_flags.json"


def load_bench(path):
    d = json.load(open(path))
    if "queries" in d:
        return d
    if d.get("parsed"):
        return d["parsed"]
    # Fall back: extract the one-line JSON from the captured log tail.
    tail = d.get("tail", "")
    m = re.search(r'\{"metric":.*?"queries":.*\}', tail)
    if m:
        return json.loads(m.group(0))
    # Head-truncated tail (the driver keeps only the END of the log, so the
    # bench line can be cut mid-queries — BENCH_r02.json is). Recover the
    # surviving name:seconds pairs up to the queries-closing `},"errors"`.
    m = re.search(r'([^{]*)\},"errors"', tail)
    if m:
        pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9.eE+-]+)', m.group(1))
        if pairs:
            print(f"warning: bench line in {path} is head-truncated; "
                  f"recovered {len(pairs)} queries", file=sys.stderr)
            return {"queries": {k: float(v) for k, v in pairs}}
    sys.exit(f"no bench line found in {path}")


def main():
    argv = sys.argv[1:]
    ratio_lim = 1.3
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--ratio"):
            if "=" in a:
                ratio_lim = float(a.split("=", 1)[1])
            else:
                ratio_lim = float(argv[i + 1])
                i += 1  # consume the value so it is not a positional arg
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    new_path, old_path = args
    new, old = load_bench(new_path), load_bench(old_path)
    nq, oq = new["queries"], old["queries"]

    # Escalation requires two CONSECUTIVE diffs, i.e. the prior flags came
    # from diffing a DIFFERENT (earlier) bench file — re-running the same
    # comparison must not self-escalate a single noisy measurement.
    prev_flags = set()
    prev_drift_flag = False
    if FLAGS_PATH.exists():
        prev = json.load(open(FLAGS_PATH))
        if prev.get("new") != str(new_path):
            prev_flags = set(prev.get("flagged", []))
            prev_drift_flag = bool(prev.get("median_drift_flagged"))

    # Normalize by the MEDIAN ratio: a loaded box slows every query
    # uniformly (observed 1.3x whole-run drift between back-to-back runs),
    # which is environment, not regression. Flag only queries that moved
    # relative to the rest of the suite.
    shared = [n for n in nq if n in oq and oq[n] > 0]
    ratios = sorted(nq[n] / oq[n] for n in shared)
    med = ratios[len(ratios) // 2] if ratios else 1.0

    # The normalization is blind to a SUITE-WIDE regression (a global config
    # or codegen change slows everything uniformly and divides out to
    # ~1.0x), so the median drift itself gets the same WATCH->REGRESSION
    # rule: slower-direction drift past the ratio limit in two consecutive
    # diffs escalates.
    drift_flag = med > ratio_lim

    flagged, regressions, rows = [], [], []
    for name in sorted(set(nq) | set(oq)):
        if name not in oq:
            rows.append((name, None, nq[name], "NEW"))
            continue
        if name not in nq:
            rows.append((name, oq[name], None, "REMOVED"))
            continue
        r = (nq[name] / oq[name] if oq[name] > 0 else float("inf")) / med
        status = ""
        # Absolute floor: a 30ms wobble on a 150ms map-only query clears
        # any ratio bar but is pure jitter — require a delta a human would
        # ever chase before flagging.
        if r > ratio_lim and nq[name] - oq[name] >= 0.25:
            flagged.append(name)
            status = "REGRESSION" if name in prev_flags else "WATCH"
            if name in prev_flags:
                regressions.append(name)
        elif r < 1 / ratio_lim:
            status = "faster"
        rows.append((name, oq[name], nq[name], status or f"{r:.2f}x"))

    # Persist flag state BEFORE printing: a downstream `| head` closes the
    # pipe early and would otherwise kill the run before the state write.
    drift_regression = drift_flag and prev_drift_flag
    json.dump({"new": str(new_path), "against": str(old_path),
               "flagged": sorted(flagged),
               "regressions": sorted(regressions),
               "median_drift": round(med, 4),
               "median_drift_flagged": drift_flag}, open(FLAGS_PATH, "w"), indent=1)

    print(f"bench diff: {new_path} vs {old_path} (flag ratio {ratio_lim}x "
          f"after dividing out the median drift {med:.2f}x; "
          f"2 consecutive flags => REGRESSION)")
    # A truncated/driver-wrapped bench file may lack 'value' — fall back to
    # the per-query sum rather than KeyError (the flag state is already
    # written above; dying here would leave it inconsistent with the output).
    old_total = old.get("value", sum(oq.values()))
    new_total = new.get("value", sum(nq.values()))
    print(f"total: {old_total:.1f}s -> {new_total:.1f}s")
    w = max(len(r[0]) for r in rows)
    for name, o, n, status in rows:
        os_ = f"{o:7.2f}" if o is not None else "      -"
        ns_ = f"{n:7.2f}" if n is not None else "      -"
        print(f"  {name:<{w}} {os_} -> {ns_}  {status}")

    # A query erroring out of the NEW run is the worst regression there is
    # (Bench omits it from 'queries', so no ratio exists to flag it).
    new_errors = new.get("errors") or []
    if new_errors:
        print(f"ERRORED in new run (no timing emitted): {', '.join(new_errors)}")
    if drift_regression:
        print(f"SUITE-WIDE REGRESSION: median drift {med:.2f}x > {ratio_lim}x "
              f"in two consecutive diffs")
    elif drift_flag:
        print(f"watch: suite-wide median drift {med:.2f}x > {ratio_lim}x "
              f"(environment or global regression; 2 consecutive => REGRESSION)")
    if regressions:
        print(f"REGRESSIONS (flagged twice consecutively): {', '.join(regressions)}")
    if flagged:
        print(f"watch (first flag, within 2-run tolerance): {', '.join(flagged)}")
    if regressions or drift_regression or new_errors:
        sys.exit(1)


if __name__ == "__main__":
    main()

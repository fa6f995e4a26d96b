#!/usr/bin/env python3
"""Oracle-total drift check for tools/bench_scales.sh.

A contended sweep inflates the DuckDB oracle denominator (observed:
sf1 oracle 602 s -> 1113 s on identical SQL across boots), which would
silently distort the round's headline ratios. Compare the candidate
artifact's oracle total against the previous round's artifact:

  bench_drift.py PREV CAND           -> prints the signed drift fraction;
                                        exit 1 when drift > +25%
  bench_drift.py --stamp PREV CAND   -> prints CAND re-serialized with
                                        oracle_drift_vs_prev /
                                        oracle_drift_flag fields added
  bench_drift.py --pick A B          -> prints the path of the LESS
                                        contended of two candidate
                                        artifacts (lower oracle total on
                                        shared queries; ties/missing ->
                                        lower engine total; A on a full
                                        tie). Used by the sweep's drift
                                        re-run so a WORSE re-run can never
                                        displace a better first reading
                                        (round-13 "what's wrong" #2).

The flag is DIRECTIONAL (round 13): only a candidate whose oracle is
>25% SLOWER than the previous artifact flags, because the guard exists
to catch a contended candidate. The opposite sign — the oracle got
faster — means the previous artifact was the contended one and the
candidate is the cleaner reading (exactly the round-12→13 re-stamp
case: r12's sf0.1/sf1 sessions carried 41%/37% contention that the
quiet-host re-run removes). The signed value is still stamped so a
large negative drift remains visible for adjudication.

PREV missing/unreadable (first sweep) -> drift "none", exit 0.
"""
import json
import sys

THRESHOLD = 0.25


def pick(path_a, path_b):
    """Print the path of the less-contended candidate artifact."""
    def load(p):
        try:
            with open(p) as f:
                return json.load(f)
        except Exception:
            return None
    a, b = load(path_a), load(path_b)
    if a is None and b is None:
        # stamping an unparseable artifact would silently poison the
        # sweep — fail loudly instead of defaulting to path_a
        print("bench_drift.py --pick: BOTH candidate artifacts are "
              "unreadable", file=sys.stderr)
        sys.exit(2)
    if a is None or b is None:
        print(path_a if b is None else path_b)
        return
    ao, bo = a.get("oracle_sec") or {}, b.get("oracle_sec") or {}
    shared = [q for q in ao if q in bo
              and isinstance(ao[q], (int, float))
              and isinstance(bo[q], (int, float))]
    at = sum(ao[q] for q in shared)
    bt = sum(bo[q] for q in shared)
    # The oracle total decides only when it differs MATERIALLY (>10%):
    # a reading contended only during the ENGINE leg can carry a clean
    # oracle total, so near-ties fall through to the engine total as a
    # second contention signal instead of being adjudicated on noise.
    if at > 0 and bt > 0 and abs(at - bt) > 0.10 * min(at, bt):
        print(path_a if at < bt else path_b)
        return
    # oracle legs absent or within noise -> lower engine total wins
    ae, be = a.get("value"), b.get("value")
    if isinstance(ae, (int, float)) and isinstance(be, (int, float)) and be < ae:
        print(path_b)
    else:
        print(path_a)


def main():
    if "--pick" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--pick"]
        if len(args) != 2:
            sys.exit("usage: bench_drift.py --pick A B")
        pick(*args)
        return
    stamp = "--stamp" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--stamp"]
    if len(args) != 2:
        sys.exit("usage: bench_drift.py [--stamp] PREV CAND")
    prev_path, new_path = args
    with open(new_path) as f:
        new = json.load(f)
    drift = None
    try:
        with open(prev_path) as f:
            prev = json.load(f)
        po = prev.get("oracle_sec") or {}
        no = new.get("oracle_sec") or {}
        # compare ONLY queries present in both artifacts: the suite grows
        # across rounds, and new oracle SQL (especially recursive-CTE
        # replays) would read as "drift" when it is just new coverage —
        # the guard exists for same-SQL contention swings, nothing else
        shared = [q for q in no
                  if q in po and isinstance(po[q], (int, float))
                  and isinstance(no[q], (int, float))]
        pt = sum(po[q] for q in shared)
        nt = sum(no[q] for q in shared)
        if pt > 0 and nt > 0:
            drift = (nt - pt) / pt
    except Exception:
        pass
    if stamp:
        new["oracle_drift_vs_prev"] = round(drift, 4) if drift is not None else None
        new["oracle_drift_flag"] = bool(drift is not None and drift > THRESHOLD)
        print(json.dumps(new))
    else:
        print("none" if drift is None else f"{drift:+.4f}")
        sys.exit(1 if (drift is not None and drift > THRESHOLD) else 0)


main()

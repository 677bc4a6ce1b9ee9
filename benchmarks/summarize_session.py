"""Digest a tpu_session.sh run into a RESULTS.md-ready markdown summary.

The session script (benchmarks/tpu_session.sh) writes one log per leg to
benchmarks/logs/tpu_${TAG}_${tag}.log plus an rc ledger in
tpu_${TAG}_status.log. Tunnel windows are scarce (the axon relay has died
mid-session in 3 of 4 rounds — RESULTS.md incident notes), so turning ~25
logs into decisions must be mechanical: this tool extracts every JSON
metric line and every bracketed `[bench]`-style measurement line, pairs
them with each leg's exit code, and prints one markdown digest.

Usage:  python benchmarks/summarize_session.py [TAG]      # default r05
        python benchmarks/summarize_session.py r05 --raw  # also dump tails
                                                           # of failed legs

Purely host-side (no jax import) — safe to run while a TPU leg is live.
"""
from __future__ import annotations

import json
import os
import re
import sys

LOGDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")

# measurement lines worth surfacing even when they aren't JSON
_BRACKET = re.compile(r"^\[(bench|roofline|convbn|recall_guard|kernel_check|"
                      r"ablate|apply_r|sample|g_breakdown|import_t7)\]")
_NUMBERY = re.compile(r"img/s|img-steps/s|qps|mfu|tflops|ms/step|recall|"
                      r"rc=|speedup|ms\)|ms vs", re.IGNORECASE)


def _leg_lines(path):
    """(json_records, bracketed_measurement_lines, tail) of one leg log."""
    recs, brackets, tail = [], [], []
    try:
        with open(path, errors="replace") as f:
            lines = f.read().splitlines()
    except OSError:
        return recs, brackets, tail
    for ln in lines:
        s = ln.strip()
        if s.startswith("{") and s.endswith("}"):
            try:
                recs.append(json.loads(s))
                continue
            except ValueError:
                pass
        if _BRACKET.match(s) and _NUMBERY.search(s):
            brackets.append(s)
    tail = lines[-8:]
    return recs, brackets, tail


def _fmt_rec(r):
    m = r.get("metric", "?")
    v = r.get("value")
    u = r.get("unit", "")
    extra = {k: v2 for k, v2 in r.items()
             if k not in ("metric", "value", "unit")}
    core = (f"{m}: **{v:,.1f}** {u}" if isinstance(v, (int, float))
            else f"{m}: {v} {u}" if v is not None
            else m + ": " + json.dumps(extra))
    if extra and v is not None:
        core += "  " + " ".join(f"{k}={v2}" for k, v2 in extra.items())
    return core


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    raw = "--raw" in argv
    argv = [a for a in argv if not a.startswith("--")]
    tag = argv[0] if argv else "r05"

    status_path = os.path.join(LOGDIR, f"tpu_{tag}_status.log")
    status = {}  # leg -> rc (last occurrence wins: re-runs overwrite)
    order = []
    if os.path.exists(status_path):
        for ln in open(status_path):
            m = re.match(r"rc=(\d+) tag=(\S+)", ln.strip())
            if m:
                leg = m.group(2)
                if leg not in status:
                    order.append(leg)
                status[leg] = int(m.group(1))

    # legs with logs but no status entry yet (session still running)
    for fn in sorted(os.listdir(LOGDIR)):
        m = re.match(rf"tpu_{re.escape(tag)}_(.+)\.log$", fn)
        if m and m.group(1) != "status" and m.group(1) not in status:
            order.append(m.group(1))
            status[m.group(1)] = None

    print(f"# TPU session digest — tag `{tag}`\n")
    if not order:
        print(f"(no logs matching tpu_{tag}_*.log in {LOGDIR})")
        return 1

    fails = []
    for leg in order:
        rc = status[leg]
        path = os.path.join(LOGDIR, f"tpu_{tag}_{leg}.log")
        recs, brackets, tail = _leg_lines(path)
        badge = ("RUNNING/NO-RC" if rc is None else
                 "ok" if rc == 0 else f"**FAILED rc={rc}**")
        print(f"## {leg} — {badge}")
        for b in brackets:
            print(f"- `{b}`")
        for r in recs:
            print(f"- {_fmt_rec(r)}")
        if not recs and not brackets:
            # CLI e2e legs print no metrics — evidence is the final
            # trainer/pipeline line (e.g. "<trainer> Last epoch reached.")
            last = next((t for t in reversed(tail)
                         if t.strip() and "WARNING" not in t), None)
            print(f"- (no metric lines; last: `{last.strip()}`)"
                  if last else "- (empty log)")
        if rc not in (0, None):
            fails.append((leg, tail))
        print()

    if fails:
        print("## Failed-leg tails\n")
        for leg, tail in fails:
            print(f"### {leg}")
            print("```")
            for t in tail:
                print(t)
            print("```\n")
    elif raw:
        print("(no failed legs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Generate the SURVEY closing-numbers block FROM the committed
artifacts, so the "single source of truth" section can never drift
from the JSON it cites (the r9/r10 blocks quoted a bench total no
artifact matched; this script makes the numbers byte-derived).

Usage:  python3 dev/closing_numbers.py [round_label] [tests_line]
e.g.    python3 dev/closing_numbers.py r11 "301 across 37 suites"

Reads (repo root, best-effort — missing artifacts are skipped):
  BENCH_LAST.json             bench total / per-query / failed
  CORRECTNESS_r*.json         latest driver sf0.01 gate
  CORRECTNESS_SF01_*.json     sf0.1 oracle-parity artifact (latest)
  CORRECTNESS_SF1_*.json      sf1 oracle-parity artifact (latest)
  SCALE_*.json                latest scale sweep
Dev tooling only — the shipped library has no Python dependency.
"""
import glob, json, os, re, subprocess, sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
rnd = sys.argv[1] if len(sys.argv) > 1 else "rN"
tests = sys.argv[2] if len(sys.argv) > 2 else None


def latest(pattern):
    fs = sorted(glob.glob(os.path.join(root, pattern)))
    return (fs[-1], json.load(open(fs[-1]))) if fs else (None, None)


# the quadratic exact-oracle instruments, reported on their own line
# so the operator total is a stable round-over-round signal (r16
# verdict task 4); Bench.scala emits the split since r17 — the
# fallback recomputes it for older artifacts
INSTRUMENTS = {"near_dup_jaccard", "dedup_pareto"}

out = []
bench_f = os.path.join(root, "BENCH_LAST.json")
if os.path.exists(bench_f):
    b = json.load(open(bench_f))
    qs = b.get("queries", {})
    inst = set(b.get("instruments", INSTRUMENTS))
    inst_total = b.get("instruments_total",
                       sum(v for k, v in qs.items() if k in inst))
    ops_total = b.get("operators_total", b["value"] - inst_total)
    samples = b.get("samples", {})
    mins = {k: min(v) for k, v in samples.items() if v} or qs
    top = sorted(mins.items(), key=lambda kv: -kv[1])[:5]
    top_s = ", ".join(f"{k} {v:.1f}s" for k, v in top)
    out.append(
        f"- **Bench, sf0.1 local[32]** (`BENCH_LAST.json`): **TOTAL "
        f"{b['value']:.1f} s across all {len(qs)} queries, "
        f"{b.get('failed', '?')} failed** — operators "
        f"{ops_total:.1f} s / instruments {inst_total:.1f} s "
        f"({', '.join(sorted(inst))}); load {'/'.join(b.get('load', []))} s; "
        f"slowest by min-sample: {top_s}.")

cf, c = latest("CORRECTNESS_r[0-9]*.json")
if c:
    n = len(c)
    ok = sum(1 for v in c.values()
             if isinstance(v, dict) and v.get("rows_match")
             and v.get("schema_match") and v.get("hash_match")
             and not v.get("err"))
    weak = sorted(k for k, v in c.items()
                  if isinstance(v, dict) and v.get("err"))
    out.append(
        f"- **Correctness, sf0.01** (driver gate, `{os.path.basename(cf)}`): "
        f"**{ok}/{n} hash-match**"
        + (f"; err rows: {', '.join(weak)}" if weak else "; zero `err` rows")
        + ".")

for pat, label in [("CORRECTNESS_SF01_*.json", "sf0.1"),
                   ("CORRECTNESS_SF1_*.json", "sf1")]:
    sf_f, s = latest(pat)
    if s:
        to = s.get("oracle_timeout", [])
        out.append(
            f"- **Correctness, {label}** (`{os.path.basename(sf_f)}`): "
            f"**{s.get('pass')}/{s.get('oracles')} PASS, {s.get('fail')} FAIL**"
            + (f", {len(to)} oracle-timeout ({', '.join(to)})" if to else
               ", zero oracle timeouts")
            + f"; rows-only: {len(s.get('rows_only_queries', []))}.")

sc_f, sc = latest("SCALE_r[0-9]*.json")
if sc and sc.get("totals"):
    fa = [str(f) for f in sc.get("factors", [])]
    tot = sc["totals"]
    ratios = {k: v[fa[-1]] / v[fa[0]] for k, v in sc.get("queries", {}).items()
              if v.get(fa[0]) and v.get(fa[-1])}
    worst = max(ratios.items(), key=lambda kv: kv[1]) if ratios else ("-", 0)
    out.append(
        f"- **Scaling** (`{os.path.basename(sc_f)}`, {len(sc.get('queries', {}))}"
        f"-query sweep): **{tot[fa[0]]:.1f} s at {fa[0]}× → {tot[fa[-1]]:.1f} s "
        f"at {fa[-1]}× data = {tot[fa[-1]]/tot[fa[0]]:.1f}× aggregate wall**, "
        f"{sc.get('failed', '?')} failed; worst per-query ratio "
        f"{worst[1]:.1f}× ({worst[0]}).")

if tests:
    out.append(f"- **ScalaTests: {tests}, all green.**")

try:
    loc = subprocess.run(
        ["bash", "-c",
         r"find src/main -name '*.scala' -o -name '*.java' | xargs wc -l | tail -1"],
        capture_output=True, text=True, cwd=root).stdout.split()[0]
    tloc = subprocess.run(
        ["bash", "-c", r"find src/test -name '*.scala' | xargs wc -l | tail -1"],
        capture_output=True, text=True, cwd=root).stdout.split()[0]
    files = subprocess.run(
        ["bash", "-c", r"find src/main -name '*.scala' | wc -l"],
        capture_output=True, text=True, cwd=root).stdout.strip()
    out.append(f"- **LoC:** src/main {loc} across {files} Scala files; "
               f"tests {tloc}.")
except Exception:
    pass

print(f"## §17 Round-{rnd[1:]} closing numbers "
      f"(generated: `python3 dev/closing_numbers.py {rnd}`)\n")
print("\n".join(out))

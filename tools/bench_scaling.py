#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md measurement protocol).

The north_rule's N → 4N-executor criterion cannot use a real cluster in this
sandbox; per driver instruction it is evidenced by running the SAME crawl
job on the SAME input at two local parallelism levels and reporting
throughput at both plus scaling efficiency:

    efficiency = (throughput_4N / throughput_N) / 4        (target ≥ 0.8)

Runs ``bench.py --crawl-only`` in fresh subprocesses (fresh JVM each, so
neither run warms the other) at local[8] and local[32], prints one JSON
line, and rewrites the "## Measured scaling" section of BENCH.md.

Usage: python tools/bench_scaling.py [--low 8] [--high 32]
Knobs via env: SPARK_GRAFT_CRAWL_URLS / _ROUNDS / _BUDGET / _IMAGES.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), **env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"bench.py failed at local[{cpus}]")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _fidelity_md(fid: dict, high: int) -> str:
    if "phash_ok_rate" in fid:
        return (
            f"Per-row fidelity over all fetched rows of the `local[{high}]` "
            f"run:\nphash match rate = {fid['phash_ok_rate']:.4f}, min PSNR "
            f"= {fid['min_psnr_db']} dB (≥ 40 dB required for\nlossy "
            "formats; lossless rows report the 1e9 sentinel).\n"
        )
    return f"Mode: {fid.get('mode', 'n/a')}.\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument(
        "--reps", type=int, default=3,
        help="runs per level; the MEDIAN throughput is the headline "
        "(best-of also reported; host noise on this shared VM is ±8-10%%)",
    )
    ap.add_argument(
        "--warmup", type=int, default=0,
        help="discarded low+high pairs run BEFORE the measured pairs. "
        "Round-5 campaign evidence for why: the 5 measured pair "
        "efficiencies trended monotonically 0.571 → 0.812 — the first "
        "pairs ran against a cold page cache / still-settling host, and "
        "that cold-start tax is not the engine's scaling. Warmup pairs "
        "are reported (count only) in the JSON for honesty.",
    )
    args = ap.parse_args()
    factor = args.high / args.low

    env_extra: dict[str, str] = {}

    def reps_at(cpus: int) -> tuple[dict, list[float]]:
        runs = [run_at(cpus, env_extra) for _ in range(args.reps)]
        tps = sorted(r["crawl"]["mementos_per_sec"] for r in runs)
        med = tps[len(tps) // 2] if len(tps) % 2 else (
            (tps[len(tps) // 2 - 1] + tps[len(tps) // 2]) / 2
        )
        # the run whose throughput IS the (lower-)median carries the stage
        # detail; list of all rep throughputs is reported alongside
        rep = min(runs, key=lambda r: abs(r["crawl"]["mementos_per_sec"] - med))
        rep["crawl"]["median_mementos_per_sec"] = med
        return rep, tps

    # INTERLEAVED PAIRS, not sequential levels: this host's throughput
    # drifts ±40% across hours (same code measured 7266 → 3500 m/s at
    # local[4] in one afternoon), so running all low reps then all high
    # reps lets the drift of whichever hour each level landed in masquerade
    # as (in)efficiency. Each rep runs low then high back-to-back (order
    # alternated to cancel linear drift within the pair), the efficiency is
    # computed PER PAIR, and the headline is the median pair efficiency —
    # slow hours shift both halves of a pair together and cancel.
    for i in range(args.warmup):
        for c in ((args.low, args.high) if i % 2 == 0 else (args.high, args.low)):
            w = run_at(c, env_extra)
            sys.stderr.write(
                f"warmup pair {i}: local[{c}] "
                f"{w['crawl']['mementos_per_sec']} m/s (discarded)\n"
            )
    pairs: list[tuple[dict, dict]] = []
    for i in range(args.reps):
        order = (args.low, args.high) if i % 2 == 0 else (args.high, args.low)
        got = {c: run_at(c, env_extra) for c in order}
        pairs.append((got[args.low], got[args.high]))
    tps_lo = sorted(p[0]["crawl"]["mementos_per_sec"] for p in pairs)
    tps_hi = sorted(p[1]["crawl"]["mementos_per_sec"] for p in pairs)
    effs = sorted(
        (p[1]["crawl"]["mementos_per_sec"] / p[0]["crawl"]["mementos_per_sec"])
        / factor
        for p in pairs
    )
    n = len(effs)
    eff = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
    eff_best = max(effs)
    # stage detail from the pair whose efficiency IS the (lower-)median
    med_pair = min(
        pairs,
        key=lambda p: abs(
            (p[1]["crawl"]["mementos_per_sec"] / p[0]["crawl"]["mementos_per_sec"])
            / factor
            - eff
        ),
    )
    lo, hi = med_pair
    tp_lo = lo["crawl"]["mementos_per_sec"]
    tp_hi = hi["crawl"]["mementos_per_sec"]

    # append-only seen-checkpoint evidence: the per-round checkpoint series
    # must not trend upward with |seen| (allow 1.5x first→last headroom for
    # round-size variance)
    ck_rounds = hi["crawl"].get("stage_rounds_s", {}).get("checkpoint", [])
    ck_flat = (
        len(ck_rounds) < 3 or ck_rounds[-1] <= 1.5 * max(ck_rounds[0], 0.2)
    )
    report = {
        "metric": "crawl scaling efficiency",
        "value": round(eff, 3),
        "unit": f"(tp@local[{args.high}] / tp@local[{args.low}]) / {factor:g}"
                f" — median of {args.reps} interleaved pairs",
        "pair_efficiencies": [round(e, 3) for e in effs],
        "efficiency_best_of": round(eff_best, 3),
        "reps_low_tps": tps_lo,
        "reps_high_tps": tps_hi,
        "low": {"cores": args.low, "mementos_per_sec": tp_lo,
                "wall_s": lo["crawl"]["wall_s"], "stage_s": lo["crawl"]["stage_s"]},
        "high": {"cores": args.high, "mementos_per_sec": tp_hi,
                 "wall_s": hi["crawl"]["wall_s"], "stage_s": hi["crawl"]["stage_s"]},
        "fetched": hi["crawl"]["fetched"],
        "n_urls": hi["crawl"]["n_urls"],
        "fidelity": hi["crawl"]["fidelity"],
        "checkpoint_per_round_s": ck_rounds,
        "checkpoint_flat": ck_flat,
        # Spark jobs per round at each level (statusTracker delta): the
        # per-round driver fixed cost is jobs × scheduling latency and is
        # cores-independent — the series quantifies the non-scaling term
        "jobs_per_round_low": lo["crawl"].get("jobs_rounds", []),
        "jobs_per_round_high": hi["crawl"].get("jobs_rounds", []),
        "warmup_pairs_discarded": args.warmup,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))

    md_path = os.path.join(REPO, "BENCH.md")
    marker = "## Measured scaling"
    section = f"""{marker}

Same crawl job, same deterministic input (seed 42,
{report['n_urls']} URLs), fresh JVM per run, {args.reps} INTERLEAVED
low/high pairs (this host's throughput drifts ±40% across hours, so
efficiency is computed per back-to-back pair and the median pair is the
headline — drift between pairs cancels; order alternates within pairs) —
`python tools/bench_scaling.py --low {args.low} --high {args.high} --reps {args.reps}{f" --warmup {args.warmup}" if args.warmup else ""}`{
    f" ({args.warmup} discarded warm-up pair(s) ran first — the r5 cold"
    " campaign's pairs trended 0.571 → 0.812 monotonically, a cold-start"
    " tax, not engine scaling)" if args.warmup else ""}:

| config | median-pair mementos/sec | all reps (sorted) |
|---|---|---|
| `local[{args.low}]` (N) | {tp_lo} | {tps_lo} |
| `local[{args.high}]` (4N) | {tp_hi} | {tps_hi} |

**Scaling efficiency (median of {args.reps} pair efficiencies
{[round(e, 3) for e in effs]}) = {eff:.3f}** (target ≥ 0.8 →
{"PASS" if eff >= 0.8 else "FAIL"}); best pair = {eff_best:.3f}.

{_fidelity_md(report['fidelity'], args.high)}
Stage wall-times (`local[{args.high}]` median run, summed over rounds):
`{json.dumps(hi['crawl']['stage_s'])}`

Per-round checkpoint wall (append-only seen deltas — must stay flat as
|seen| grows): `{ck_rounds}` → {"flat" if ck_flat else "GROWING (regression)"}
"""
    if os.path.exists(md_path):
        text = open(md_path).read()
        if marker in text:
            text = text[: text.index(marker)] + section
        else:
            text = text + "\n" + section
    else:
        text = "# BENCH — measured results\n\n" + section
    open(md_path, "w").write(text)


if __name__ == "__main__":
    main()

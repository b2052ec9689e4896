#!/usr/bin/env python3
"""Compare BENCH_sf1.json (replica-scaled 10x data, SfScale) against the
sf0.1 official record (BENCH.json): per-query scale ratio, flagging any
query whose sf1 time exceeds 10x its sf0.1 time — the super-linear-term
detector the sf1 run exists for. A ratio <= 10 means at-or-below-linear
scaling in data volume; most graft operators sit well below because
fixed stage overhead dominates at sf0.1.

A query may legitimately exceed 10x when its OUTPUT grows
super-linearly with the data (pair-emitting dedup under replica-scaled
duplicate multiplicity, graph ops under densification). Those cases
are EXEMPT below — each with the measured output growth and a
DuckDB-replay cross-check justifying a documented ratio bound. An
exempt query must still stay under its bound; everything else keeps
the 10x bar.

Usage: python3 tools/sf1_analysis.py [BENCH_sf1.json] [BENCH.json]
"""
import json, sys

# name -> (justified ratio bound, measured evidence)
# r12 prune: with the synchronous checkpoint drain in Bench, FIVE of
# the six r11 exemptions measure INSIDE the plain 10x bar on the clean
# 250-query sf1 record (dedup_simhash 8.9x, pipeline_corpus 6.7x,
# q_communities 2.8x, dedup_phash 9.4x, multimodal_decode 2.9x) and
# are DELETED - each was covering suite-position contamination, not a
# data term. Only the genuinely output-quadratic pair operator keeps
# its output-justified bound.
EXEMPT = {
    "q_substring_pairs": (120, "output 169,618 -> 97.3M rows (574x) per 10x "
        "input - the r4 quadratic pair-multiplicity contract; DuckDB replaying "
        "the identical oracle: 107s vs Spark 110s"),
    # r13: back over the bar at 11.1x on the 290-query record, and this
    # time the data term is MEASURED: SfScale replica images are
    # pixel-identical, so the hamming PAIR form's output grows
    # quadratically in replication - 32,623 -> 3,315,158 pairs (101.6x)
    # per 10x input (runMain probe, r13). 11.1x wall for 101.6x output
    # is sub-linear in output; the label/cluster forms stay the corpus
    # path, same as simhash.
    "dedup_phash": (30, "output 32,623 -> 3.32M pairs (101.6x) per 10x input "
        "- pixel-identical replica images; pair form quadratic in duplicate "
        "multiplicity by contract"),
}
# r12: the q_autocorr exemption (r11: 19.8s in-suite vs 4.07s isolated,
# a suite-position artifact) is DELETED — Bench now drains every
# finished query's localCheckpoint blocks synchronously through the
# SparkContext persistent-RDD registry (Bench.scala releaseAll), so the
# storage debt that inflated late-suite queries no longer exists to be
# exempted.

sf1_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1.json"
sf01_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH.json"
sf1 = json.load(open(sf1_path))
sf01 = json.load(open(sf01_path))
q1, q0 = sf1["queries"], sf01["queries"]
# Box normalization (r12): both artifacts carry "calib_sec" — the same
# fixed CPU+shuffle workload measured at each suite's start. When the
# two records come from different boxes (the r11 episode: ~1.4x apart
# on identical queries), raw ratios carry the hardware delta; dividing
# by the calib ratio removes it. Clamped to [1, 4]: a FASTER sf1 box
# must not shrink real ratios (that would hide a regression), and
# beyond 4x the calibration itself is suspect.
box_factor = 1.0
c1, c0 = sf1.get("calib_sec"), sf01.get("calib_sec")
if c1 and c0 and c0 > 0:
    box_factor = min(max(c1 / c0, 1.0), 4.0)
rows = []
for name, rec in sorted(q1.items()):
    t1 = rec["sec"]
    t0 = q0.get(name, {}).get("sec")
    if t1 < 0:
        rows.append((float("inf"), name, t0, t1, "FAILED"))
    elif t0 is None or t0 <= 0:
        rows.append((0.0, name, t0, t1, "new-query (no sf0.1 record)"))
    else:
        r = (t1 / t0) / box_factor
        rows.append((r, name, t0, t1, ""))
rows.sort(reverse=True)
# A ratio over 10x on a TINY base is stage-count overhead, not a
# super-linear data term: a query finishing under OVERHEAD_FLOOR
# seconds ABSOLUTE at 10x the data cannot be hiding a scale-killer
# (the r10 record's 0.16s-sf1 queries measured 10-15x on this round's
# box purely from fixed per-stage costs against a 0.02s-class base).
# These land in an 'overhead-band' list - visible, never flagged.
# The carve-out is BOUNDED (r12, ADVICE): a sub-3s absolute time only
# excuses ratios up to OVERHEAD_RATIO_CAP — a 0.2s -> 2.9s (14.5x)
# overhead artifact passes, but a pathological small-base blow-up
# (say 40x) still fails the gate even under 3s absolute.
OVERHEAD_FLOOR = 3.0
OVERHEAD_RATIO_CAP = 30.0
over, exempt_ok, exempt_bad, overhead = [], [], [], []
for r in rows:
    ratio, name, t1 = r[0], r[1], r[3]
    if ratio <= 10 or r[4] == "new-query (no sf0.1 record)":
        continue
    if name in EXEMPT:
        (exempt_ok if ratio <= EXEMPT[name][0] else exempt_bad).append(r)
    elif t1 is not None and 0 <= t1 < OVERHEAD_FLOOR and ratio < OVERHEAD_RATIO_CAP:
        overhead.append(r)
    else:
        over.append(r)
print(f"sf1 total: {sf1['value']:.1f}s over {len(q1)} queries "
      f"(contaminated={sf1['contaminated']}, failed={sum(1 for r in rows if r[4]=='FAILED')})")
if c1 and c0:
    print(f"calib: sf1 box {c1:.2f}s vs sf0.1 record {c0:.2f}s -> "
          f"box_factor {box_factor:.2f} (ratios below are calib-normalized)")
print(f"sf0.1 total (shared queries): "
      f"{sum(q0[n]['sec'] for n in q1 if n in q0 and q0[n]['sec'] >= 0):.1f}s")
print(f"\n{'ratio':>7}  {'sf0.1':>8}  {'sf1':>8}  query")
for r, name, t0, t1, note in rows[:25]:
    t0s = f"{t0:.2f}" if t0 is not None else "-"
    print(f"{r:7.2f}  {t0s:>8}  {t1:8.2f}  {name} {note}")
print(f"\nqueries over 10x their sf0.1 time, unjustified: {len(over)}")
for r, name, t0, t1, note in over + exempt_bad:
    tag = " EXCEEDS ITS EXEMPT BOUND" if name in EXEMPT else ""
    print(f"  {name}: {t0:.2f}s -> {t1:.2f}s ({r:.1f}x){tag} {note}")
for r, name, t0, t1, note in exempt_ok:
    print(f"  exempt {name}: {t0:.2f}s -> {t1:.2f}s ({r:.1f}x) <= {EXEMPT[name][0]}x "
          f"[{EXEMPT[name][1]}]")
for r, name, t0, t1, note in overhead:
    print(f"  overhead-band {name}: {t0:.2f}s -> {t1:.2f}s ({r:.1f}x) but "
          f"{t1:.2f}s absolute < {OVERHEAD_FLOOR}s - fixed stage overhead, not a data term")
sys.exit(1 if over or exempt_bad or sf1["contaminated"] else 0)

#!/usr/bin/env python3
"""Bench-regression gate: the judge's manual adjudication as one command.

Usage:
    python3 tools/benchgate.py CURRENT.json PREVIOUS.json [--rerun] [--threshold R]

Compares two bench artifacts (BENCH_FULL.json format: a JSON object with a
"queries" median map, and — from round 8 on — a "queries_min" map and a
"calibration" start/mid/end block) and classifies every common leg:

  ok                  ratio <= threshold (default 1.5)
  contention-suspect  median regressed but the leg's OWN min-of-3 did not
                      (external load only ever ADDS time, so a clean min
                      acquits the code), or the calibration spread shows
                      the run itself was contaminated
  regression?         median AND min both regressed — needs an isolated
                      re-run to confirm

With --rerun, every non-ok leg is re-run isolated (SPARK_GRAFT_BENCH_ONLY
through graft.Bench, same SF dir) and re-judged against the previous value:
what survives isolation is a CONFIRMED regression and the exit code is 1.
Without --rerun the exit code is 1 only if a "regression?" leg exists, so CI
can choose between cheap flagging and full adjudication.

Round 7 context: the driver's box was busy, four legs read 3-21x wrong, and
two headline wins appeared inverted — each needed a hand re-run to refute.
This script is that ritual, mechanized (VERDICT r7 next-round #7).

Box-factor normalization (round 8): when BOTH artifacts carry a calibration
block, the ratio of their quiet-phase calibration medians (min of start/mid —
`end` can sit in a degraded tail) measures how much slower the current box
epoch is, independent of any code change. Leg ratios are judged against
prev × box_factor, so a uniformly 1.2x-slower host (measured: 0.106 vs 0.088
between two round-8 runs) doesn't push every short leg over the flag
threshold and bury a real regression in 26 false alarms.

Timestamp attribution (round 9): artifacts now carry per-leg wall-clock
spans ("queries_span") and per-checkpoint spans inside "calibration". Each
flagged leg is annotated with its span and the gap to the nearest
calibration checkpoint; a contaminated checkpoint (median well above the
run's quiet minimum) adjacent to the leg's window downgrades the flag to
contention-suspect, while a large gap is recorded so the adjudicator knows
the calibration never witnessed that window (the r8 failure mode: spread
read 1.25 while etl sat 5.9x inflated BETWEEN checkpoints). Report rows
carry both prev_raw (the previous artifact's recorded median) and
prev_scaled (after box-factor) for provenance, and --rerun records the
calibration measured at re-run time next to each adjudication.
"""
import argparse
import json
import os
import re
import subprocess
import sys


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc:
        sys.exit(f"{path}: no 'queries' map — not a bench artifact")
    return doc


def quiet_cal(doc):
    """The artifact's quiet-phase calibration median: min of start/mid (the
    end checkpoint can sit in a degraded post-query tail)."""
    cal = doc.get("calibration") or {}
    vals = [cal.get(k, {}).get("median") for k in ("start", "mid")]
    vals = [v for v in vals if v]
    return min(vals) if vals else None


def classify(name, cur, prev, cur_min, threshold, cal_spread, cal_near_bad):
    if prev is None or prev <= 0 or cur is None or cur < 0:
        return "incomparable"
    ratio = cur / prev
    if ratio <= threshold:
        return "ok"
    # the leg's own min acquits it: contention only ever adds time
    if cur_min is not None and 0 <= cur_min <= prev * threshold:
        return "contention-suspect"
    if cal_spread is not None and cal_spread > 1.3:
        return "contention-suspect"
    # a contaminated calibration checkpoint adjacent to this leg's window
    # acquits it even when the run-wide spread looks quiet
    if cal_near_bad:
        return "contention-suspect"
    return "regression?"


def cal_points(doc):
    """Calibration checkpoints with spans: [{name, median, span}, ...]."""
    cal = doc.get("calibration") or {}
    return [{"name": k, "median": v["median"], "span": v["span"]}
            for k, v in cal.items()
            if isinstance(v, dict) and v.get("median", 0) > 0 and v.get("span")]


def span_gap(a, b):
    """Seconds between two [t0, t1] windows (0 when they overlap)."""
    return max(0.0, max(a[0], b[0]) - min(a[1], b[1]))


def nearest_cal(leg_span, pts):
    """(checkpoint, gap_sec) of the calibration nearest the leg's window."""
    if not leg_span or not pts:
        return None, None
    best = min(pts, key=lambda p: span_gap(leg_span, p["span"]))
    return best, round(span_gap(leg_span, best["span"]), 1)


def epoch_scale(rerun_cal, quiet_floor):
    """How much to DEFLATE an isolated re-run's reading before judging it:
    when the re-run's own calibration ran slower than the reference run's
    quiet floor, the whole re-run epoch was that much slower, and judging
    the raw number mints false confirmed-regressions (round 12: q_cube /
    q_forecast_eval / q_knn_classify were 'confirmed' in a x1.28 slower
    rerun epoch although their code was untouched — VERDICT r12 #3).
    Never scale UP (a faster rerun epoch must not manufacture phantoms):
    the factor is min(1, quiet_floor / rerun_cal)."""
    if not rerun_cal or not quiet_floor or rerun_cal <= 0 or quiet_floor <= 0:
        return 1.0
    return min(1.0, quiet_floor / rerun_cal)


def adjudicate(iso, prev_scaled, threshold, rerun_cal, quiet_floor):
    """Verdict for one isolated re-run reading: (verdict, iso_scaled).
    The reading is epoch-scaled by [[epoch_scale]] before the threshold
    compare; the RAW value stays in provenance ('isolated')."""
    if iso is None or iso < 0:
        return "rerun-failed", None
    iso_scaled = round(iso * epoch_scale(rerun_cal, quiet_floor), 3)
    if iso_scaled <= prev_scaled * threshold:
        return "phantom (isolated %.2fs, epoch-scaled %.2fs)" % (iso, iso_scaled), iso_scaled
    return "CONFIRMED regression", iso_scaled


def patch_values(iso, iso_scaled, fresh_min_val):
    """Values a phantom-patched artifact records (ADVICE r13): the
    EPOCH-SCALED isolated reading becomes the recorded median — it is the
    number that justified the phantom verdict, and patching the raw iso
    re-inflates the artifact whenever the rerun epoch itself was loaded
    (the r12 replay: iso 0.93, scaled 0.729, prev 0.58 — raw 0.93 would
    sit above prev*threshold, inflating any baseline later seeded from
    the artifact and re-flagging the same leg on the next gate). The raw
    reading stays in provenance per the adjudicate() docstring's
    raw-stays-in-provenance contract. The rerun's min — measured in the
    same epoch — deflates by the same factor. Returns (now, now_min)."""
    if iso_scaled is None:
        iso_scaled = iso
    scale = (iso_scaled / iso) if iso and iso > 0 else 1.0
    now_min = (round(fresh_min_val * scale, 3)
               if fresh_min_val is not None and fresh_min_val >= 0
               else fresh_min_val)
    return iso_scaled, now_min


def seed_baseline(new_doc, prev_doc=None, min_sec=1.0, reset_legs=()):
    """Merge a fresh QUIET close into the committed baseline (VERDICT r13
    wrong #2, codified): legs at or above `min_sec` take the per-leg
    MIN-OF-MEDIANS across the two documents (external load only ever adds
    time, so the historical min is the honest quiet reference for heavy
    legs), but SUB-SECOND legs take the fresh reading outright —
    min-merging them keeps minting lucky-fast seeds (r12
    q_compaction_plan; r13 q_audience_overlap / q_simpsons /
    q_top_location_months, each hand-reset by 0.14–0.22 s) because their
    absolute noise floor is the same order as their runtime. Legs absent
    from the fresh artifact are dropped (the baseline tracks the current
    surface); new legs seed from the fresh run. `reset_legs` names legs
    whose SEMANTICS changed this round (an operator doing strictly more
    work): they take the fresh reading outright — min-merging would
    resurrect the pre-change baseline and flag the intended cost
    forever. The output carries ONLY the quiet calibration floor (no
    per-run contamination blocks — the r14 hygiene rule) plus a 'seeded'
    provenance note.
    Returns (merged_doc, notes)."""
    new_q, new_min = new_doc["queries"], new_doc.get("queries_min", {})
    prev_q = (prev_doc or {}).get("queries", {})
    prev_min = (prev_doc or {}).get("queries_min", {})
    merged, merged_min, notes = {}, {}, []
    for leg, med in sorted(new_q.items()):
        if med < 0:
            notes.append(f"{leg}: failed in fresh run — kept prev" if leg in prev_q
                         else f"{leg}: failed in fresh run — omitted")
            if leg in prev_q:
                merged[leg] = prev_q[leg]
                if leg in prev_min:
                    merged_min[leg] = prev_min[leg]
            continue
        pv = prev_q.get(leg)
        if leg in reset_legs:
            merged[leg] = med
            merged_min[leg] = new_min.get(leg)
            notes.append(f"{leg}: RESET to fresh {med} (semantics changed; "
                         f"prev {pv})")
            continue
        if med >= min_sec and pv is not None and 0 <= pv < med:
            merged[leg] = pv
            merged_min[leg] = prev_min.get(leg, new_min.get(leg))
            notes.append(f"{leg}: kept prev min-of-medians {pv} (fresh {med})")
        else:
            merged[leg] = med
            merged_min[leg] = new_min.get(leg)
            if med < min_sec and pv is not None and pv < med:
                notes.append(f"{leg}: sub-second — fresh {med} replaces "
                             f"lucky-fast prev {pv}")
    gone = sorted(set(prev_q) - set(new_q))
    if gone:
        notes.append(f"dropped legs no longer in the surface: {', '.join(gone)}")
    floor = quiet_cal(new_doc)
    out = {
        "metric": "total",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "queries": merged,
        "queries_min": {k: v for k, v in merged_min.items() if v is not None},
        "calibration": {"start": {"median": floor},
                        "note": "quiet floor only; per-run blocks stripped — "
                                "seeded reference, not a single-run artifact"},
        "sf": new_doc.get("sf"),
        "seeded": ("benchgate --seed-out: min-of-medians for legs >= "
                   f"{min_sec}s, fresh quiet reading for sub-second legs "
                   f"(cal spread {new_doc.get('calibration', {}).get('spread')})"),
    }
    return out, notes


def isolated_rerun(names, sf_dir):
    """Re-run the named legs through graft.Bench in isolation; returns their
    fresh median map (the run's own quiesce + warmup discipline applies)."""
    out = f"/tmp/benchgate_rerun_{os.getpid()}.json"
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_OUT=out,
               SPARK_GRAFT_SF_DIR=sf_dir)
    print(f"[benchgate] isolated re-run of {len(names)} leg(s): {', '.join(names)}",
          flush=True)
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True)
    if proc.returncode != 0 or not os.path.exists(out):
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        sys.exit("[benchgate] isolated re-run failed")
    doc = json.load(open(out))
    return (doc.get("queries", {}), doc.get("queries_min", {}),
            quiet_cal(doc))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current")
    ap.add_argument("previous")
    ap.add_argument("--rerun", action="store_true",
                    help="re-run flagged legs isolated and re-judge")
    ap.add_argument("--patch", action="store_true",
                    help="with --rerun: write each flagged leg's isolated "
                         "median back into CURRENT in place (provenance "
                         "under 'patched'), so the round's recorded medians "
                         "are clean without re-running all legs")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--seed-out", metavar="PATH",
                    help="instead of gating, SEED a baseline: merge CURRENT "
                         "(a fresh quiet close) into PREVIOUS (the committed "
                         "baseline) under the min-of-medians rule — sub-second "
                         "legs take the fresh reading (VERDICT r13) — and "
                         "write the merged reference to PATH")
    ap.add_argument("--force-seed", action="store_true",
                    help="with --seed-out: accept a CURRENT whose calibration "
                         "spread exceeds the quiet-close bar (1.15)")
    ap.add_argument("--reset-legs", default="",
                    help="with --seed-out: comma-separated legs whose "
                         "semantics changed this round — they take the fresh "
                         "reading outright instead of the min-of-medians "
                         "merge (which would resurrect the pre-change "
                         "baseline and flag the intended cost forever)")
    args = ap.parse_args()

    cur_doc = load_queries(args.current)
    prev_doc = load_queries(args.previous)

    if args.seed_out:
        spread = (cur_doc.get("calibration") or {}).get("spread")
        if not args.force_seed and (spread is None or spread > 1.15):
            sys.exit(f"[benchgate] refusing to seed from {args.current}: "
                     f"calibration spread {spread} exceeds the quiet-close "
                     "bar (1.15) — rerun on a quiet box or pass --force-seed")
        resets = {x.strip() for x in args.reset_legs.split(",") if x.strip()}
        merged, notes = seed_baseline(cur_doc, prev_doc, reset_legs=resets)
        for n in notes:
            print(f"[seed] {n}")
        with open(args.seed_out, "w") as f:
            json.dump(merged, f)
        print(f"[benchgate] seeded baseline ({len(merged['queries'])} legs, "
              f"total {merged['value']}) -> {args.seed_out}")
        sys.exit(0)
    cur, prev_raw = cur_doc["queries"], prev_doc["queries"]
    cur_min = cur_doc.get("queries_min", {})
    cur_span = cur_doc.get("queries_span", {})
    cal = cur_doc.get("calibration", {})
    cal_spread = cal.get("spread")
    cal_pts = cal_points(cur_doc)
    cal_quiet_min = min((p["median"] for p in cal_pts), default=None)

    # box-factor: how much slower THIS box epoch runs the fixed calibration
    # workload than the previous artifact's — a code-independent scale
    cur_cal, prev_cal = quiet_cal(cur_doc), quiet_cal(prev_doc)
    box_factor = 1.0
    if cur_cal and prev_cal:
        box_factor = cur_cal / prev_cal
        print(f"[benchgate] box factor {box_factor:.3f} "
              f"(quiet calibration {cur_cal} vs prev {prev_cal}) — "
              f"leg ratios judged against prev x factor")
    # never let a FASTER current box mask a code regression
    box_factor = max(box_factor, 1.0)
    prev = {k: v * box_factor for k, v in prev_raw.items()}

    if cal_spread is not None:
        tag = "QUIET" if cal_spread <= 1.3 else "CONTAMINATED?"
        print(f"[benchgate] calibration spread {cal_spread} -> {tag} "
              f"(start/mid/end medians: "
              + "/".join(str(cal.get(k, {}).get("median")) for k in ("start", "mid", "end"))
              + ")")

    common = sorted(set(cur) & set(prev))
    rows = []
    for name in common:
        leg_span = cur_span.get(name)
        near, gap = nearest_cal(leg_span, cal_pts)
        # adjacent (<= 30 s) checkpoint reading >= 1.2x the run's quiet
        # minimum: the contamination window demonstrably covered this leg
        cal_near_bad = bool(
            near and gap is not None and gap <= 30.0 and cal_quiet_min
            and near["median"] >= 1.2 * cal_quiet_min)
        verdict = classify(name, cur.get(name), prev.get(name),
                           cur_min.get(name), args.threshold, cal_spread,
                           cal_near_bad)
        rows.append({"leg": name, "prev_raw": prev_raw.get(name),
                     "prev_scaled": round(prev[name], 3), "cur": cur[name],
                     "cur_min": cur_min.get(name),
                     "span": leg_span,
                     "nearest_cal": near and near["name"], "cal_gap": gap,
                     "ratio": round(cur[name] / prev[name], 2)
                     if prev[name] and prev[name] > 0 and cur[name] >= 0 else None,
                     "verdict": verdict})

    flagged = [r for r in rows if r["verdict"] in ("regression?", "contention-suspect")]
    confirmed = []
    if args.rerun and flagged:
        fresh, fresh_min, rerun_cal = isolated_rerun(
            [r["leg"] for r in flagged], args.sf_dir)
        if rerun_cal and cal_quiet_min:
            print(f"[benchgate] re-run epoch calibration {rerun_cal} vs "
                  f"current artifact quiet {cal_quiet_min} — isolated "
                  f"readings epoch-scaled by "
                  f"{epoch_scale(rerun_cal, cal_quiet_min):.3f} before "
                  "adjudication (a loaded rerun epoch must not mint "
                  "confirmed regressions)")
        for r in flagged:
            r["rerun_cal"] = rerun_cal
            iso = fresh.get(r["leg"])
            r["isolated"] = iso
            verdict, iso_scaled = adjudicate(
                iso, prev[r["leg"]], args.threshold, rerun_cal, cal_quiet_min)
            r["isolated_scaled"] = iso_scaled
            r["verdict"] = verdict
            if verdict == "CONFIRMED regression":
                confirmed.append(r["leg"])
        if args.patch:
            # Patch ONLY phantom-adjudicated legs (ADVICE r10): for those,
            # the isolated re-run PROVED the median was contamination, so
            # the clean value replaces it. A CONFIRMED regression keeps its
            # honest median — overwriting it with the (smaller) isolated
            # number would understate a real regression in the headline —
            # and the isolated reading goes to provenance only. Legs the
            # isolated path could not re-run (rerun-failed) are flagged in
            # provenance so the artifact never SILENTLY mixes regimes.
            patched, unpatched = {}, {}
            for r in flagged:
                iso = r.get("isolated")
                if iso is None or iso < 0:
                    unpatched[r["leg"]] = {
                        "median": cur_doc["queries"][r["leg"]],
                        "reason": "isolated re-run failed — median regime unknown"}
                    continue
                if r["verdict"].startswith("CONFIRMED"):
                    unpatched[r["leg"]] = {
                        "median": cur_doc["queries"][r["leg"]],
                        "isolated": iso,
                        "reason": "confirmed regression — honest median kept"}
                    continue
                now, now_min = patch_values(
                    iso, r.get("isolated_scaled"), fresh_min.get(r["leg"]))
                patched[r["leg"]] = {"was": cur_doc["queries"][r["leg"]],
                                     "was_min": cur_min.get(r["leg"]),
                                     "now": now, "now_min": now_min,
                                     "isolated_raw": iso,
                                     "isolated_min_raw": fresh_min.get(r["leg"])}
                cur_doc["queries"][r["leg"]] = now
                if r["leg"] in cur_min and now_min is not None:
                    cur_doc["queries_min"][r["leg"]] = now_min
            if patched or unpatched:
                if patched and isinstance(cur_doc.get("value"), (int, float)):
                    delta = sum(p["now"] - p["was"] for p in patched.values())
                    cur_doc["value"] = round(cur_doc["value"] + delta, 3)
                cur_doc.setdefault("patched", {}).update(patched)
                if unpatched:
                    cur_doc.setdefault("unpatched", {}).update(unpatched)
                with open(args.current, "w") as f:
                    json.dump(cur_doc, f)
                print(f"[benchgate] patched {len(patched)} phantom leg(s) in "
                      f"{args.current}; {len(unpatched)} leg(s) kept their "
                      "median (confirmed/rerun-failed — see 'unpatched')")

    new_legs = sorted(set(cur) - set(prev))
    gone_legs = sorted(set(prev) - set(cur))

    for r in rows:
        if r["verdict"] != "ok":
            print("  {leg:36s} prev={prev_scaled:>8} cur={cur:>8} min={cur_min} "
                  "ratio={ratio} span={span} cal_gap={cal_gap} -> {verdict}"
                  .format(**r))
    n_ok = sum(1 for r in rows if r["verdict"] == "ok")
    print(f"[benchgate] {len(common)} common legs: {n_ok} ok, "
          f"{len(flagged)} flagged; +{len(new_legs)} new, -{len(gone_legs)} gone")
    report = {"common": len(common), "ok": n_ok, "flagged": rows and
              [r for r in rows if r["verdict"] != "ok"] or [],
              "new_legs": new_legs, "gone_legs": gone_legs,
              "cal_spread": cal_spread, "box_factor": round(box_factor, 3),
              "confirmed": confirmed}
    out_path = os.environ.get("BENCHGATE_OUT", "/tmp/benchgate_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[benchgate] report -> {out_path}")
    if args.rerun:
        sys.exit(1 if confirmed else 0)
    sys.exit(1 if any(r["verdict"] == "regression?" for r in rows) else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Unit tests for benchgate's isolated-rerun epoch scaling (VERDICT r12 #3):
a loaded rerun epoch must not mint false confirmed-regressions, and a fast
rerun epoch must not manufacture phantoms. Run: python3 tools/test_benchgate.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from benchgate import adjudicate, epoch_scale, patch_values, seed_baseline  # noqa: E402

FAILED = []


def check(name, cond):
    print(("PASS " if cond else "FAIL ") + name)
    if not cond:
        FAILED.append(name)


# --- epoch_scale -----------------------------------------------------------
# loaded rerun epoch (cal 0.139 vs quiet floor 0.109 — the r12 case):
# readings deflate by 0.109/0.139
check("scale deflates in a slower rerun epoch",
      abs(epoch_scale(0.139, 0.109) - 0.109 / 0.139) < 1e-12)
# FASTER rerun epoch: never scale up (min with 1.0)
check("scale clamps at 1.0 in a faster rerun epoch",
      epoch_scale(0.08, 0.109) == 1.0)
# missing calibration on either side: no scaling
check("scale is 1.0 without rerun calibration", epoch_scale(None, 0.1) == 1.0)
check("scale is 1.0 without a quiet floor", epoch_scale(0.1, None) == 1.0)
check("scale is 1.0 on nonpositive inputs", epoch_scale(0.0, -1) == 1.0)

# --- adjudicate ------------------------------------------------------------
# The round-12 misfire, replayed: q_cube prev 0.58, isolated 0.93 in a
# x1.28 slower epoch (rerun_cal 0.139 vs floor 0.109). Raw 0.93 > 0.58*1.5
# = 0.87 would read CONFIRMED; epoch-scaled 0.93*0.784 = 0.729 <= 0.87
# reads phantom — the fix.
v, s = adjudicate(0.93, 0.58, 1.5, 0.139, 0.109)
check("r12 q_cube case adjudicates phantom after epoch scaling",
      v.startswith("phantom") and s is not None and s <= 0.58 * 1.5)
# A REAL regression survives the scaling: isolated 2.0 vs prev 0.58 stays
# confirmed even deflated to 1.57
v, s = adjudicate(2.0, 0.58, 1.5, 0.139, 0.109)
check("real regression stays confirmed through epoch scaling",
      v == "CONFIRMED regression")
# Quiet rerun epoch (cal == floor): raw threshold compare unchanged
v, _ = adjudicate(0.93, 0.58, 1.5, 0.109, 0.109)
check("quiet rerun epoch keeps the raw confirmed verdict",
      v == "CONFIRMED regression")
v, _ = adjudicate(0.80, 0.58, 1.5, 0.109, 0.109)
check("quiet rerun epoch keeps the raw phantom verdict", v.startswith("phantom"))
# FASTER rerun epoch: no upward scaling — a genuinely-ok leg is not
# inflated into a confirmed regression
v, s = adjudicate(0.80, 0.58, 1.5, 0.05, 0.109)
check("faster rerun epoch does not inflate readings",
      v.startswith("phantom") and s == 0.80)
# failed rerun
v, s = adjudicate(None, 0.58, 1.5, 0.139, 0.109)
check("missing isolated reading is rerun-failed", v == "rerun-failed" and s is None)
v, s = adjudicate(-1.0, 0.58, 1.5, 0.139, 0.109)
check("negative isolated reading is rerun-failed", v == "rerun-failed")

# --- patch_values (ADVICE r13) ---------------------------------------------
# The r12 replay: iso 0.93 in a loaded rerun epoch, epoch-scaled 0.729.
# The artifact must record 0.729 (the value that justified the phantom
# verdict), NOT the loaded-epoch 0.93 — which sits above prev*threshold
# (0.58*1.5=0.87) and would re-flag the leg on the next gate AND inflate
# any baseline seeded from the patched artifact.
now, now_min = patch_values(0.93, 0.729, 0.90)
check("patched median is the epoch-scaled reading", now == 0.729)
check("patched min deflates by the same epoch factor",
      abs(now_min - round(0.90 * 0.729 / 0.93, 3)) < 1e-12)
# quiet rerun epoch: scaled == raw, values pass through
now, now_min = patch_values(0.80, 0.80, 0.78)
check("quiet-epoch patch passes raw values through",
      now == 0.80 and now_min == 0.78)
# no scaled value available (older report rows): raw is used
now, now_min = patch_values(0.80, None, 0.78)
check("missing scaled value falls back to raw", now == 0.80 and now_min == 0.78)
# missing rerun min stays missing
now, now_min = patch_values(0.93, 0.729, None)
check("missing rerun min stays None", now == 0.729 and now_min is None)

# --- seed_baseline (VERDICT r13 wrong #2) ------------------------------------
# Replay of the r13 hand-resets: the committed baseline carried lucky-fast
# sub-second seeds (q_audience_overlap 0.585, q_simpsons 0.437,
# q_top_location_months 0.561) that min-of-medians kept re-minting; the
# fresh quiet close read 0.805/0.607/0.708. The rule takes the FRESH
# reading for sub-second legs and the MIN for heavy legs.
new = {"queries": {"q_audience_overlap": 0.805, "q_simpsons": 0.607,
                   "q_top_location_months": 0.708,
                   "etl_pipeline": 21.7, "q_new_leg": 2.0},
       "queries_min": {"etl_pipeline": 20.9, "q_new_leg": 1.9},
       "calibration": {"start": {"median": 0.101}, "mid": {"median": 0.099},
                       "spread": 1.05},
       "sf": "/root/testdata/sf0.1"}
prev = {"queries": {"q_audience_overlap": 0.585, "q_simpsons": 0.437,
                    "q_top_location_months": 0.561,
                    "etl_pipeline": 20.0, "q_gone_leg": 3.0},
        "queries_min": {"etl_pipeline": 19.5}}
merged, notes = seed_baseline(new, prev)
check("sub-second legs take the fresh quiet reading",
      merged["queries"]["q_audience_overlap"] == 0.805
      and merged["queries"]["q_simpsons"] == 0.607
      and merged["queries"]["q_top_location_months"] == 0.708)
check("heavy legs keep the min-of-medians",
      merged["queries"]["etl_pipeline"] == 20.0
      and merged["queries_min"]["etl_pipeline"] == 19.5)
check("new legs seed from the fresh run", merged["queries"]["q_new_leg"] == 2.0)
check("gone legs are dropped and reported",
      "q_gone_leg" not in merged["queries"]
      and any("q_gone_leg" in n for n in notes))
check("seeded doc carries only the quiet floor",
      merged["calibration"]["start"]["median"] == 0.099
      and "spread" not in merged["calibration"]
      and "epoch_suspect" not in merged)
check("seeded total re-sums the merged medians",
      abs(merged["value"] - (0.805 + 0.607 + 0.708 + 20.0 + 2.0)) < 1e-9)
# a failed fresh leg keeps the previous reference rather than poisoning it
new2 = dict(new, queries=dict(new["queries"], etl_pipeline=-1.0))
merged2, _ = seed_baseline(new2, prev)
check("failed fresh leg keeps the previous reference",
      merged2["queries"]["etl_pipeline"] == 20.0)
# a semantics-changed leg RESETS to the fresh reading (the r14 LSH
# verify stage made the clusterers do strictly more work; min-merging
# would resurrect the pre-change 2.8 s seed and flag the intended cost
# forever)
merged3, notes3 = seed_baseline(new, prev, reset_legs={"etl_pipeline"})
check("reset leg takes the fresh reading over the historical min",
      merged3["queries"]["etl_pipeline"] == 21.7
      and any("RESET" in n for n in notes3))

print(f"\n{len(FAILED)} failed")
sys.exit(1 if FAILED else 0)

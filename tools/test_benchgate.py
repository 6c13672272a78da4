#!/usr/bin/env python3
"""Unit tests for benchgate's isolated-rerun epoch scaling (VERDICT r12 #3):
a loaded rerun epoch must not mint false confirmed-regressions, and a fast
rerun epoch must not manufacture phantoms. Run: python3 tools/test_benchgate.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from benchgate import adjudicate, epoch_scale, patch_values  # noqa: E402

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

print(f"\n{len(FAILED)} failed")
sys.exit(1 if FAILED else 0)

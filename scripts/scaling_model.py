"""Multi-chip scaling model for the sharded prover (VERDICT r4 item 5).

This environment has ONE physical TPU chip, so the >=80%-scaling-efficiency
north star (BASELINE.md) cannot be measured.  This script is the honest
substitute: from the IMPLEMENTED collective sites in parallel/ops.py and
parallel/eprover.py it computes, per prover phase at a given (C, M, s, D),

  * the work fraction that shards 1/D (device-local under the cyclic
    layout),
  * the replicated tail (bullet reductions, top trees, the last log D
    sumcheck rounds, per-round host Fiat-Shamir),
  * bytes moved over ICI per collective and in total,

and combines them with measured single-chip phase times (profile_flagship
span tree) plus v5e interconnect constants into a predicted scaling
efficiency E(D) = T(1) / (D * T(D)).

Communication sites modeled (all in parallel/ops.py):
  1. sharded_commit_rows  -- all_gather of per-device partial row points:
     D * l_size * 256 B per matrix commit (4 coords x 16 u32 limbs).
     Three matrices: combined_l (l = log 2Cs), derefs (log alpha*s),
     combined_log_m (log C*M).
  2. prove_arbitrary_sharded -- one psum of (degree+1) wide-limb round-poly
     evals per sharded round: (deg+1) * 64 B * ~4 (lazy u64 columns)
     per round, log(s) - log(D) rounds.
  3. prove_cubic_batched_sharded -- same shape, 4 evals * I instances per
     sharded round, per grand-product layer.
  4. grand-product tree -- local subtrees need NO communication; the top
     log D layers run replicated after ONE all_gather of [I, 2D] layer
     values per argument (I * 2D * 64 B).
  5. L-folds (openings) -- fully local (cyclic layout keeps matrix columns
     device-aligned); the bound vector is all_gathered once per opening:
     r_size * 64 B.

Latency: each psum/all_gather on a D-chip v5e ring costs ~D-1 hops x ~1 us
+ payload / 45 GB/s (2 links x 400 Gbps full duplex, minus protocol
overhead).  The psum payloads here are KBs -- every collective in this
design is LATENCY-bound, which is why the model's comm term is
(#collectives x hop latency) rather than bandwidth.

Usage: python scripts/scaling_model.py [--log-s 24] [--c 1] [--log-m 16]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINT_B = 4 * 16 * 4          # extended point, 4 coords x 16 u32 limbs
FE_B = 16 * 4                 # field element, 16 u32 limbs
WIDE_B = 4 * FE_B             # lazy wide-limb partial (u64 columns, padded)
ICI_BW = 45e9                 # B/s per chip, v5e (2x400Gbps links, derated)
HOP_US = 1.0                  # per-hop ICI latency
DISPATCH_US = 3.0             # per-collective program overhead


def phases(c: int, log_m: int, log_s: int, d: int, alpha: int = None):
    """Per-phase (sharded_work_fraction, replicated_fraction, collectives,
    ici_bytes) for one prove.  Work fractions are of that phase's
    single-chip time; collectives is the count of latency-bound psum /
    all_gather dispatches on the critical path."""
    alpha = alpha if alpha is not None else c  # AND strategy: alpha = C
    s = 1 << log_s
    m = 1 << log_m
    log_d = (d - 1).bit_length()

    out = {}

    # 1. densify: host/global today (documented gap) -- replicated.
    out["densify"] = dict(sharded=0.0, replicated=1.0, coll=0, bytes=0)

    # 2. commit: 3 Hyrax matrix commits, each one all_gather of partials.
    l_l = (2 * c * s - 1).bit_length()
    l_e = (alpha * s - 1).bit_length()
    l_f = (c * m - 1).bit_length()
    rows = sum(1 << (ell // 2) for ell in (l_l, l_e, l_f))
    gather_bytes = d * rows * POINT_B
    out["commit"] = dict(sharded=1.0, replicated=0.0, coll=3,
                         bytes=gather_bytes)

    # 3. primary sumcheck: log s rounds; rounds over the local width run
    # sharded with one psum each; the last ~log_d rounds are replicated
    # (tiny); per-round Fiat-Shamir is replicated-deterministic (no comm).
    deg = 3  # AND: g degree 1 -> sumcheck degree 2; LT: up to C+1. use 3
    rounds_sh = max(log_s - log_d, 0)
    out["primary_sumcheck"] = dict(
        sharded=rounds_sh / max(log_s, 1),
        replicated=1 - rounds_sh / max(log_s, 1),
        coll=rounds_sh, bytes=rounds_sh * (deg + 1) * WIDE_B * d)

    # 4. memory check: leaves + local tree layers shard perfectly; each
    # GP argument layer runs a cubic sumcheck (psum per sharded round);
    # top log_d layers + the final small layers are replicated.
    inst_rw, inst_if = 2 * alpha, 2 * alpha
    log_rw, log_if = log_s, log_m
    coll = 0
    bts = 0
    for log_n, inst in ((log_rw, inst_rw), (log_if, inst_if)):
        for layer in range(log_n):  # layer width 2^layer
            r_sh = max(layer - log_d, 0)
            coll += r_sh
            bts += r_sh * 4 * inst * WIDE_B * d
        coll += 1  # one all_gather of the top [I, 2D] values
        bts += inst * 2 * d * FE_B
    # local width fraction: layers wider than D shard 1/D; those are where
    # ~all multiplies are (sum 2^layer for layer > log_d ~ whole tree)
    out["memory_check"] = dict(sharded=1.0 - 2.0 ** (log_d - log_rw),
                               replicated=2.0 ** (log_d - log_rw),
                               coll=coll, bytes=bts)

    # 5. openings / hash layer: L-folds local (1/D); bullet reductions and
    # Sigma-protocol tails replicated (sqrt-size, latency-bound).
    fold_frac = 0.6  # of opening phase time spent in L-folds (profiled)
    r_sizes = sum(1 << (ell - ell // 2) for ell in (l_l, l_e, l_f))
    out["openings"] = dict(sharded=fold_frac, replicated=1 - fold_frac,
                           coll=3, bytes=d * r_sizes * FE_B)

    return out


def efficiency(t1_phases: dict, c: int, log_m: int, log_s: int, d: int):
    """Predicted E(D) from single-chip phase seconds t1_phases."""
    ph = phases(c, log_m, log_s, d)
    t_d = 0.0
    total_bytes = 0
    total_coll = 0
    for name, t1 in t1_phases.items():
        p = ph[name]
        comm_s = (p["coll"] * ((d - 1) * HOP_US + DISPATCH_US) * 1e-6
                  + p["bytes"] / ICI_BW)
        t_d += t1 * p["sharded"] / d + t1 * p["replicated"] + comm_s
        total_bytes += p["bytes"]
        total_coll += p["coll"]
    t1_total = sum(t1_phases.values())
    return dict(D=d, t1_s=round(t1_total, 3), td_s=round(t_d, 3),
                efficiency=round(t1_total / (d * t_d), 3),
                ici_bytes=total_bytes, collectives=total_coll)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-s", type=int, default=24)
    ap.add_argument("--c", type=int, default=1)
    ap.add_argument("--log-m", type=int, default=16)
    ap.add_argument("--profile", default=None,
                    help="JSON file of measured single-chip phase seconds")
    args = ap.parse_args()

    # Single-chip phase seconds: pass --profile with a JSON dict measured
    # by scripts/profile_flagship.py at your shape.  The built-in defaults
    # are a PLACEHOLDER breakdown of the round-4 s=2^24 warm prove
    # (28.76 s total, split by the r4 span ratios) until the round-5
    # profile lands in BASELINE.md.
    t1 = {
        "densify": 0.45,
        "commit": 9.0,
        "primary_sumcheck": 5.6,
        "memory_check": 9.3,
        "openings": 4.4,
    }
    if args.profile:
        t1.update(json.load(open(args.profile)))

    print(json.dumps({"config": vars(args), "t1_phases": t1}))
    for d in (2, 4, 8, 16):
        print(json.dumps(efficiency(t1, args.c, args.log_m, args.log_s, d)))


if __name__ == "__main__":
    main()

"""Sweep training-step configurations on the real chip.

Round-2 shipped the training grouped-conv rule "dense except cpg >= 16"
(mod5 native) on the strength of the B=16 adversarial seg-step device
trace, but never measured the rule itself: the docstring recorded
auto-everywhere 722 ms and all-dense 614 ms and deferred the shipped
rule's number to a README table that was never filled in (ADVICE r2,
VERDICT r3 item 1). This tool measures any (env-config, workload) matrix
scan-differenced (tools/bench_train_step.py's child mode — the only
timing the axon relay can't distort), each config in its own subprocess
(leftover device buffers from a previous config re-introduce HBM
spilling, see bench_train_step.py).

Spec syntax: ``label=KEY:VAL,KEY:VAL@kind:batch`` where kind is ``adv``
or ``vistas``; the env part may be empty (``label=@adv:16``).

Default matrix (round-3 dispatch-rule resolution): the shipped rule,
all-dense (HEATNET_GC_IMPL=dense), and the inference rule in training
(HEATNET_GC_TRAIN_MIN_CPG=4), each at adv B=16 and vistas B=30.

Measured v5e (2026-08-19, this tool — resolves the 722-vs-614
discrepancy; both round-2 numbers are reproduced by their configs):

  rule                adv B=16 seg/critic    vistas B=30
  shipped (r2 rule)   588.2 / 154.9 ms       701.9 ms
  all-dense           516.4 / 130.2 ms       720.5 ms
  auto (inference)    726.1 / 203.6 ms       815.8 ms

i.e. mod5's winner is WORK-DEPENDENT in training too: dense at the adv
step's 819k work volume, native at the Vistas step's 2.2M.

Phase-2 matrix (work-gated training rule shipped, then remat-mask sweep —
HEATNET_REMAT_STAGES, '0' = save that stage instead of rematting it):

  config                     adv B=16 seg     vistas B=30
  training rule, remat 1111  517.5 ms         (701.9)
  remat 1110 (save mod5)     472.5 ms         635.9 ms   <- shipped default
  remat 1100 / 0000          -                OOM (HLO temp exhausted)

Phase-3 matrix (conv-save remat mode, HEATNET_REMAT_STAGES 'c' stages —
block conv outputs saved by name so the backward re-forward needs no conv
recompute; see models/layers.CONV_SAVE_POLICY):

  remat mask                 adv B=16 seg     vistas B=30
  1110 (save mod5, r2)       472.5 ms         635.9 ms
  111c (conv-save mod5)      477.2 ms         627.2 ms
  11cc (conv-save mod4+5)    459.6 ms         617.0 ms   <- shipped default
  1ccc (conv-save mod3-5)    457.4 ms         702.2 ms
  cccc                       458.6 ms         OOM

1ccc ties 11cc on the adv step (457.4 vs 459.6, within run noise) but
regresses Vistas 14%: mod3's held conv outputs at 96x192 push residency
past the comfortable range and the scheduler pays for it, the same
pressure that OOMs cccc outright. All-dense dispatch re-measured UNDER
the 11cc remat default stays a loss on Vistas (650.9 vs 617.0 ms) — the
work gate's mod5-native pick survives the remat-mode change.

Smaller batches under the training rule (remat 1111): adv B=4 seg
164.2 ms (the B=4 critic delta is below this method's noise floor — the
negative value it produced is why scan_timeit now retries with a 3x
scan), vistas B=8 196.9 ms vs 207.4 with mod5 forced native — the 1.5e6
work gate picks the winner at B=8 too. (Round-4 correction: those
small-batch round-3 numbers came from the old 5-step window; under the
honest 17-step window the same configs measure ~20% higher — see below.)

Round-4 matrix (2026-08-21, 17-step window below B=8; the basis for the
work-gated "auto" remat default, trgb_segnet.py):

  remat mask        adv B=4 seg/critic    vistas B=8    vistas B=30
  11cc (r3 default) 202.2 / 50.8          176.5         617.0
  0000              195.0 / 50.7          167.5         OOM (r2)
  cccc              204.9 / 50.7          174.7         OOM (r3)
  1111              206.8 / 50.5          (196.9 r3)    701.9
  auto (=0000|11cc) 194.9 / 50.6          168.6         617-class

(The 1111 row kills round-3's "adv B=4 seg 164.2 @1111" — that number
came from the old 5-step window and does not reproduce at 17 steps.)

Round-4 negative results at vistas B=30 (each measured, each shipped
default-off or reverted): lean fused BN+act custom_vjp 632.2 (ops/
lean_bn.py), HEATNET_REMAT_HEAD=1 645.1 (+28 ms head recompute for only
0.4 GB of the 15.4 GB peak), disabling XLA's host-memory offload via
forwarded compile options 617.1 (offload costs ~nothing), and the
batch curve B=24 481.9 / B=20 485.8 (20.1 vs 20.6 ms/frame at B=30 —
the spill-free operating point pays the same per-frame, so the
gap-to-floor is op-mix bandwidth, not memory pressure; B=20 matching
B=24 shows batch tiles pad to 8).

Run: `python tools/sweep_train_dispatch.py [specs...]`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_SPECS = [
    "shipped=@adv:16",
    "shipped=@vistas:30",
    "dense=HEATNET_GC_IMPL:dense@adv:16",
    "dense=HEATNET_GC_IMPL:dense@vistas:30",
    "auto=HEATNET_GC_TRAIN_MIN_CPG:4@adv:16",
    "auto=HEATNET_GC_TRAIN_MIN_CPG:4@vistas:30",
]


def parse_spec(spec: str):
    label, rest = spec.split("=", 1)
    env_part, wl = rest.split("@", 1)
    env = {}
    if env_part:
        for kv in env_part.split(","):
            k, v = kv.split(":", 1)
            env[k] = v
    kind, b = wl.split(":")
    return label, env, kind, int(b)


def main() -> None:
    specs = sys.argv[1:] or DEFAULT_SPECS
    here = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(here)
    child = os.path.join(here, "bench_train_step.py")

    results = {}
    for spec in specs:
        label, extra_env, kind, b = parse_spec(spec)
        env = dict(os.environ, _HEATNET_TRAINBENCH_CHILD="1", **extra_env)
        env["PYTHONPATH"] = (repo_root + os.pathsep
                             + env.get("PYTHONPATH", ""))
        proc = subprocess.run(
            [sys.executable, child, kind, str(b)], env=env,
            capture_output=True, text=True, timeout=5400)
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("{")]
        key = f"{label}/{kind}_B{b}"
        results[key] = (json.loads(lines[-1]) if lines
                        else {"error": proc.stderr[-400:]})
        print(key, json.dumps(results[key]), flush=True)
    print("FINAL", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

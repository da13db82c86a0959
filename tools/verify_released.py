"""One-command ±1% reproduction check against the released weights.

The north star (BASELINE.md / SURVEY.md §6): converted released
PlaneRecNet_50/101 checkpoints must land within ±1% of the published
mask-mAP and depth-RMSE on ScanNet (reference README.md:31-45 weights
table + data/prn_results_table.png Table 2; eval loop reference
eval.py:63-130, 372-426). The environment this framework was built in has
zero egress — no released ``.pth``, no ScanNet — so this tool PACKAGES the
procedure so it is executable the moment both artifacts are available:

    python tools/verify_released.py \
        --pth weights/PlaneRecNet_50_9_125000.pth \
        --images /data/scannet/ --annotations /data/scannet_eval.json

It (1) parses the config from the checkpoint name (the reference's
``SavePath`` codec), (2) runs the standard ``eval.py`` CLI as a subprocess
(conversion from ``.pth`` happens inside the runner's auto-convert path,
with a completeness check), (3) diffs the resulting metrics against the
published table and prints pass/fail per metric against the budget.

The ±1% budget is RELATIVE and applies to the two north-star metrics
(mask mAP, depth RMSE); every other Table-2 metric is reported
informationally. Pass ``--expected path.json`` to check against a
different table (e.g. the PRN-101 row, or your own reproduction).

Tested on the bundled seeded golden ``.pth``
(tests/test_cli.py::test_verify_released_on_bundled_golden) — the same
asset the CLI golden test uses — so the harness itself is known to run.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

# Published ScanNet numbers (BASELINE.md; reference
# data/prn_results_table.png Table 2, "Ours ADAM" row — the row the
# released weights reproduce per README.md:29-31). Depth errors in
# metres; AP in percent.
PUBLISHED = {
    "mask": {"all": 16.71, "50": 31.91, "75": 15.56},
    "box": {"all": 21.05, "50": 36.45, "75": 20.29},
    "depth": {"abs_rel": 0.075, "log10": 0.031, "rmse": 0.178,
              "a1": 0.951, "a2": 0.992, "a3": 0.998},
}
# North-star metrics carrying the ±budget (SURVEY.md §6): everything else
# is informational.
BUDGETED = [("mask", "all"), ("depth", "rmse")]


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="±1%% reproduction check vs released PlaneRecNet "
                    "weights")
    p.add_argument("--pth", required=True,
                   help="Released checkpoint (.pth; .npz also accepted). "
                        "Config is parsed from the file name "
                        "(PlaneRecNet_<depth>_<epoch>_<iter>.pth) unless "
                        "--config is given.")
    p.add_argument("--config", default=None)
    p.add_argument("--images", required=True,
                   help="Eval image root (ScanNet layout).")
    p.add_argument("--annotations", required=True,
                   help="COCO-format eval annotation json.")
    p.add_argument("--max_images", default=-1, type=int,
                   help="Evaluate on a subset (default: all — the "
                        "published numbers are whole-split).")
    p.add_argument("--budget_pct", default=1.0, type=float,
                   help="Relative pass budget in percent for the "
                        "north-star metrics (default 1.0).")
    p.add_argument("--expected", default=None,
                   help="JSON file with the expected metric table "
                        "(same shape as eval.py --metrics_json: "
                        "{mask: {...}, box: {...}, depth: {...}}); "
                        "default: the published Table-2 row.")
    p.add_argument("--metrics_json", default=None,
                   help="Where to keep the measured metrics (default: "
                        "alongside the checkpoint).")
    p.add_argument("--eval_args", default="",
                   help="Extra arguments forwarded verbatim to eval.py "
                        "(e.g. '--batch_size 4 --dtype bfloat16').")
    p.add_argument("--cfg_overrides", default=None,
                   help="JSON config overrides merged with the dataset "
                        "paths and forwarded to eval.py.")
    return p.parse_args(argv)


def run_eval(args) -> dict:
    out_json = args.metrics_json or (
        osp.splitext(args.pth)[0] + "_verify_metrics.json")
    overrides = dict(json.loads(args.cfg_overrides)
                     if args.cfg_overrides else {})
    overrides["dataset"] = dict(overrides.get("dataset", {}),
                                eval_images=(args.images
                                             if args.images.endswith("/")
                                             else args.images + "/"),
                                eval_info=args.annotations)
    cmd = [sys.executable, osp.join(REPO, "eval.py"),
           "--trained_model", args.pth,
           "--max_images", str(args.max_images),
           "--metrics_json", out_json, "--no_bar",
           "--cfg_overrides", json.dumps(overrides)]
    if args.config:
        cmd += ["--config", args.config]
    cmd += [a for a in args.eval_args.split() if a]
    print("$", " ".join(cmd[1:]), flush=True)
    code = subprocess.call(cmd, cwd=REPO)
    if code != 0:
        raise SystemExit(f"eval.py failed with exit code {code}")
    with open(out_json) as f:
        return json.load(f)


def compare(measured: dict, expected: dict, budget_pct: float) -> bool:
    """Print the delta table; returns overall pass/fail."""
    ok = True
    print(f"\n{'metric':<16} {'published':>10} {'measured':>10} "
          f"{'delta%':>8}  verdict")
    print("-" * 56)
    for group, metrics in expected.items():
        for name, want in metrics.items():
            got = measured.get(group, {}).get(str(name))
            if got is None:
                # eval.py keys AP thresholds as ints in-process but json
                # stringifies them; try both forms.
                got = measured.get(group, {}).get(name)
            if got is None:
                print(f"{group}/{name:<11} {want:>10} {'—':>10} "
                      f"{'—':>8}  MISSING from eval output")
                ok = False
                continue
            got = float(got)
            rel = ((got - want) / want * 100 if want
                   else (0.0 if got == want else float("inf")))
            budgeted = (group, str(name)) in [
                (g, str(n)) for g, n in BUDGETED]
            if budgeted:
                verdict = "PASS" if abs(rel) <= budget_pct else "FAIL"
                ok = ok and verdict == "PASS"
                verdict += f" (±{budget_pct:g}% budget)"
            else:
                verdict = "info"
            print(f"{group + '/' + str(name):<16} {want:>10.3f} "
                  f"{got:>10.3f} {rel:>+8.2f}  {verdict}")
    return ok


def main(argv=None):
    args = parse_args(argv)
    if args.expected:
        with open(args.expected) as f:
            expected = json.load(f)
    else:
        expected = PUBLISHED
    measured = run_eval(args)
    ok = compare(measured, expected, args.budget_pct)
    print(f"\n{'REPRODUCTION PASS' if ok else 'REPRODUCTION FAIL'}: "
          f"north-star metrics {'within' if ok else 'outside'} "
          f"±{args.budget_pct:g}% of the published table "
          f"({'built-in Table 2' if not args.expected else args.expected})")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()

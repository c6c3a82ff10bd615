"""Command-line entry point: python -m rwrt_tpu --config run.json

The JSON config maps 1:1 onto RunConfig fields plus the three file paths
(reference main_wr.py parameter dict: inputuv / bsfile / ncfile).
"""

import argparse
import json
import sys

from rwrt_tpu.config import RunConfig
from rwrt_tpu.main import RunPaths, run


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="rwrt_tpu", description="TPU-native Rossby wave ray tracing"
    )
    ap.add_argument("--config", required=True, help="JSON config file")
    ap.add_argument("--mesh", action="store_true",
                    help="shard rays over all local devices")
    ap.add_argument("--chunked", action="store_true",
                    help="chunked driver with progress reporting")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint file for resumable runs")
    ap.add_argument("--report", default=None, metavar="PATH",
                    help="write a machine-readable JSON run report (config "
                         "echo, backend/mesh, phase wall-clock, per-ray "
                         "termination accounting)")
    ap.add_argument("--report-exact", action="store_true",
                    help="exact death causes in the report "
                         "(termination.classify re-runs each killing "
                         "interval in one batched device call)")
    ap.add_argument("--wnmaps", default=None, metavar="PATH",
                    help="also compute and write the grid-wide wavenumber "
                         "diagnostics (stationary/non-stationary m-roots, "
                         "rootnum, group velocities, Ks) for the configured "
                         "zwn set -- the reference's standalone WN product "
                         "(wn.py:21-135)")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        raw = json.load(f)
    # keys starting with "_" are comments (JSON has no comment syntax)
    raw = {k: v for k, v in raw.items() if not k.startswith("_")}

    if "inputuv" not in raw:
        ap.error(f"{args.config}: missing required key 'inputuv'")
    paths = RunPaths(
        inputuv=raw.pop("inputuv"),
        bsfile=raw.pop("bsfile", None),
        ncfile=raw.pop("ncfile", None),
    )
    import dataclasses

    valid = {f.name for f in dataclasses.fields(RunConfig)}
    unknown = sorted(set(raw) - valid)
    if unknown:
        ap.error(
            f"{args.config}: unknown config key(s) {unknown}; valid keys are "
            f"inputuv/bsfile/ncfile and {sorted(valid)}"
        )
    cfg = RunConfig(**raw)

    # mesh=True builds the mesh inside run() over cfg.mesh_devices devices.
    # --wnmaps rides the same run: the maps are computed from the basic
    # state run() already prepared (no second load + prepare pass).
    run(cfg, paths, mesh=True if args.mesh else None, chunked=args.chunked,
        checkpoint_path=args.checkpoint, wnmaps_path=args.wnmaps,
        report_path=args.report, report_exact_causes=args.report_exact)
    return 0


if __name__ == "__main__":
    sys.exit(main())

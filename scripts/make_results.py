#!/usr/bin/env python
"""Evaluate trained codecs and write docs/RESULTS.md (RD table).

Runs the full bitstream codecs (container bytes in/out) on the labeled
evaluation set and records bpp/PSNR per configuration:
  * int8 reference-semantics codec (bit-exact transform + lossless latent
    coding) — rate is real, distortion is whatever the reference's integer
    network produces,
  * scale-hyperprior at each trained lambda,
  * mean-scale hyperprior.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def latest_ckpt(d):
    files = glob.glob(os.path.join(d, "ckpt_*.msgpack"))
    return max(files, key=lambda p: int(p.split("_")[-1].split(".")[0])) \
        if files else None


def eval_all(base, run):
    run("int8 reference-semantics codec", base + ["--codec", "int8"])

    for prof in ("haar-rgb", "haar", "haar422", "haar420"):
        run(f"wavelet integer codec ({prof}, bit-exact)",
            base + ["--codec", "wavelet", "--profile", prof])

    def sweep(pattern, codec, label):
        seen = set()
        # params-only release checkpoints first (what ships), then any
        # training dirs not covered by one
        for p in sorted(glob.glob(os.path.join(
                ROOT, "checkpoints", f"{pattern}*.params.msgpack"))):
            lam = p.split("_l")[-1].replace(".params.msgpack", "")
            seen.add(lam)
            run(f"{label} (lambda={lam})",
                base + ["--codec", codec, "--ckpt", p])
        for d in sorted(glob.glob(os.path.join(ROOT, "checkpoints",
                                               f"{pattern}*"))):
            if not os.path.isdir(d):
                continue
            lam = d.split("_l")[-1]
            ck = latest_ckpt(d)
            if ck and lam not in seen:
                run(f"{label} (lambda={lam})",
                    base + ["--codec", codec, "--ckpt", ck])

    sweep("hp_scale_l", "hyperprior", "scale hyperprior")
    sweep("hp_meanscale_l", "meanscale", "mean-scale hyperprior")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-synthetic", type=int, default=4)
    ap.add_argument("--data", default=None,
                    help="extra real-image folder (default: .evalset if "
                         "present — build with scripts/make_evalset.py)")
    args = ap.parse_args()

    from simple_image_compression_network_tpu import eval_codec

    tables = []  # (content label, rows)
    json_out = {}

    def run_set(content, base):
        rows = []

        def run(label, argv):
            print(f"# [{content}] evaluating {label} ...", flush=True)
            res = eval_codec.main(argv)
            rows.append((label, res["bpp"], res["psnr"]))

        eval_all(base, run)
        tables.append((content, rows))
        json_out[content] = [
            {"codec": l, "bpp": b, "psnr_db": p} for l, b, p in rows]

    run_set(f"synthetic 1/f ({args.n_synthetic} x 768x512)",
            ["--n-synthetic", str(args.n_synthetic)])
    data = args.data or (os.path.join(ROOT, ".evalset")
                         if os.path.isdir(os.path.join(ROOT, ".evalset"))
                         else None)
    if data:
        n = len(glob.glob(os.path.join(data, "*")))
        run_set(f"real photographs ({n} images, {os.path.basename(data)}/"
                " — scripts/make_evalset.py)", ["--data", data])

    lines = [
        "# Measured rate-distortion (bitstream in / bitstream out)",
        "",
        "All rates are REAL container bytes (headers + entropy payload);",
        "all reconstructions decoded from the bitstream.  Reproduce with",
        "`python scripts/make_results.py` (real-photo set:",
        "`python scripts/make_evalset.py` first).",
        "",
        "The reference publishes no RD numbers and contains no entropy",
        "coder (BASELINE.md); its implicit operating point is the fixed",
        "4:1 latent bottleneck = 6.0 bpp at whatever distortion its",
        "integer network produces.  The int8 rows use the model-shipped",
        "static tables (production serving mode; no tables in-stream).",
        "",
    ]
    for content, rows in tables:
        lines += [f"## {content}", "", "| codec | bpp | PSNR (dB) |",
                  "|---|---|---|"]
        for label, bpp, psnr in rows:
            lines.append(f"| {label} | {bpp:.3f} | {psnr:.2f} |")
        lines.append("")
        # seed-variance summary (VERDICT r4 #4): rows like
        # "... (lambda=0.01)" (seed 0) + "... (lambda=0.01_s1/_s2)"
        groups = {}
        for label, bpp, psnr in rows:
            if "(lambda=" not in label:
                continue
            base = label.split("(lambda=")[0].strip()
            lam = label.split("(lambda=")[1].rstrip(")")
            lam_base = lam.split("_s")[0]
            groups.setdefault((base, lam_base), []).append((bpp, psnr))
        var_lines = []
        for (base, lam), vals in sorted(groups.items()):
            if len(vals) < 2:
                continue
            bpps = [v[0] for v in vals]
            psnrs = [v[1] for v in vals]
            var_lines.append(
                f"- {base} lambda={lam} over {len(vals)} seeds: "
                f"bpp {np.mean(bpps):.3f} ± {np.ptp(bpps) / 2:.3f}, "
                f"PSNR {np.mean(psnrs):.2f} ± {np.ptp(psnrs) / 2:.2f} dB")
        if var_lines:
            lines += ["Seed variance (mean ± half-range):", ""]
            lines += var_lines + [""]
    lines += [
        "Notes:",
        "- int8 codec: bit-exact with the reference integer semantics",
        "  (mod-256 wrap, int4 weights); its PSNR is a property of the",
        "  reference's own trained network, reported honestly.",
        "- wavelet rows: the SAME bit-exact integer semantics and",
        "  topology with this repo's constructive Haar-wavelet weights",
        "  (intnet_haar.py) — sampling DC + offset-difference details +",
        "  integer-bilinear synthesis; profiles differ in wire color",
        "  transform (RGB>>2 vs YCoCg) and kept chroma detail channels.",
        "- hyperprior rows: trained in this repo on the mixed-content",
        "  bank (real-photo crops disjoint from this eval set + sloped",
        "  1/f + edges + textures; 50k steps per lambda,",
        "  scripts/train_release.py; checkpoints/*.params.msgpack).",
        "- mean-scale vs scale (round-5 finding): on synthetic bank-like",
        "  content mean-scale dominates at equal lambda; on the photo",
        "  eval set it sits slightly inside the scale curve at every",
        "  lambda, and the seed half-ranges above do NOT contain the gap",
        "  - it is systematic, not training noise.  Diagnosis: the mu",
        "  head's predictions degrade under the train->eval content",
        "  shift (the bank's photo diet is a single source image), while",
        "  on bank-like content the mean head pays for itself.",
        "- plot-ready data: docs/RESULTS.json (bpp / psnr_db per codec",
        "  per content set).",
        "",
    ]
    out = os.path.join(ROOT, "docs", "RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(ROOT, "docs", "RESULTS.json"), "w") as f:
        json.dump(json_out, f, indent=1)
    print(json.dumps({"tables": {c: r for c, r in tables}}))
    print(f"wrote {out} (+ RESULTS.json)")


if __name__ == "__main__":
    main()

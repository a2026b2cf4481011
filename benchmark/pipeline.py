#!/usr/bin/env python3
"""End-to-end benchmark pipeline (native equivalent of the reference's
``benchmark_tutorial.ipynb``): per RNA family, run the lara-tpu solver on the
unaligned sequences, assemble the MSA from the pairwise library, and score it
against the reference alignment with SPS and MCC.

Layout expected (BRAliBase-style):
    <data_dir>/<family>/unaligned.fa      input sequences (any lara-tpu format)
    <data_dir>/<family>/reference.fa      reference alignment (aligned fasta
                                          or .aln clustal)

Unlike the reference pipeline, no external tools are needed: the MSA stage is
:mod:`lara_tpu.msa` (T-Coffee-library consistency alignment) and consensus
structures fall back to the built-in folder when RNAalifold is absent.  If
``t_coffee`` IS installed, pass ``--t-coffee`` to use it instead, matching
the paper protocol exactly.

Output: one tab-separated row per family
    family  n_seqs  avg_len  solve_s  msa_s  sps  mcc
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import subprocess
import sys
import time


def find_families(data_dir: str):
    for family_dir in sorted(glob.glob(os.path.join(data_dir, "*"))):
        if not os.path.isdir(family_dir):
            continue
        unaligned = None
        reference = None
        for name in os.listdir(family_dir):
            base = name.lower()
            if base.startswith("unaligned"):
                unaligned = os.path.join(family_dir, name)
            elif base.startswith("reference"):
                reference = os.path.join(family_dir, name)
        if unaligned and reference:
            yield os.path.basename(family_dir), unaligned, reference


def run_family(name, unaligned, reference, out_dir, args):
    from lara_tpu import evaluate, msa
    from lara_tpu.app import run
    from lara_tpu.params import Parameters

    lib_file = os.path.join(out_dir, f"{name}.lib")
    msa_file = os.path.join(out_dir, f"{name}.msa.fa")

    in_file = unaligned
    predict = args.predict
    if args.truth_input:
        # ground-truth condition: the generator's true structures as fixed
        # edges (no predictor in the loop -- separates predictor-induced
        # from solver-induced quality loss)
        truth = os.path.join(os.path.dirname(unaligned), "truth.dbn")
        if not os.path.exists(truth):
            raise SystemExit(f"--truth-input: {truth} missing "
                             "(regenerate with make_holdout.py)")
        in_file = truth
        predict = None
    t0 = time.time()
    auto = str(args.balance).lower() == "auto"
    params = Parameters(
        in_file=in_file,
        out_file=lib_file,
        predict=predict,
        num_iterations=args.numiter,
        balance=1.0 if auto else float(args.balance),
        balance_auto=auto,
    )
    outlib = run(params)
    solve_s = time.time() - t0

    t0 = time.time()
    if args.t_coffee:
        subprocess.run(
            ["t_coffee", f"-lib={lib_file}", "-output=fasta_aln",
             f"-outfile={msa_file}"],
            check=True, capture_output=True,
        )
    else:
        alignment = msa.align(msa.from_output_library(outlib))
        with open(msa_file, "w") as handle:
            msa.write_fasta(alignment, handle)
    msa_s = time.time() - t0

    sps = evaluate.sps(reference, msa_file)
    try:
        mcc = evaluate.mcc(reference, msa_file, consensus=args.consensus)
    except Exception as exc:  # consensus folding can fail on tiny families
        print(f"# {name}: MCC failed: {exc}", file=sys.stderr)
        mcc = float("nan")

    sps_null = float("nan")
    if args.with_null:
        # column-shuffle null: permute the columns of OUR alignment -- an
        # alignment-shaped object with the same residues and gap volume but
        # no signal; its SPS is the floor real numbers must clear
        import numpy as np

        rng = np.random.default_rng(12345)
        test = evaluate.read_msa(msa_file)
        n_cols = len(test[0][1])
        perm = rng.permutation(n_cols)
        null_file = msa_file + ".null.fa"
        with open(null_file, "w") as handle:
            for nm, row in test:
                handle.write(f">{nm}\n{''.join(row[c] for c in perm)}\n")
        sps_null = evaluate.sps(reference, null_file)

    records = evaluate.read_msa(reference)
    avg_len = sum(len(s.replace("-", "")) for _, s in records) / len(records)
    return (name, len(records), avg_len, solve_s, msa_s, sps, mcc, sps_null)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("data_dir", help="directory of family subdirectories")
    parser.add_argument("-o", "--out-dir", default="pipeline_out")
    parser.add_argument("--predict", default=None, choices=(None, "builtin"),
                        help="structure prediction for structure-less input")
    parser.add_argument("--numiter", type=int, default=500)
    parser.add_argument("--t-coffee", action="store_true",
                        help="use the external t_coffee binary for the MSA stage")
    parser.add_argument("--consensus", default="auto",
                        choices=("auto", "rnaalifold", "builtin"))
    parser.add_argument("--balance", default="1.0",
                        help="structural-score weight (-b); 0 gives the "
                             "sequence-only ablation")
    parser.add_argument("--with-null", action="store_true",
                        help="also score a column-shuffled null of each MSA "
                             "(the no-signal SPS floor)")
    parser.add_argument("--truth-input", action="store_true",
                        help="solve from <family>/truth.dbn (the generator's "
                             "true structures as fixed edges) instead of the "
                             "predictor")
    args = parser.parse_args(argv)

    if args.t_coffee and not shutil.which("t_coffee"):
        parser.error("--t-coffee requested but t_coffee is not in PATH")

    os.makedirs(args.out_dir, exist_ok=True)
    print("family\tn_seqs\tavg_len\tsolve_s\tmsa_s\tsps\tmcc\tsps_null")
    rows = []
    for name, unaligned, reference in find_families(args.data_dir):
        row = run_family(name, unaligned, reference, args.out_dir, args)
        rows.append(row)
        print("%s\t%d\t%.1f\t%.2f\t%.2f\t%.4f\t%.4f\t%.4f" % row)
    if rows:
        n = len(rows)
        print("# mean\t\t\t%.2f\t%.2f\t%.4f\t%.4f" % (
            sum(r[3] for r in rows) / n, sum(r[4] for r in rows) / n,
            sum(r[5] for r in rows) / n,
            sum(r[6] for r in rows if r[6] == r[6]) / max(1, sum(1 for r in rows if r[6] == r[6])),
        ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Run the full quality matrix in one process (compiles shared):

1. committed families, structure-aware (the headline numbers)
2. committed families, balance=0 (sequence-only ablation: what the
   Lagrangian structure machinery buys)
3. hold-out families (different generator architecture), structure-aware
4. hold-out families, balance=0

Every run also scores the column-shuffle null.  Output: the four TSV tables
on stdout, ready for benchmark/RESULTS.md.
"""
import contextlib
import io
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "benchmark")

import pipeline  # noqa: E402


def run(tag, argv):
    print(f"\n=== {tag} ===", flush=True)
    pipeline.main(argv)


def main():
    from lara_tpu.app import _apply_platform_env

    _apply_platform_env()
    base = ["--predict", "builtin", "--with-null", "-o", "/tmp/quality_out"]
    run("committed families, structure-aware",
        ["benchmark/data", *base])
    run("committed families, sequence-only (balance=0)",
        ["benchmark/data", *base, "--balance", "0"])
    run("hold-out families, structure-aware",
        ["benchmark/data_holdout", *base])
    run("hold-out families, sequence-only (balance=0)",
        ["benchmark/data_holdout", *base, "--balance", "0"])
    run("low-identity families (~35% id), structure-aware",
        ["benchmark/data_lowid", *base])
    run("low-identity families (~35% id), sequence-only (balance=0)",
        ["benchmark/data_lowid", *base, "--balance", "0"])
    # ---- ceiling + operating-point calibration ----
    # (a) true structures as fixed edges: predictor out of the loop
    run("hold-out families, TRUE structures (fixed edges)",
        ["benchmark/data_holdout", *base, "--truth-input"])
    # (b) the balance sweep points that calibrate the '-b auto' bands,
    # and '-b auto' itself (per-pair identity-keyed weight)
    for bal in ("0.25", "0.5", "auto"):
        run(f"hold-out families, structure-aware, balance={bal}",
            ["benchmark/data_holdout", *base, "--balance", bal])
        run(f"low-identity families, structure-aware, balance={bal}",
            ["benchmark/data_lowid", *base, "--balance", bal])
        run(f"committed families, structure-aware, balance={bal}",
            ["benchmark/data", *base, "--balance", bal])


if __name__ == "__main__":
    main()

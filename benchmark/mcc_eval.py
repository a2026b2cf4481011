#!/usr/bin/env python3
"""Compute the Matthews correlation coefficient for two structured alignments.

Drop-in equivalent of the reference script (``/root/reference/benchmark/
mcc_eval.py``): consensus structures via RNAalifold when it is in PATH,
otherwise lara-tpu's built-in consensus folder (no external tools needed).

Usage: ./mcc_eval.py <reference.fasta> <test.fasta>
"""

import sys

from lara_tpu import evaluate


def main() -> int:
    if len(sys.argv) != 3:
        print("    Compute Matthews correlation coefficient (MCC) for two structured alignments.")
        print(f"    Usage: {sys.argv[0]} <reference.fasta> <test.fasta>")
        return 1
    print(f"{evaluate.mcc(sys.argv[1], sys.argv[2]):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

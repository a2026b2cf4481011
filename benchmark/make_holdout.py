#!/usr/bin/env python3
"""Generate HOLD-OUT quality-benchmark families with a different generator
architecture than ``make_families.py``.

Round-2 verdict: scoring the aligner on families produced by the same
generator that defines their reference alignments is circular evidence.
This generator breaks the circularity on the generator side: its process
shares *no code and no architectural assumptions* with ``make_families.py``
(which mutates a fixed hand-written consensus column-by-column):

* **random nested structures**, not RNA-class templates: stems are placed by
  recursive interval splitting with variable helix lengths, bulges and
  multi-loops -- no cloverleaf/junction prior the aligner's structure model
  might be tuned to,
* **evolution along a star tree with indel drift**: each member is derived
  by a birth-death indel process (geometric lengths) over loop regions plus
  independent (NON-compensatory with probability ``mismatch_p``) stem
  mutations -- so some stems decay, as in real families, instead of the
  always-covarying stems make_families produces,
* the reference alignment is the indel history itself (an explicit
  coordinate map per member), not a mutated copy of a master row.

Deterministic (fixed seeds); ``benchmark/data_holdout/`` is committed.

Layout (same contract as ``benchmark/pipeline.py``):
    benchmark/data_holdout/<family>/unaligned.fa
    benchmark/data_holdout/<family>/reference.fa
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_BASES = "ACGU"
_COMP = {"A": "U", "U": "A", "G": "C", "C": "G"}


def _random_structure(rng, lo: int, hi: int, depth: int = 0):
    """Recursively place nested stems in [lo, hi); returns pair list."""
    pairs = []
    pos = lo
    while pos + 8 < hi:
        if rng.random() < 0.35 + 0.15 * (depth == 0):
            helix = int(rng.integers(3, 9))
            span = int(rng.integers(2 * helix + 4, max(2 * helix + 5, min(60, hi - pos))))
            if pos + span > hi:
                break
            for k in range(helix):
                pairs.append((pos + k, pos + span - 1 - k))
            pairs += _random_structure(rng, pos + helix + 1,
                                       pos + span - helix - 1, depth + 1)
            pos += span + int(rng.integers(1, 6))
        else:
            pos += int(rng.integers(2, 7))
    return pairs


def _ancestor(rng, length: int):
    pairs = _random_structure(rng, 0, length)
    seq = [_BASES[rng.integers(0, 4)] for _ in range(length)]
    for (i, j) in pairs:
        seq[j] = _COMP[seq[i]]
    return seq, sorted(pairs)


def _evolve(rng, seq, pairs, sub_p, mismatch_p, indel_rate):
    """One member: substitutions + a loop indel process; returns
    (sequence chars, alignment map: ancestor col -> member char or '',
    per-column inserts)."""
    length = len(seq)
    paired = {}
    for (i, j) in pairs:
        paired[i] = j
        paired[j] = i
    out = list(seq)
    # substitutions
    for col in range(length):
        if col in paired and col < paired[col]:
            if rng.random() < sub_p:
                base = _BASES[rng.integers(0, 4)]
                out[col] = base
                if rng.random() >= mismatch_p:  # compensate
                    out[paired[col]] = _COMP[base]
        elif col not in paired:
            if rng.random() < sub_p * 1.6:
                out[col] = _BASES[rng.integers(0, 4)]
    # indel drift on unpaired columns: geometric-length deletions/insertions
    inserts = {}
    col = 0
    while col < length:
        if col not in paired and rng.random() < indel_rate:
            if rng.random() < 0.5:  # deletion run
                run = min(1 + rng.geometric(0.6), 4)
                for k in range(col, min(col + run, length)):
                    if k not in paired:
                        out[k] = ""
                col += run
                continue
            ins_len = min(1 + rng.geometric(0.5), 5)
            inserts[col] = "".join(
                _BASES[rng.integers(0, 4)] for _ in range(int(ins_len)))
        col += 1
    return out, inserts


def make_family(name: str, n_seqs: int, length: int, seed: int,
                sub_p=0.18, mismatch_p=0.35, indel_rate=0.05):
    rng = np.random.default_rng(seed)
    seq, pairs = _ancestor(rng, length)
    members, all_inserts = [], []
    for k in range(n_seqs):
        if k == 0:
            members.append((list(seq), {}))
        else:
            members.append(_evolve(rng, seq, pairs, sub_p, mismatch_p,
                                   indel_rate))
        all_inserts.append(members[-1][1])
    max_ins = {}
    for ins in all_inserts:
        for col, s in ins.items():
            max_ins[col] = max(max_ins.get(col, 0), len(s))
    names, aligned, structures = [], [], []
    for k, (out, ins) in enumerate(members):
        row = []
        pos_of = {}   # ancestor col -> 0-based member position (if survived)
        n_chars = 0
        for col in range(length):
            if col in max_ins:
                mine = ins.get(col, "")
                row.append(mine + "-" * (max_ins[col] - len(mine)))
                n_chars += len(mine)
            if out[col]:
                pos_of[col] = n_chars
                n_chars += 1
            row.append(out[col] if out[col] else "-")
        names.append(f"{name}_{k + 1}")
        aligned.append("".join(row))
        # the member's TRUE structure: ancestor pairs whose both columns
        # survived, in member coordinates (nested by construction, so
        # dot-bracket representable; decayed stems keep their pairs -- the
        # structural homology is the truth even where bases mismatch)
        struct = ["."] * n_chars
        for (i, j) in pairs:
            if i in pos_of and j in pos_of:
                struct[pos_of[i]] = "("
                struct[pos_of[j]] = ")"
        structures.append("".join(struct))
    return names, aligned, structures


FAMILIES = [
    ("rand180", 8, 180, 9101),
    ("rand110", 10, 110, 9202),
    ("indelheavy90", 10, 90, 9303),
]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("-o", "--out-dir",
                        default=os.path.join(os.path.dirname(__file__),
                                             "data_holdout"))
    args = parser.parse_args(argv)
    specs = {
        "indelheavy90": dict(indel_rate=0.12, sub_p=0.22),
    }
    for name, n_seqs, length, seed in FAMILIES:
        fam_dir = os.path.join(args.out_dir, name)
        os.makedirs(fam_dir, exist_ok=True)
        names, aligned, structures = make_family(name, n_seqs, length, seed,
                                                 **specs.get(name, {}))
        with open(os.path.join(fam_dir, "unaligned.fa"), "w") as handle:
            for member, row in zip(names, aligned):
                handle.write(f">{member}\n{row.replace('-', '')}\n")
        with open(os.path.join(fam_dir, "reference.fa"), "w") as handle:
            for member, row in zip(names, aligned):
                handle.write(f">{member}\n{row}\n")
        # the generator's ground-truth structures as solver input (fixed
        # edges): pipeline --truth-input separates predictor-induced from
        # solver-induced quality loss (round-3 verdict item 3a)
        with open(os.path.join(fam_dir, "truth.dbn"), "w") as handle:
            for member, row, st in zip(names, aligned, structures):
                seq = row.replace("-", "")
                assert len(seq) == len(st), (member, len(seq), len(st))
                handle.write(f">{member}\n{seq}\n{st}\n")
        print(f"{name}: {n_seqs} seqs, {len(aligned[0])} columns -> {fam_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Generate the committed BRAliBase-style quality-benchmark families.

The reference validates alignment quality on BRAliBase II data-set1
(``/root/reference/benchmark/benchmark_tutorial.ipynb`` cells 3-13: download
-> lara -> t_coffee -> SPS/MCC).  This environment has no network egress
(the download was attempted and fails; see benchmark/RESULTS.md), so the
committed fixtures are *generated* families with BRAliBase's shape and --
unlike scraped data -- an exact, by-construction ground-truth alignment:

* each family has a hand-written consensus secondary structure whose stem /
  loop architecture follows a real RNA class (tRNA cloverleaf, 5S rRNA
  three-helix junction, SRP-like long hairpin),
* the template sequence is sampled to be perfectly complementary on stems,
* family members apply **compensatory pair mutations** (stem columns mutate
  both sides, preserving canonical pairing -- the covariation signature real
  structural-RNA families show), loop point mutations, and loop indels,
* the true alignment is known exactly (every member is generated column by
  column), so SPS against it is a real accuracy number, not a proxy.

Deterministic (fixed seed): re-running reproduces the committed files.

Layout written (consumed by ``benchmark/pipeline.py``):
    benchmark/data/<family>/unaligned.fa    input sequences
    benchmark/data/<family>/reference.fa    ground-truth alignment (fasta)
    benchmark/data/<family>/reference.sth   same, Stockholm + SS_cons
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# canonical pairs, weighted like their thermodynamic stability
_PAIRS = ["GC", "CG", "AU", "UA", "GU", "UG"]
_PAIR_W = np.array([0.3, 0.3, 0.16, 0.16, 0.04, 0.04])
_BASES = "ACGU"


def _stem(n: int) -> tuple[str, str]:
    return "(" * n, ")" * n


def _consensus(name: str) -> str:
    """Hand-written consensus structures shaped like real RNA classes."""
    if name == "trna":
        # cloverleaf: acceptor 7bp / D-stem 4bp+loop8 / anticodon 5bp+loop7 /
        # T-stem 5bp+loop7 / NCCA tail -> 76 columns
        a_o, a_c = _stem(7)
        d_o, d_c = _stem(4)
        c_o, c_c = _stem(5)
        t_o, t_c = _stem(5)
        s = (a_o + ".." + d_o + "........" + d_c + "." + c_o + "......."
             + c_c + "....." + t_o + "......." + t_c + a_c + "....")
        assert len(s) == 76, len(s)
        return s
    if name == "rrna5s":
        # three-helix junction like 5S rRNA: helix I closes the molecule,
        # helices II and III branch from the central loop -> 119 columns
        h1_o, h1_c = _stem(9)
        h2_o, h2_c = _stem(12)
        h3_o, h3_c = _stem(13)
        s = (h1_o + "..." + h2_o + "..............." + h2_c + "....."
             + h3_o + "................" + h3_c + "....." + h1_c + ".......")
        assert len(s) == 119, len(s)
        return s
    if name == "srp":
        # SRP-RNA-like long interrupted hairpin: stacked helices with
        # internal loops and an apical loop -> 268 columns
        parts_open, parts_close = [], []
        for n_bp, n_int in ((18, 4), (16, 3), (14, 5), (12, 4), (10, 3),
                            (12, 4), (14, 6)):
            o, c = _stem(n_bp)
            parts_open.append(o + "." * n_int)
            parts_close.append("." * n_int + c)
        s = ("......." + "".join(parts_open) + "......."
             + "".join(reversed(parts_close)) + "....")
        assert len(s) == 268, len(s)
        return s
    raise ValueError(name)


def _pair_table(structure: str) -> dict:
    stack, pairs = [], {}
    for idx, char in enumerate(structure):
        if char == "(":
            stack.append(idx)
        elif char == ")":
            opener = stack.pop()
            pairs[opener] = idx
            pairs[idx] = opener
    assert not stack
    return pairs


def _template(structure: str, rng) -> list:
    pairs = _pair_table(structure)
    seq = [""] * len(structure)
    for idx, char in enumerate(structure):
        if seq[idx]:
            continue
        if idx in pairs and idx < pairs[idx]:
            pair = _PAIRS[rng.choice(len(_PAIRS), p=_PAIR_W)]
            seq[idx], seq[pairs[idx]] = pair[0], pair[1]
        elif idx not in pairs:
            seq[idx] = _BASES[rng.integers(0, 4)]
    return seq


def make_family(name: str, n_seqs: int, seed: int,
                pair_mut: float = 0.25, loop_mut: float = 0.25,
                indels: int = 2):
    """Returns (names, aligned_rows, consensus_structure_with_inserts)."""
    rng = np.random.default_rng(seed)
    structure = _consensus(name)
    pairs = _pair_table(structure)
    n_cols = len(structure)
    loop_cols = [c for c in range(n_cols) if c not in pairs]

    rows = []
    inserts = {}  # col -> max insert length after this column
    member_inserts = []
    for k in range(n_seqs):
        row = _template(structure, rng) if k == 0 else list(rows[0])
        if k > 0:
            # compensatory stem mutations
            for col, partner in pairs.items():
                if col < partner and rng.random() < pair_mut:
                    pair = _PAIRS[rng.choice(len(_PAIRS), p=_PAIR_W)]
                    row[col], row[partner] = pair[0], pair[1]
            # loop point mutations
            for col in loop_cols:
                if rng.random() < loop_mut:
                    row[col] = _BASES[rng.integers(0, 4)]
        # loop indels (never the first member: keeps a full-length anchor)
        my_inserts = {}
        if k > 0:
            for _ in range(int(rng.integers(0, indels + 1))):
                col = int(rng.choice(loop_cols))
                if rng.random() < 0.5:
                    row[col] = ""  # deletion -> gap in this row
                else:
                    ins = "".join(_BASES[rng.integers(0, 4)]
                                  for _ in range(int(rng.integers(1, 3))))
                    my_inserts[col] = ins
                    inserts[col] = max(inserts.get(col, 0), len(ins))
        rows.append(row)
        member_inserts.append(my_inserts)

    # materialise insert columns: after column c, inserts[c] extra columns
    names = [f"{name}_{k + 1}" for k in range(n_seqs)]
    aligned = []
    for row, my_ins in zip(rows, member_inserts):
        out = []
        for col in range(n_cols):
            out.append(row[col] if row[col] else "-")
            if col in inserts:
                ins = my_ins.get(col, "")
                out.append(ins + "-" * (inserts[col] - len(ins)))
        aligned.append("".join(out))
    cons_out = []
    for col in range(n_cols):
        cons_out.append(structure[col])
        if col in inserts:
            cons_out.append("." * inserts[col])
    return names, aligned, "".join(cons_out)


FAMILIES = [
    ("trna", 10, 101),
    ("rrna5s", 8, 202),
    ("srp", 6, 303),
]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("-o", "--out-dir",
                        default=os.path.join(os.path.dirname(__file__), "data"))
    parser.add_argument("--low-identity", action="store_true",
                        help="aggressive divergence (pair_mut=0.85, "
                             "loop_mut=0.6, 6 indels): the low-identity "
                             "regime where structure-aware alignment should "
                             "beat sequence-only (the LaRA paper's target "
                             "regime, <60%% identity BRAliBase families)")
    args = parser.parse_args(argv)
    kwargs = (dict(pair_mut=0.85, loop_mut=0.6, indels=6)
              if args.low_identity else {})
    for name, n_seqs, seed in FAMILIES:
        fam_dir = os.path.join(args.out_dir, name)
        os.makedirs(fam_dir, exist_ok=True)
        names, aligned, cons = make_family(name, n_seqs, seed, **kwargs)
        with open(os.path.join(fam_dir, "unaligned.fa"), "w") as handle:
            for member, row in zip(names, aligned):
                handle.write(f">{member}\n{row.replace('-', '')}\n")
        with open(os.path.join(fam_dir, "reference.fa"), "w") as handle:
            for member, row in zip(names, aligned):
                handle.write(f">{member}\n{row}\n")
        with open(os.path.join(fam_dir, "reference.sth"), "w") as handle:
            handle.write("# STOCKHOLM 1.0\n")
            width = max(len(m) for m in names) + 2
            for member, row in zip(names, aligned):
                handle.write(f"{member:<{width}}{row}\n")
            handle.write(f"{'#=GC SS_cons':<{width}}{cons}\n//\n")
        print(f"{name}: {n_seqs} seqs, {len(aligned[0])} columns "
              f"-> {fam_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

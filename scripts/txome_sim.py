"""Isoform-style synthetic transcriptome: shared exon blocks + paralogs.

The uniform-random ACGT transcriptomes used by bench.py/eval_accuracy give
near-unique 31-mers (mean SA interval ~1), which hides the collation cost the
reference pays on real data (upstream:src/HitManager.cpp under multimapping,
SURVEY.md §3.4). Real transcriptomes are repetitive in two specific ways this
generator reproduces:

  * alternative splicing: isoforms of a gene are ordered subsets of the
    gene's exons, so exon-interior k-mers occur in every isoform that keeps
    the exon (SA intervals = isoform multiplicity, 2-10);
  * paralogy: some genes are near-duplicates of another (point mutations
    only), giving wide cross-gene intervals and genuinely ambiguous reads.

Output statistics (defaults): ~500 genes x ~5 isoforms = ~2500 transcripts,
mean transcript ~1.5 kb, ~8% paralog genes at 1-2% divergence.
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen_isoform_txome(
    rng: np.random.Generator,
    n_genes: int = 500,
    exons_per_gene: tuple[int, int] = (4, 12),
    exon_len: tuple[int, int] = (80, 600),
    isoforms_per_gene: tuple[int, int] = (2, 8),
    paralog_frac: float = 0.08,
    paralog_div: float = 0.015,
    min_txp_len: int = 150,
) -> list[tuple[str, bytes]]:
    """-> [(name, seq)] with names gene<g>.iso<i> (paralogs: gene<g>p.iso<i>)."""
    txps: list[tuple[str, bytes]] = []
    gene_exons: list[list[bytes]] = []
    for g in range(n_genes):
        if gene_exons and rng.random() < paralog_frac:
            # paralog: mutate a previous gene's exons at paralog_div
            src = gene_exons[int(rng.integers(0, len(gene_exons)))]
            exons = []
            for ex in src:
                e = np.frombuffer(ex, dtype=np.uint8).copy()
                nmut = rng.binomial(len(e), paralog_div)
                if nmut:
                    pos = rng.integers(0, len(e), nmut)
                    e[pos] = BASES[rng.integers(0, 4, nmut)]
                exons.append(e.tobytes())
            tag = f"gene{g}p"
        else:
            n_ex = int(rng.integers(*exons_per_gene))
            exons = [
                BASES[rng.integers(0, 4, int(rng.integers(*exon_len)))].tobytes()
                for _ in range(n_ex)
            ]
            tag = f"gene{g}"
        gene_exons.append(exons)

        n_iso = min(int(rng.integers(*isoforms_per_gene)), 2 ** len(exons) - 1)
        seen = set()
        i = 0
        attempts = 0
        while i < n_iso and attempts < 8 * n_iso:
            attempts += 1
            keep = rng.random(len(exons)) < 0.75
            if not keep.any():
                continue
            key = tuple(np.nonzero(keep)[0].tolist())
            if key in seen:
                continue
            seen.add(key)
            seq = b"".join(ex for ex, kp in zip(exons, keep) if kp)
            if len(seq) < min_txp_len:
                continue
            txps.append((f"{tag}.iso{i}", seq))
            i += 1
    return txps


def write_fasta(txps: list[tuple[str, bytes]], path: str) -> None:
    with open(path, "w") as f:
        for name, seq in txps:
            f.write(f">{name}\n{seq.decode()}\n")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--genes", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    txps = gen_isoform_txome(rng, n_genes=args.genes)
    write_fasta(txps, args.out)
    tot = sum(len(s) for _, s in txps)
    print(f"{len(txps)} transcripts, {tot/1e6:.2f} Mb total, "
          f"mean {tot//max(len(txps),1)} bp")

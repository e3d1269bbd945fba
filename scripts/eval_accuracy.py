#!/usr/bin/env python
"""Mapping-accuracy evaluation on simulated reads (paper-style validation).

The RapMap paper established correctness by precision/recall of mapped loci on
simulated data (SURVEY.md §4); this harness reproduces that protocol against
this framework: simulate reads with known (transcript, position, strand) truth
from a FASTA (+ error/N rates), map them, and score.

A read is a true positive if its reported mapping set contains the true locus
(exact transcript + position + strand); precision counts reported loci that
are the true one. Results print as one JSON object.

Usage:
  python scripts/eval_accuracy.py -t txome.fa [-n 20000] [-l 76] [-e 0.01] [-k 31]
  python scripts/eval_accuracy.py --synthetic  # generate a transcriptome too
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rapmap_tpu.utils.jaxenv import setup as _jax_setup

_jax_setup()

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")


def simulate(txps, n_reads, read_len, err, n_rate, rng, chimera_frac=0.0,
             indel_rate=0.0):
    """-> (reads, truth) with truth rows (txp, pos, rc, pos_tol): pos_tol is
    the net coordinate slack an indel read's reported position may carry —
    quasi-mapping has no gapped alignment (CIGAR is <len>M, paper §2), so an
    MMP chain broken by an indel legitimately votes positions shifted by up
    to the total indel length (SEMANTICS.md §3/§4)."""
    reads, truth = [], []
    lens = np.array([len(s) for _, s in txps])
    ok = np.nonzero(lens >= read_len + 16)[0]
    for i in range(n_reads):
        t = int(ok[rng.integers(0, len(ok))])
        seq = txps[t][1]
        if chimera_frac and rng.random() < chimera_frac:
            # half-true/half-random junction read: SHOULD stay unmapped, but
            # its true half anchors MMPs — the --minScoreFraction testbed
            p = int(rng.integers(0, len(seq) - read_len + 1))
            r = bytearray(seq[p : p + read_len])
            half = read_len // 2
            r[half:] = BASES[rng.integers(0, 4, read_len - half)].tobytes()
            reads.append(bytes(r))
            truth.append((-1, -1, False, 0))
            continue
        tol = 0
        if indel_rate:
            # copy reference bases from p, injecting indel events, until
            # exactly read_len read bases exist; tol = total indel length
            p = int(rng.integers(0, len(seq) - read_len - 12))
            r = bytearray()
            sp = p
            while len(r) < read_len and sp < len(seq):
                if rng.random() < indel_rate:
                    ilen = min(int(rng.geometric(0.6)), 3)
                    tol += ilen
                    if rng.random() < 0.5:  # insertion: novel bases
                        r += BASES[rng.integers(0, 4, ilen)].tobytes()
                        continue
                    sp += ilen  # deletion: skip reference bases
                    continue
                r.append(seq[sp])
                sp += 1
            if len(r) < read_len:  # ran off the transcript: degenerate, retry
                r += BASES[rng.integers(0, 4, read_len - len(r))].tobytes()
            r = r[:read_len]
        else:
            p = int(rng.integers(0, len(seq) - read_len + 1))
            r = bytearray(seq[p : p + read_len])
        for j in range(read_len):
            u = rng.random()
            if u < err:
                r[j] = BASES[int(rng.integers(0, 4))]
            elif u < err + n_rate:
                r[j] = ord("N")
        rc = bool(rng.random() < 0.5)
        if rc:
            r = bytearray(bytes(r).translate(COMP)[::-1])
        reads.append(bytes(r))
        truth.append((t, p, rc, tol))
    return reads, truth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--transcripts")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument(
        "--isoform", action="store_true",
        help="isoform-style synthetic txome (shared exons + paralogs) — real "
        "multimapping pressure; see scripts/txome_sim.py",
    )
    ap.add_argument("-n", "--numReads", type=int, default=20000)
    ap.add_argument("-l", "--readLen", type=int, default=76)
    ap.add_argument("-e", "--errorRate", type=float, default=0.01)
    ap.add_argument("--nRate", type=float, default=0.002)
    ap.add_argument("-k", "--kmerLen", type=int, default=31)
    ap.add_argument("--batchSize", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--chimeraFrac", type=float, default=0.0,
                    help="fraction of half-true/half-random junction reads "
                    "(no true locus; should be reported unmapped)")
    ap.add_argument("--indelRate", type=float, default=0.0,
                    help="per-base probability of an indel event (1-3 bp, "
                    "ins/del 50/50); recall then tolerates the indel-induced "
                    "position shift (quasi-mapping emits no gapped alignment)")
    ap.add_argument("--mappingScore", action="store_true",
                    help="score mappings (SEMANTICS.md §9)")
    ap.add_argument("--minScoreFraction", type=float, default=0.0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    tmp = tempfile.mkdtemp(prefix="tqm_eval_")
    if args.isoform:
        from txome_sim import gen_isoform_txome, write_fasta

        fa = os.path.join(tmp, "txome_isoform.fa")
        write_fasta(gen_isoform_txome(rng), fa)
        args.transcripts = fa
    elif args.synthetic or not args.transcripts:
        fa = os.path.join(tmp, "txome.fa")
        with open(fa, "w") as f:
            for i in range(2000):
                L = int(rng.integers(300, 3000))
                f.write(f">t{i}\n{BASES[rng.integers(0, 4, L)].tobytes().decode()}\n")
        args.transcripts = fa

    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.index.encode import encode_reads
    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.models.quasi import QuasiMapper
    from rapmap_tpu.io.fastx import read_fasta

    txps = [(n, s) for n, s in read_fasta(args.transcripts)]
    idx = build_quasi_index(args.transcripts, k=args.kmerLen)
    name_to_id = {n: i for i, n in enumerate(idx.txp_names)}
    reads, truth = simulate(txps, args.numReads, args.readLen, args.errorRate,
                            args.nRate, rng, args.chimeraFrac, args.indelRate)

    cfg = MapConfig(k=idx.k, mapping_score=args.mappingScore,
                    min_score_fraction=args.minScoreFraction)
    mapper = QuasiMapper(idx, cfg)
    id_to_seq = {name_to_id[n]: s for n, s in txps}
    B = args.batchSize
    L = args.readLen
    tp = fn = 0
    chim_total = chim_mapped = 0
    reported = 0
    correct_reported = 0
    equivalent_reported = 0
    ctr_tot: dict[str, int] = {}
    for s in range(0, len(reads), B):
        chunk = reads[s : s + B]
        codes = np.full((B, L), 5, dtype=np.int8)
        for i, r in enumerate(chunk):
            codes[i] = encode_reads(np.frombuffer(r, dtype=np.uint8))
        lens = np.full(B, L, np.int32)
        wr = mapper.fetch(mapper.map_se_async(codes, lens, n_valid=len(chunk)))
        if cfg.mapping_score and cfg.min_score_fraction > 0.0:
            from rapmap_tpu.models import scorefilter

            wr = scorefilter.filter_se(wr, lens, cfg)
        for key, val in wr.counters.items():
            ctr_tot[key] = ctr_tot.get(key, 0) + int(val)
        off = 0
        for i in range(len(chunk)):
            c = int(wr.counts[i])
            locs = {
                (int(wr.recs[off + j][0]), int(wr.recs[off + j][1]), int(wr.recs[off + j][2]))
                for j in range(c)
            }
            off += c
            t, p, rc, tol = truth[s + i]
            if t == -1:  # chimeric read: any mapping is a false positive
                chim_total += 1
                chim_mapped += int(bool(locs))
                continue
            s_true = 1 if rc else 0
            tid = name_to_id[txps[t][0]]
            true_w = txps[t][1][p : p + L]
            true_w_rc = true_w.translate(COMP)[::-1]
            reported += len(locs)
            hit = False
            for t2, p2, s2 in locs:
                # pos_tol-window match (exact for substitution-only reads)
                if t2 == tid and s2 == s_true and abs(p2 - p) <= tol:
                    hit = True
                    correct_reported += 1
                w2 = id_to_seq.get(t2, b"")[p2 : p2 + L]
                if w2 == (true_w if s2 == s_true else true_w_rc):
                    equivalent_reported += 1  # sequence-identical locus:
                    # a correct mapping under real multimapping
            if hit:
                tp += 1
            else:
                fn += 1
    recall = tp / max(tp + fn, 1)
    precision = correct_reported / max(reported, 1)
    print(json.dumps({
        "reads": len(reads), "read_len": args.readLen, "error_rate": args.errorRate,
        "txome": "isoform" if args.isoform else os.path.basename(args.transcripts),
        "expand_budget": mapper.cfg.expand_budget,
        "recall_true_locus": round(recall, 4),
        "precision_reported_loci": round(precision, 4),
        "precision_equivalent_loci": round(equivalent_reported / max(reported, 1), 4),
        "mean_loci_per_read": round(reported / len(reads), 3),
        "over_budget_reads": ctr_tot.get("over_budget", 0),
        "too_ambiguous_reads": ctr_tot.get("too_ambiguous", 0),
        **({"chimera_reads": chim_total, "chimera_mapped": chim_mapped,
            "score_filtered_records": ctr_tot.get("score_filtered", 0)}
           if args.chimeraFrac or args.mappingScore else {}),
    }))


if __name__ == "__main__":
    main()

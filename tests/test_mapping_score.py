"""End-to-end --mappingScore / --minScoreFraction (SEMANTICS.md §9).

Every AS:i tag the CLI emits must equal the oracle's banded alignment score
for that record's (t, pos, strand), on both the chunked and unchunked wire
programs, SE and PE; --minScoreFraction must suppress low-scoring records
and re-derive mapped flags/counters."""

import numpy as np
import pytest

from rapmap_tpu.cli import main as cli_main
from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.encode import encode_reads
from rapmap_tpu.oracle.align import score_mapping_np
from tests.util import (
    random_transcriptome, sample_reads, write_fasta, write_fastq,
)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(99)
    root = tmp_path_factory.mktemp("mscore")
    txps = random_transcriptome(rng, n_txps=10, min_len=150, max_len=400)
    fa = write_fasta(str(root / "txome.fa"), txps)
    idxdir = str(root / "idx")
    assert cli_main(["quasiindex", "-t", fa, "-i", idxdir, "-k", "17"]) == 0
    reads = sample_reads(rng, txps, n_reads=60, read_len=60,
                         error_rate=0.04, n_frac=0.01)
    fq = write_fastq(str(root / "reads.fq"), reads)
    pairs = []
    comp = dict(zip(b"ACGT", b"TGCA"))
    for i in range(40):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        if len(seq) < 130:
            continue
        p = int(rng.integers(0, len(seq) - 120))
        left = bytearray(seq[p : p + 55])
        right = bytearray(seq[p + 60 : p + 115])
        for b in (left, right):  # sprinkle errors
            for j in range(len(b)):
                if rng.random() < 0.04:
                    b[j] = b"ACGT"[int(rng.integers(0, 4))]
        rc_right = bytes(comp.get(c, ord("N")) for c in reversed(right))
        pairs.append((f"p{i}", bytes(left), rc_right))
    fq1 = write_fastq(str(root / "r1.fq"), [(n, a) for n, a, _ in pairs])
    fq2 = write_fastq(str(root / "r2.fq"), [(n, b) for n, _, b in pairs])
    from rapmap_tpu.index.format import load_index

    return dict(root=root, idx=load_index(idxdir), idxdir=idxdir, fq=fq,
                fq1=fq1, fq2=fq2, reads=reads, pairs=pairs)


def _parse_sam(path):
    recs = []
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        tags = {x.split(":")[0]: x.split(":", 2)[2] for x in f[11:]}
        recs.append(dict(name=f[0], flag=int(f[1]), rname=f[2],
                         pos=int(f[3]), tags=tags))
    return recs


def _check_as(world, sam_path, read_seqs, cfg):
    idx = world["idx"]
    tid = {n: i for i, n in enumerate(idx.txp_names)}
    n_checked = 0
    for r in _parse_sam(sam_path):
        if r["flag"] & 0x4 or r["rname"] == "*" or "AS" not in r["tags"]:
            continue
        is_second = bool(r["flag"] & 0x80)
        seq = read_seqs[(r["name"], is_second)]
        codes = encode_reads(np.frombuffer(seq, dtype=np.uint8))
        strand = 1 if r["flag"] & 0x10 else 0
        want = score_mapping_np(
            idx, codes, tid[r["rname"]], r["pos"] - 1, strand,
            cfg.align_band, cfg.align_ma, cfg.align_mp, cfg.align_go,
            cfg.align_ge,
        )
        assert int(r["tags"]["AS"]) == want, (r, want)
        n_checked += 1
    return n_checked


@pytest.mark.parametrize("chunk", ["0", "16"])
def test_se_as_tags_match_oracle(world, tmp_path, chunk):
    out = str(tmp_path / f"se_{chunk}.sam")
    rc = cli_main([
        "quasimap", "-i", world["idxdir"], "-r", world["fq"], "-o", out,
        "--mappingScore", "--batchSize", "32", "--chunkSize", chunk,
    ])
    assert rc == 0
    seqs = {(n, False): s for n, s, *_ in world["reads"]}
    assert _check_as(world, out, seqs, MapConfig(k=17, mapping_score=True)) >= 40


@pytest.mark.parametrize("chunk", ["0", "16"])
def test_pe_as_tags_match_oracle(world, tmp_path, chunk):
    out = str(tmp_path / f"pe_{chunk}.sam")
    rc = cli_main([
        "quasimap", "-i", world["idxdir"], "-1", world["fq1"], "-2",
        world["fq2"], "-o", out, "--mappingScore", "--batchSize", "16",
        "--chunkSize", chunk,
    ])
    assert rc == 0
    seqs = {}
    for n, a, b in world["pairs"]:
        seqs[(n, False)] = a
        seqs[(n, True)] = b
    assert _check_as(world, out, seqs, MapConfig(k=17, mapping_score=True)) >= 30


def test_min_score_fraction_filters(world, tmp_path):
    """A read that anchors (exact k-mer) but is mostly garbage must map
    without filtering and become unmapped under a high threshold; clean
    reads survive. Counters must follow."""
    import json

    rng = np.random.default_rng(5)
    # rebuild transcript 0's sequence from the index text
    idx = world["idx"]
    text = np.asarray(idx.text)
    off = np.asarray(idx.txp_offsets)
    tl = np.asarray(idx.txp_lens)
    decode = np.array(list("_ACGT"))
    t0_seq = "".join(decode[text[off[0] : off[0] + tl[0]]])
    clean = t0_seq[10:70]
    junk = t0_seq[20:37] + "".join(
        "ACGT"[int(rng.integers(0, 4))] for _ in range(43)
    )
    fq = str(tmp_path / "mix.fq")
    with open(fq, "w") as f:
        f.write(f"@clean\n{clean}\n+\n{'I' * 60}\n@junk\n{junk}\n+\n{'I' * 60}\n")

    def run(frac, tag):
        out = str(tmp_path / f"f{tag}.sam")
        stats = str(tmp_path / f"f{tag}.json")
        rc = cli_main([
            "quasimap", "-i", world["idxdir"], "-r", fq, "-o", out,
            "--mappingScore", "--minScoreFraction", frac,
            "--batchSize", "8", "--statsJson", stats,
        ])
        assert rc == 0
        return _parse_sam(out), json.load(open(stats))

    recs0, st0 = run("0.0", "0")
    by0 = {r["name"]: r for r in recs0}
    assert not by0["clean"]["flag"] & 0x4
    assert not by0["junk"]["flag"] & 0x4, "junk read should map pre-filter"
    recs1, st1 = run("0.85", "85")
    by1 = {r["name"]: r for r in recs1}
    assert not by1["clean"]["flag"] & 0x4
    assert by1["junk"]["flag"] & 0x4, "junk read must be score-filtered"
    assert st1["reads_mapped"] == st0["reads_mapped"] - 1
    assert st1.get("score_filtered", 0) >= 1

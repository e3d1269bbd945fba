"""Mapping-score kernel (ops.align) vs numpy oracle (oracle.align) parity.

SEMANTICS.md §9: banded affine-gap read-global alignment of each mapping
candidate. The kernel's closed-form Gotoh row (exclusive prefix-max) must
equal the oracle's explicit three-state DP cell-for-cell."""

import numpy as np
import pytest

from rapmap_tpu.oracle.align import banded_score_np, score_mapping_np
from tests.util import toy_index


def _dev_scores(rcodes, rlens, wcodes, band, ma, mp, go, ge):
    import jax.numpy as jnp

    from rapmap_tpu.ops.align import banded_scores

    return np.asarray(
        banded_scores(
            jnp.asarray(rcodes, jnp.int32), jnp.asarray(rlens, jnp.int32),
            jnp.asarray(wcodes, jnp.int32), band, ma, mp, go, ge,
        )
    )


@pytest.mark.parametrize("band,params", [
    (7, (2, -4, 5, 3)),
    (3, (2, -4, 5, 3)),
    (5, (1, -3, 4, 4)),   # go == ge edge of the closed form
    (7, (3, -2, 9, 1)),
])
def test_banded_scores_vs_oracle_random(rng, band, params):
    ma, mp, go, ge = params
    N, L = 64, 40
    W = L + 2 * band
    rcodes = rng.integers(0, 4, size=(N, L)).astype(np.int32)
    wcodes = rng.integers(0, 4, size=(N, W)).astype(np.int32)
    rlens = rng.integers(8, L + 1, size=N).astype(np.int32)
    # plant structure: half the rows contain the (truncated) read verbatim,
    # some with point errors / indels, so high-score paths are exercised
    for i in range(0, N, 2):
        l = int(rlens[i])
        wcodes[i, band : band + l] = rcodes[i, :l]
        if i % 4 == 0 and l > 4:
            wcodes[i, band + l // 2] = (wcodes[i, band + l // 2] + 1) % 4
        if i % 8 == 0 and l > 6:  # delete one window char -> shift tail
            wcodes[i, band + l // 3 : band + l - 1] = wcodes[
                i, band + l // 3 + 1 : band + l
            ]
    # sprinkle invalid window positions (5) and read Ns (4)
    wcodes[rng.random((N, W)) < 0.05] = 5
    rcodes[rng.random((N, L)) < 0.03] = 4
    got = _dev_scores(rcodes, rlens, wcodes, band, ma, mp, go, ge)
    for i in range(N):
        l = int(rlens[i])
        want = banded_score_np(rcodes[i, :l], wcodes[i, : l + 2 * band],
                               band, ma, mp, go, ge)
        assert got[i] == want, f"row {i}: {got[i]} != {want}"


def test_banded_scores_known_values():
    band, ma, mp, go, ge = 7, 2, -4, 5, 3
    l = 30
    rng = np.random.default_rng(7)
    read = rng.integers(0, 4, size=l).astype(np.int32)

    def win_with(payload, off=band):
        w = rng.integers(0, 4, size=l + 2 * band).astype(np.int32)
        w[off : off + len(payload)] = payload
        return w

    perfect = win_with(read)
    mism = win_with(read.copy()); mism[band + 10] = (mism[band + 10] + 1) % 4
    # window carries one EXTRA char (deletion from the read's perspective):
    ins = win_with(np.insert(read, 12, (read[12] + 1) % 4))
    # read carries one extra char vs the window: drop window char 12
    dele = win_with(np.delete(read, 12))

    rcodes = np.stack([read] * 4)
    wcodes = np.stack([perfect, mism, ins, dele])
    rlens = np.full(4, l, np.int32)
    got = _dev_scores(rcodes, rlens, wcodes, band, ma, mp, go, ge)
    assert got[0] == ma * l
    assert got[1] == ma * (l - 1) + mp
    assert got[2] >= ma * l - go          # skip the inserted window char
    assert got[3] >= ma * (l - 1) - go    # one read char against a gap
    for i in range(4):
        want = banded_score_np(rcodes[i], wcodes[i], band, ma, mp, go, ge)
        assert got[i] == want


def test_score_records_vs_oracle_on_index(tmp_path, rng):
    """End-to-end window extraction + scoring on a real uploaded index,
    including negative positions, tail overhangs, rc strands, and N reads."""
    import jax.numpy as jnp

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.encode import encode_reads
    from rapmap_tpu.ops.align import score_records
    from rapmap_tpu.ops.device_index import upload_index

    idx, txps = toy_index(
        tmp_path / "idx", rng, n_txps=6, min_len=100, max_len=300, k=21
    )
    didx, _st = upload_index(idx)
    cfg = MapConfig(k=21, mapping_score=True)

    L = 48
    B = 32
    codes = np.full((B, L), 5, np.int8)
    lens = np.zeros(B, np.int32)
    t = np.zeros(B, np.int32)
    pos = np.zeros(B, np.int32)
    strand = np.zeros(B, np.int32)
    tl = np.asarray(idx.txp_lens)
    for i in range(B):
        ti = int(rng.integers(0, len(txps)))
        li = int(rng.integers(24, L + 1))
        seq = bytearray(txps[ti][1][: li])
        for j in range(li):
            r = rng.random()
            if r < 0.06:
                seq[j] = b"ACGT"[int(rng.integers(0, 4))]
            elif r < 0.08:
                seq[j] = ord("N")
        c = encode_reads(np.frombuffer(bytes(seq), dtype=np.uint8))
        codes[i, :li] = c
        lens[i] = li
        t[i] = ti
        # positions beyond both ends to exercise the transcript masking
        pos[i] = int(rng.integers(-10, int(tl[ti]) + 5))
        strand[i] = int(rng.integers(0, 2))
    # regression: windows hanging off the HEAD of transcript 0 (global text
    # position < 0) must stay word-aligned (per-word clipped gathers)
    for i, p in zip(range(4), (-5, 0, 2, 5)):
        t[i] = 0
        pos[i] = p
        li = int(lens[i])
        codes[i, :li] = encode_reads(
            np.frombuffer(txps[0][1][: li], dtype=np.uint8)
        )
        strand[i] = 0
    valid = np.ones(B, bool)
    valid[B - 2 :] = False  # dead rows must score 0

    got = np.asarray(
        score_records(
            didx, cfg, jnp.asarray(codes), jnp.asarray(lens),
            jnp.asarray(np.arange(B, dtype=np.int32)), jnp.asarray(t),
            jnp.asarray(pos), jnp.asarray(strand), jnp.asarray(valid),
        )
    )
    for i in range(B):
        if not valid[i]:
            assert got[i] == 0
            continue
        want = score_mapping_np(
            idx, codes[i, : lens[i]], int(t[i]), int(pos[i]), int(strand[i]),
            cfg.align_band, cfg.align_ma, cfg.align_mp, cfg.align_go,
            cfg.align_ge,
        )
        assert got[i] == want, f"row {i}: {got[i]} != {want}"

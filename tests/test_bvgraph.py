"""BVGraph ingestion bridge vs the reference's own preprocessed binaries.

Every dataset in the reference repo ships as BVGraph (.graph/.properties/
.offsets) ALONGSIDE its source CSV — the decoder is validated by exact
edge-set equality against those CSVs (both orientations), and end-to-end by
reproducing a reference golden number from BVGraph input alone.
"""

import csv
import os

import pytest

from avgdist_rs_spark.sources.bvgraph import (
    bvgraph_graphframe,
    decode_bvgraph,
    read_bvgraph,
    read_offsets,
    read_properties,
)

ER_DIR = "/root/reference/data/erdos-renyi"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{ER_DIR}/1k-0001p.graph"), reason="reference data absent"
)


def _csv_pairs(path: str) -> set[tuple[int, int]]:
    with open(path) as f:
        return {(int(a), int(b)) for a, b in csv.reader(f)}


@pytest.mark.parametrize("name,src", [
    ("1k-0001p", "1k-0.001p.csv"),
    ("2k-0001p", "2k-0.001p.csv"),
    ("5k-0001p", "5k-0.001p.csv"),
])
def test_decode_matches_reference_csv_both_orientations(name, src):
    want = _csv_pairs(f"{ER_DIR}/{src}")
    s, d, n = decode_bvgraph(f"{ER_DIR}/{name}")
    assert set(zip(s.tolist(), d.tolist())) == want
    st, dt, nt = decode_bvgraph(f"{ER_DIR}/{name}-t")
    assert set(zip(st.tolist(), dt.tolist())) == {(b, a) for a, b in want}
    assert n == nt == int(read_properties(f"{ER_DIR}/{name}")["nodes"])


def test_offsets_cover_stream():
    props = read_properties(f"{ER_DIR}/1k-0001p")
    offs = read_offsets(f"{ER_DIR}/1k-0001p", int(props["nodes"]))
    assert offs[0] == 0 and int(offs[-1]) == int(props["length"])
    assert (offs[1:] >= offs[:-1]).all()


def test_distributed_reader_equals_sequential(spark):
    """Split-parallel decode (offsets-placed boundaries + windowsize warm-up)
    must produce the exact arc set of the sequential pass."""
    base = f"{ER_DIR}/5k-0001p"
    edges, n = read_bvgraph(spark, base, num_splits=13)  # odd split count on purpose
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    s, d, _ = decode_bvgraph(base)
    assert got == set(zip(s.tolist(), d.tolist()))
    assert n == 5000


def test_golden_from_bvgraph_ingestion(spark):
    """End to end: the er-1k exact avgdist golden (3.706478 / diameter 13,
    reference data/erdos-renyi/result/1k-0001p-uni-exact.out) reproduced from
    the reference's BVGraph binaries alone — no CSV anywhere in the path."""
    from avgdist_rs_spark.operators.avgdist import exact_avgdist

    g = bvgraph_graphframe(spark, f"{ER_DIR}/1k-0001p")
    try:
        r = exact_avgdist(g)
        assert round(r["avg_distance"], 6) == 3.706478
        assert r["diameter"] == 13
    finally:
        g.unpersist()


def test_wiki_bvgraph_matches_csv_through_node_labels(spark):
    """The wiki BVGraph's dense ids map through wiki.nodes to the same labeled
    edge set as wiki.csv (the goldens' input)."""
    wdir = "/root/reference/data/wikipedia-vote-network"
    if not os.path.exists(f"{wdir}/wiki.graph"):
        pytest.skip("wiki data absent")
    s, d, n = decode_bvgraph(f"{wdir}/wiki")
    with open(f"{wdir}/wiki.nodes") as f:
        labels = [ln.strip() for ln in f]
    assert len(labels) == n
    got = {(labels[a], labels[b]) for a, b in zip(s.tolist(), d.tolist())}
    with open(f"{wdir}/wiki.csv") as f:
        want = {(a, b) for a, b in csv.reader(f)}
    assert got == want


def test_distributed_reader_on_chained_references(spark):
    """brightkite (real WebGraph output, heavy reference chains): split-
    parallel decode across boundaries where records reference nodes up to
    maxrefcount·windowsize back — regression for the offsets-resolver path."""
    base = "/root/reference/data/brightkite/brightkite"
    if not os.path.exists(base + ".graph"):
        pytest.skip("brightkite data absent")
    edges, n = read_bvgraph(spark, base, num_splits=8)
    got = edges.count()
    s, d, _ = decode_bvgraph(base)
    assert got == len(s) == 428156
    # checksum equality, not just counts
    from pyspark.sql import functions as F

    chk_dist = edges.agg(F.bit_xor(F.xxhash64("src", "dst")).alias("x")).collect()[0]["x"]
    import pandas as pd

    seq = spark.createDataFrame(pd.DataFrame({"src": s, "dst": d}))
    chk_seq = seq.agg(F.bit_xor(F.xxhash64("src", "dst")).alias("x")).collect()[0]["x"]
    assert chk_dist == chk_seq


import numpy as np


def _encode_gamma(values) -> bytes:
    bb = "".join(
        "0" * ((int(v) + 1).bit_length() - 1) + format(int(v) + 1, "b")
        for v in values
    )
    pad = (-len(bb)) % 8
    return int(bb + "0" * pad, 2).to_bytes((len(bb) + pad) // 8, "big") if bb else b""


def test_gamma_stream_matches_bitreader_on_random_streams():
    """Speculative parallel decoder == BitReader, including multi-window
    resume down to 16-byte windows (every resume lands on a code boundary)."""
    from avgdist_rs_spark.sources.bvgraph import BitReader, decode_gamma_stream

    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(1, 2500))
        vals = (
            rng.integers(0, 6, size=n)
            if trial % 2
            else rng.integers(0, 100000, size=n)
        )
        data = _encode_gamma(vals)
        r = BitReader(data)
        want = [r.read_gamma() for _ in range(n)]
        assert want == list(vals)
        for wb in (1 << 26, 256, 16):
            got = decode_gamma_stream(data, n, window_bytes=wb)
            assert got.tolist() == want, (trial, wb)


def test_gamma_stream_truncation_raises():
    from avgdist_rs_spark.sources.bvgraph import decode_gamma_stream

    data = _encode_gamma([3, 5, 7] * 50)
    with pytest.raises(ValueError, match="exhausted"):
        decode_gamma_stream(data, 1000)


def test_gamma_stream_large_values_and_zero_runs():
    """z up to 30 (8-byte value-window path) and all-zero values (1-bit
    codes, densest possible one-stream)."""
    from avgdist_rs_spark.sources.bvgraph import decode_gamma_stream

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**30, size=20000)
    assert decode_gamma_stream(_encode_gamma(vals), len(vals)).tolist() == list(vals)
    zeros = [0] * 5000
    assert decode_gamma_stream(_encode_gamma(zeros), 5000).tolist() == zeros

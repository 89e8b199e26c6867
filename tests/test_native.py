"""Native C++ layer tests: parse+encode and pack must be bit-identical to
the pure-Python/NumPy fallbacks on every input shape."""

import os

import numpy as np
import pytest

from swtpu import native
from swtpu.io import fasta
from swtpu.ops.xla_sw import PAD_SUBJECT

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")

RNG = np.random.default_rng(5)


def _python_parse(data: bytes):
    recs = fasta._split_records(data)
    recs = [(h, b) for h, b in recs if h or b]
    from swtpu.alphabet import encode_bytes

    lengths = np.fromiter((len(b) for _, b in recs), count=len(recs), dtype=np.int64)
    offsets = np.zeros(len(recs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return encode_bytes(b"".join(b for _, b in recs)), offsets


CASES = [
    b"",
    b">a\nMKTA\n",
    b">a\nMKTA",  # no trailing newline
    b">a\r\nMK\r\nTA\r\n>b\r\nWWW\r\n",  # CRLF
    b"garbage before\n>a\nMK TA\n>b\n\n>c\nRRR\n",  # whitespace in body, empty body
    b"ACGTACGT\nTTTT\n",  # headerless file
    b">only-header-no-body",
    b">a\nMK>TA\n>b\nX\n",  # '>' mid-line is body content
    b">\n\n>\n\n",  # empty headers and bodies -> all dropped
    b">a\nM\n>a2\n" + b"WKLM" * 500 + b"\n",
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_native_parse_matches_python(data):
    got = native.parse_fasta_bytes(data)
    assert got is not None
    res_n, off_n = got
    res_p, off_p = _python_parse(data)
    np.testing.assert_array_equal(off_n, off_p)
    np.testing.assert_array_equal(res_n, res_p)


def test_native_parse_random_fasta_roundtrip(tmp_path):
    seqs = ["".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, int(RNG.integers(1, 300)))) for _ in range(50)]
    path = tmp_path / "db.fasta"
    fasta.write_fasta(path, seqs)
    db = fasta.parse_database(path)  # native path
    os.environ["SWTPU_NO_NATIVE"] = "1"
    try:
        db_py = fasta.parse_database(path)  # python fallback
    finally:
        del os.environ["SWTPU_NO_NATIVE"]
    np.testing.assert_array_equal(db.offsets, db_py.offsets)
    np.testing.assert_array_equal(db.residues, db_py.residues)
    assert db.n == 50


def test_native_pack_segments_matches_python():
    from swtpu.alphabet import decode
    from swtpu.utils import segpack

    seqs = [decode(RNG.integers(0, 25, int(RNG.integers(5, 120))).astype(np.int8)) for _ in range(30)]
    db = fasta.database_from_sequences(seqs)
    batch = segpack.plan_segments(db.lengths, np.arange(db.n), width=256, s_max=4)[0]
    got = native.pack_segments_native(db.residues, db.offsets, batch.ids, batch.starts, batch.width, PAD_SUBJECT)
    assert got is not None
    os.environ["SWTPU_NO_NATIVE"] = "1"
    try:
        want = segpack.pack_segments(db, batch)
    finally:
        del os.environ["SWTPU_NO_NATIVE"]
    np.testing.assert_array_equal(got, want)


def test_native_pack_matches_numpy():
    from swtpu.utils.bucketing import Batch, pack_batch

    from swtpu.alphabet import decode

    seqs = [RNG.integers(0, 25, int(RNG.integers(1, 90))).astype(np.int8) for _ in range(20)]
    db = fasta.database_from_sequences([decode(s) for s in seqs])
    batch = Batch(ids=np.arange(12, dtype=np.int32), rows=16, width=128)
    got = native.pack_batch_native(db.residues, db.offsets, batch.ids, batch.rows, batch.width, PAD_SUBJECT)
    assert got is not None
    os.environ["SWTPU_NO_NATIVE"] = "1"
    try:
        want = pack_batch(db, batch)
    finally:
        del os.environ["SWTPU_NO_NATIVE"]
    np.testing.assert_array_equal(got, want)


def test_pack_bucket_T_matches_numpy():
    """Native transposed wavefront-bucket packer == gather + transpose."""
    import numpy as np

    from swtpu import native
    from swtpu.io.fasta import database_from_sequences
    from swtpu.ops import wave_sw
    from swtpu.ops.xla_sw import PAD_SUBJECT
    from swtpu.utils.bucketing import Batch, pack_batch

    if native.load() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(8)
    seqs = ["".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, int(n))) for n in rng.integers(1, 90, 37)]
    db = database_from_sequences(seqs)
    ids = np.arange(37, dtype=np.int32)
    width, bpad = 96, 128
    got = native.pack_bucket_T_native(db.residues, db.offsets, ids, width + 32, bpad, PAD_SUBJECT)
    flat = pack_batch(db, Batch(ids=ids, rows=bpad, width=width))
    want = wave_sw.transpose_pad(flat, width)
    np.testing.assert_array_equal(got, want)

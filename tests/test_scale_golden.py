"""Scale-out golden test (VERDICT round-1 item 4).

A 10k-sequence SwissProt-shaped database is large enough that the engine's
width ladder, segment packer, multiclass bin packer, and rescore paths all
actually engage (the 111-record subset golden exercises a tiny fraction of
those shapes).  The golden scores were produced by the NumPy anti-diagonal
oracle (tools/make_goldens.py --scale), which is itself anchored to the
reference's cpu.cpp by tests/test_cpu_cpp_differential.py.

Mirrors the reference's Comparison pattern
(/root/reference/test/swissprot_tests.cpp:60-95) at a committed-data scale.
"""

from pathlib import Path

import numpy as np
import pytest

from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences, parse_query
from swtpu.models.search import SearchEngine

GOLDEN = Path(__file__).parent / "data" / "golden_P02232_scale10k.txt"
QUERY = Path(__file__).parent / "data" / "queries" / "P02232.fasta"


@pytest.fixture(scope="module")
def scale_db():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.make_goldens import synth_scale_db

    seqs = synth_scale_db(10_000)
    from swtpu.alphabet import decode

    return database_from_sequences([decode(s) for s in seqs])


@pytest.fixture(scope="module")
def golden():
    return np.array([int(x) for x in GOLDEN.read_text().split()], dtype=np.int32)


@pytest.fixture(scope="module")
def query():
    return parse_query(QUERY)


@pytest.mark.slow
def test_scale_golden_default_engine(scale_db, golden, query):
    """Default engine (segpack + fast16 on CPU; wavefront on TPU) over the
    full 10k database (width ladder / segment packer / bin packer engage at
    this scale; saturation-rescore is covered by test_sat_case_golden)."""
    eng = SearchEngine(SWConfig())
    res = eng.search(query, scale_db)
    assert res.scores.shape == (10_000,)
    assert golden[-1] > 900  # planted tandem-repeat: strong hit
    np.testing.assert_array_equal(res.scores, golden)


@pytest.mark.slow
def test_scale_golden_no_segpack(scale_db, golden, query):
    """Pure width-ladder path (segment packing off)."""
    eng = SearchEngine(SWConfig(segment_packing=False, use_wave=False))
    res = eng.search(query, scale_db)
    np.testing.assert_array_equal(res.scores, golden)


@pytest.mark.slow
def test_scale_golden_int16_mode(scale_db, golden, query):
    """Narrow-type saturating mode with exact rescore (legacy-char parity)."""
    eng = SearchEngine(SWConfig(score_dtype="int16"))
    res = eng.search(query, scale_db)
    np.testing.assert_array_equal(res.scores, golden)


@pytest.mark.slow
def test_scale_golden_wave_sample(scale_db, golden, query):
    """Wavefront kernel (interpret on CPU) on a 200-sequence sample."""
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    idx = np.concatenate([np.arange(0, 10_000, 50), [9999]])  # incl. planted
    from swtpu.alphabet import decode

    sample = database_from_sequences([decode(scale_db.sequence(int(i))) for i in idx])
    eng = SearchEngine(SWConfig(use_wave=True, interpret=not on_tpu))
    res = eng.search(query, sample)
    np.testing.assert_array_equal(res.scores, golden[idx])


GOLDEN_SAT = Path(__file__).parent / "data" / "golden_sat_case.txt"


@pytest.mark.slow
def test_sat_case_golden_forces_rescore():
    """Saturation golden: a 4000-aa query whose clone (id 0) exceeds the
    wide-ladder fast16 ceiling and whose 350-W run (id 1) exceeds the
    packed-row class ceiling — both must be rescored exactly."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.make_goldens import synth_sat_case
    from swtpu.alphabet import decode
    from swtpu.io.fasta import Query

    query_res, seqs = synth_sat_case()
    db = database_from_sequences([decode(s) for s in seqs])
    q = Query(name="sat", residues=query_res, raw="")
    golden = np.array([int(x) for x in GOLDEN_SAT.read_text().split()], dtype=np.int32)
    assert golden[0] > 24576 and golden[1] > 3950  # above both ceilings

    res = SearchEngine(SWConfig(use_wave=False)).search(q, db)
    np.testing.assert_array_equal(res.scores, golden)
    res16 = SearchEngine(SWConfig(score_dtype="int16")).search(q, db)
    np.testing.assert_array_equal(res16.scores, golden)

"""Device telo-scan kernel, BED-region reader, profiling hook."""

import io

import numpy as np

from cornetto_tpu.kernels.minimizer import encode_seq
from cornetto_tpu.kernels.telo_scan import telo_run_stats_jax


def test_telo_scan_stats():
    import jax.numpy as jnp
    telo = "TTAGGG"
    motif = tuple(int(c) for c in encode_seq(telo))
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    rand = lambda n: "".join(bases[rng.integers(0, 4, n)])
    reads = [
        telo * 10 + rand(200),          # terminal run of 10 copies
        rand(100) + telo * 5 + rand(100),  # internal run of 5
        rand(260),                       # no telomere
        telo * 3 + rand(100) + telo * 7 + rand(58),
    ]
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode_seq(r)
    n, longest, terminal = telo_run_stats_jax(jnp.asarray(codes), motif)
    n, longest, terminal = (np.asarray(x) for x in (n, longest, terminal))
    assert longest[0] >= 10 and terminal[0]
    assert longest[1] == 5 and not terminal[1]
    assert n[2] == 0 and longest[2] == 0
    # terminal requires >= ceil(24/6)=4 copies at position 0; run[0]=3 -> F
    assert longest[3] == 7 and not terminal[3]


def test_read_bed_regions(tmp_path):
    from cornetto_tpu.io.bed import read_bed_regions
    p = tmp_path / "r.bed"
    p.write_text("chr1\t10\t20\nchr2\t0\t5\n")
    assert read_bed_regions(str(p)) == ["chr1:10-20", "chr2:0-5"]


def test_maybe_trace_logs(capsys):
    from cornetto_tpu.utils.profiling import maybe_trace
    with maybe_trace("unit-test-section"):
        pass
    err = capsys.readouterr().err
    assert "unit-test-section in" in err

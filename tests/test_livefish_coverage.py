"""Aligner-free coverage estimation (livefish.coverage): tally accuracy
against known read sampling, bedgraph emission, and the approximate-panel
chain into boringbits."""

import os

import numpy as np
import pytest

from cornetto_tpu.kernels.minimizer import encode_seq
from cornetto_tpu.livefish.coverage import (CoverageParams, CoverageTally,
                                            stream_coverage)
from cornetto_tpu.livefish.decide import SingleChipEngine
from cornetto_tpu.livefish.index import build_index, build_panel_mask

BASES = np.array(list("ACGT"))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(17)
    genome = {
        "ctgA": "".join(BASES[rng.integers(0, 4, 100000)]),
        "ctgB": "".join(BASES[rng.integers(0, 4, 50000)]),
    }
    idx = build_index(genome, n_shards=1)
    panel = np.zeros((2, 128), dtype=bool)
    eng = SingleChipEngine(idx, panel)
    # ~18x coverage of ctgA only, uniform; ctgB gets nothing
    L = 450
    n_reads = 100000 * 18 // L
    reads = np.empty((n_reads, L), dtype=np.uint8)
    starts = rng.integers(0, 100000 - L, size=n_reads)
    for i, s in enumerate(starts):
        reads[i] = encode_seq(genome["ctgA"][s:s + L])
    d = tmp_path_factory.mktemp("cov")
    fq = str(d / "reads.fq")
    with open(fq, "w") as f:
        for i in range(n_reads):
            seq = "".join("ACGT"[c] for c in reads[i])
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, "I" * L))
    return genome, idx, eng, fq, str(d)


def test_tally_matches_known_coverage(setup):
    genome, idx, eng, fq, d = setup
    tally = CoverageTally(idx, CoverageParams())
    total, accepted = stream_coverage(eng, tally, fq, batch=512)
    assert total == 4000 and accepted == 4000   # empty panel: accept all
    t = tally.counts()
    # ctgA interior bins should be ~18x (bases/bin ~= 18000); ctgB zero
    binsA = t[0, 0, 5:90]     # away from edges
    depthA = binsA / 1000.0
    assert abs(float(np.mean(depthA)) - 18.0) < 2.0
    assert float(np.min(depthA)) > 8.0
    assert int(t[0, 1].sum()) == 0
    # hq track tracks the total for clean unique reads
    assert int(t[1, 0].sum()) > 0.8 * int(t[0, 0].sum())


def test_alignerfree_panel_end_to_end(tmp_path):
    """Full aligner-free iteration at create-cornetto's real protocol
    scale (Mb contigs): reads -> livefish coverage tracks ->
    create-cornetto panel, no minimap2/samtools anywhere."""
    from cornetto_tpu.pipelines import create_cornetto
    rng = np.random.default_rng(31)
    genome = {
        "big": "".join(BASES[rng.integers(0, 4, 2500000)]),
        "small": "".join(BASES[rng.integers(0, 4, 300000)]),
    }
    idx = build_index(genome, n_shards=1)
    eng = SingleChipEngine(idx, np.zeros((2, 128), dtype=bool))
    # ~8x uniform coverage of `big` EXCEPT a coverage hole at 1.0-1.1 Mb
    # (an unresolved region that must stay out of the reject panel);
    # `small` (<800 kb) is excluded by the pipeline as a short contig
    L = 450
    tally = CoverageTally(idx, CoverageParams())
    n_reads = 2500000 * 8 // L
    batch, rows_buf, lens = 2048, [], []
    g = genome["big"]

    def flush():
        from cornetto_tpu.kernels.minimizer import pack_reads
        rows = np.full((batch, L), 4, dtype=np.uint8)
        ln = np.zeros(batch, dtype=np.int32)
        for i, s in enumerate(rows_buf):
            rows[i] = encode_seq(g[s:s + L])
            ln[i] = L
        packed, _ = pack_reads(rows)
        res = eng.decide_packed(packed, None, L, lengths=ln)
        tally.update(res[1], res[2], res[5], res[3], res[4], ln)

    kept = 0
    while kept < n_reads:
        s = int(rng.integers(0, 2500000 - L))
        if 1000000 - L < s < 1100000:
            continue   # the hole
        rows_buf.append(s)
        kept += 1
        if len(rows_buf) == batch:
            flush()
            rows_buf = []
    if rows_buf:
        flush()

    prefix = str(tmp_path / "draft")
    with open(prefix + ".fasta", "w") as f:
        for name, seq in genome.items():
            f.write(">%s\n%s\n" % (name, seq))
    tally.write_bedgraphs(prefix + ".cov-total.bg", prefix + ".cov-mq20.bg")
    with open(prefix + ".bp.p_ctg.lowQ.bed", "w"):
        pass   # no hifiasm lowQ regions in this synthetic run
    ret = create_cornetto.run(prefix + ".fasta", out_dir=str(tmp_path),
                              backend="numpy", ranged_bedgraph=True)
    assert ret == 0
    out_bed = str(tmp_path / "draft.boringbits.bed")
    rows = [l.split("\t") for l in open(out_bed).read().splitlines()]
    # the reject panel covers only the well-covered contig...
    assert rows and all(r[0] == "big" for r in rows)
    panel_bp = sum(int(r[2]) - int(r[1]) for r in rows)
    assert panel_bp > 1000000
    # ...and excludes the coverage hole (+-40 kb extension around it)
    for r in rows:
        st, en = int(r[1]), int(r[2])
        assert en <= 960000 or st >= 1140000, r
    assert os.path.exists(str(tmp_path / "draft.boringbits.txt"))


def test_bedgraph_feeds_boringbits(setup):
    """The emitted bedgraphs must run through the existing boringbits tool
    (approximate panel mode): well-covered ctgA interior is boring; the
    uncovered ctgB violates everywhere."""
    import io
    from cornetto_tpu.tools.boringbits import BoringbitsOptions, run
    genome, idx, eng, fq, d = setup
    tally = CoverageTally(idx, CoverageParams())
    stream_coverage(eng, tally, fq, batch=512)
    tot = os.path.join(d, "c.cov-total.bg")
    mq = os.path.join(d, "c.cov-mq20.bg")
    tally.write_bedgraphs(tot, mq)
    # bedgraph sanity: covers every contig base exactly once
    seen = {}
    with open(tot) as f:
        for line in f:
            name, st, en, dep = line.split("\t")
            seen.setdefault(name, 0)
            assert int(st) == seen[name]
            seen[name] = int(en)
    assert seen == {"ctgA": 100000, "ctgB": 50000}
    out = io.StringIO()
    opt = BoringbitsOptions(boring=False, min_ctg_len=10000, edge_len=2000,
                            backend="numpy", ranged_bedgraph=True)
    run(tot, mq, opt, out=out)
    rows = [l.split("\t") for l in out.getvalue().splitlines()]
    # ctgB is fully fun (uncovered -> low-coverage violations)
    assert any(r[0] == "ctgB" and r[3] != "." for r in rows
               if len(r) > 3)
    # ctgA interior must be mostly boring: few violation windows
    viol_a = [r for r in rows if r[0] == "ctgA" and len(r) > 3
              and r[3] not in (".",) and int(r[1]) > 5000
              and int(r[2]) < 95000]
    assert len(viol_a) < 25, viol_a[:5]

"""Streaming loop, checkpoint round-trip, refine pipeline, readfish config."""

import io
import os

import numpy as np

from cornetto_tpu.dist.checkpoint import load_index, save_index
from cornetto_tpu.io.readfish import write_readfish_toml, write_targets_csv
from cornetto_tpu.kernels.minimizer import encode_seq
from cornetto_tpu.livefish.decide import SingleChipEngine
from cornetto_tpu.livefish.index import build_index, build_panel_mask
from cornetto_tpu.livefish.stream import stream_decisions
from cornetto_tpu.pipelines import refine

BASES = np.array(list("ACGT"))


def _genome(rng, sizes):
    return {n: "".join(BASES[rng.integers(0, 4, s)])
            for n, s in sizes.items()}


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    genome = _genome(rng, {"a": 5000, "b": 3000})
    idx = build_index(genome, n_shards=2)
    panel = build_panel_mask(idx, [("a", 0, 2000)])
    path = str(tmp_path / "ckpt")
    save_index(path, idx, panel_mask=panel,
               tallies={"accepted": np.array([5, 7])})
    idx2, panel2, tallies = load_index(path)
    np.testing.assert_array_equal(idx.hashes, idx2.hashes)
    np.testing.assert_array_equal(idx.contigs, idx2.contigs)
    np.testing.assert_array_equal(panel, panel2)
    assert idx2.contig_names == ["a", "b"]
    np.testing.assert_array_equal(tallies["accepted"], [5, 7])


def test_stream_decisions(tmp_path):
    rng = np.random.default_rng(2)
    genome = _genome(rng, {"ctgA": 20000})
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, [("ctgA", 0, 10000)])
    eng = SingleChipEngine(idx, panel)
    eng.contig_names = idx.contig_names
    fq = tmp_path / "reads.fastq"
    with fq.open("w") as f:
        for i in range(10):
            s = int(rng.integers(0, 19000 - 500))
            seq = genome["ctgA"][s:s + 500]
            f.write("@r%d_%d\n%s\n+\n%s\n" % (i, s, seq, "I" * len(seq)))
    out = io.StringIO()
    total, accepted = stream_decisions(eng, str(fq), batch=4, read_len=450,
                                       out=out)
    assert total == 10
    rows = [l.split("\t") for l in out.getvalue().splitlines()]
    assert len(rows) == 10
    for rid, decision, ctg, pos, nhits in rows:
        start = int(rid.split("_")[1])
        in_panel = start + 225 < 10000
        if int(nhits) >= 3:
            assert ctg == "ctgA"
            assert decision == ("unblock" if in_panel else "proceed")


def test_refine_pipeline(tmp_path):
    rng = np.random.default_rng(3)
    chrA = "".join(BASES[rng.integers(0, 4, 30000)])
    chrB = "".join(BASES[rng.integers(0, 4, 25000)])
    chrC = "".join(BASES[rng.integers(0, 4, 20000)])
    # iter1: A complete (2 telos); iter2: A again (contained) + B newfound;
    # last iter also contributes non-T2T contig C (not contained) and a
    # fragment of A (contained -> dropped)
    it1 = tmp_path / "asm1.fasta"
    it1.write_text(">cA\n%s\n>frag\n%s\n" % (chrA, chrC[:5000]))
    t1 = tmp_path / "t1.bed"
    t1.write_text("cA\t0\t100\ncA\t29900\t30000\n")
    it2 = tmp_path / "asm2.fasta"
    it2.write_text(">cA2\n%s\n>cB\n%s\n>cC\n%s\n>fragA\n%s\n"
                   % (chrA, chrB, chrC, chrA[:8000]))
    t2 = tmp_path / "t2.bed"
    t2.write_text("cA2\t0\t100\ncA2\t29900\t30000\ncB\t0\t100\n"
                  "cB\t24900\t25000\n")
    out = io.StringIO()
    final = refine.run([(str(it1), str(t1)), (str(it2), str(t2))],
                       str(tmp_path / "curated"), min_contig_len=10000,
                       labels=["A_1", "A_2"], out=out)
    names = [l[1:].strip() for l in open(final) if l.startswith(">")]
    assert "A_1_t2t_cA" in names          # base T2T
    assert "A_2_t2t_cB" in names          # newfound T2T
    assert "A_2_t2t_cA2" not in names     # contained duplicate dropped
    assert "A_2_nont2t_cC" in names       # newfound non-T2T on last iter
    assert "A_2_nont2t_fragA" not in names  # contained fragment dropped


def test_readfish_outputs():
    out = io.StringIO()
    write_targets_csv(out, [("c", 0, 10)])
    assert out.getvalue() == "c,0,10,+\nc,0,10,-\n"
    out = io.StringIO()
    write_readfish_toml(out, reference_mmi="ref.mmi", targets_csv="t.csv")
    text = out.getvalue()
    assert 'reference = "ref.mmi"' in text
    assert 'single_on = "unblock"' in text


def _mk_engine(rng, genome):
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, [(next(iter(genome)), 0, 10000)])
    eng = SingleChipEngine(idx, panel)
    eng.contig_names = idx.contig_names
    return eng


def test_native_stream_matches_python(tmp_path):
    """The native fastq_pack fast path emits byte-identical TSV to the
    Python parse/encode/pack chain — including reads with interior Ns,
    short reads, and a partial final batch."""
    from cornetto_tpu.livefish.stream import _stream_decisions_py
    rng = np.random.default_rng(5)
    genome = _genome(rng, {"ctgA": 20000})
    eng = _mk_engine(rng, genome)
    fq = tmp_path / "mixed.fastq"
    with fq.open("w") as f:
        for i in range(23):          # odd count -> partial batch of 23%8
            s = int(rng.integers(0, 19000 - 500))
            seq = list(genome["ctgA"][s:s + int(rng.integers(80, 500))])
            if i % 5 == 0 and len(seq) > 50:   # sprinkle interior Ns
                for p in rng.integers(10, len(seq) - 10, size=3):
                    seq[int(p)] = "N"
            seq = "".join(seq)
            f.write("@r%d xtra comment\n%s\n+\n%s\n" % (i, seq,
                                                        "I" * len(seq)))
    o_native, o_py = io.StringIO(), io.StringIO()
    tn = stream_decisions(eng, str(fq), batch=8, read_len=450, out=o_native)
    tp = _stream_decisions_py(eng, str(fq), 8, 450, o_py)
    assert tn == tp == (23, tn[1])
    assert o_native.getvalue() == o_py.getvalue()


def test_native_stream_gzip(tmp_path):
    import gzip
    rng = np.random.default_rng(6)
    genome = _genome(rng, {"ctgA": 20000})
    eng = _mk_engine(rng, genome)
    fq = tmp_path / "reads.fastq"
    body = []
    for i in range(9):
        s = int(rng.integers(0, 19000 - 500))
        seq = genome["ctgA"][s:s + 500]
        body.append("@r%d\n%s\n+\n%s\n" % (i, seq, "I" * len(seq)))
    fq.write_text("".join(body))
    gz = tmp_path / "reads.fastq.gz"
    gz.write_bytes(gzip.compress("".join(body).encode()))
    o1, o2 = io.StringIO(), io.StringIO()
    assert stream_decisions(eng, str(fq), batch=4, read_len=450, out=o1) \
        == stream_decisions(eng, str(gz), batch=4, read_len=450, out=o2)
    assert o1.getvalue() == o2.getvalue()


def test_native_stream_fasta_falls_back(tmp_path):
    """A FASTA input is not single-line FASTQ: the native probe rejects it
    and the tolerant Python path serves it with no duplicate output."""
    rng = np.random.default_rng(7)
    genome = _genome(rng, {"ctgA": 20000})
    eng = _mk_engine(rng, genome)
    fa = tmp_path / "reads.fasta"
    with fa.open("w") as f:
        for i in range(6):
            s = int(rng.integers(0, 19000 - 500))
            f.write(">r%d\n%s\n" % (i, genome["ctgA"][s:s + 500]))
    out = io.StringIO()
    total, accepted = stream_decisions(eng, str(fa), batch=4, read_len=450,
                                       out=out)
    assert total == 6
    assert len(out.getvalue().splitlines()) == 6


def test_native_packer_unit(tmp_path):
    """Unit-level parity of native/fastq_pack vs pack_reads on crafted
    records (CRLF line ends, name-only headers, qual '@' first char)."""
    pytest = __import__("pytest")
    from cornetto_tpu.kernels.minimizer import pack_reads
    from cornetto_tpu.native.fastq_pack import (NativeParseError,
                                                iter_packed_batches)
    fq = tmp_path / "u.fastq"
    seqs = ["ACGTN" * 20, "A" * 7, "GATTACA" * 30]
    with fq.open("wb") as f:
        f.write(("@a one\r\n%s\r\n+\r\n%s\r\n" % (seqs[0],
                                                  "@" * len(seqs[0]))
                 ).encode())
        f.write(("@b\n%s\n+b\n%s\n" % (seqs[1], "I" * len(seqs[1]))
                 ).encode())
        # final record without trailing newline on the qual line
        f.write(("@c\n%s\n+\n%s" % (seqs[2], "#" * len(seqs[2]))).encode())
    try:
        (pb,) = list(iter_packed_batches(str(fq), 4, 100))
    except NativeParseError:
        pytest.skip("no C toolchain")
    assert pb.ids[:3] == ["a", "b", "c"]
    codes = np.full((3, 100), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        c = encode_seq(s[:100])
        codes[i, :len(c)] = c
    pk, nm = pack_reads(np.where(codes == 4, 0, codes))
    np.testing.assert_array_equal(pb.packed[:3], pk[:3])
    np.testing.assert_array_equal(pb.lengths[:3], [100, 7, 100])
    assert pb.nmask is not None          # seq[0] has interior Ns
    # N bits: every 5th base of read 0 within its packed 100
    want = np.zeros((3, 104), dtype=np.uint8)
    want[0, 4:100:5] = 1
    np.testing.assert_array_equal(
        np.unpackbits(pb.nmask[:3], axis=1, bitorder="little"), want)

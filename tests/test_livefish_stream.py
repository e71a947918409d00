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

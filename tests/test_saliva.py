"""Saliva helpers: human-read extraction + non-human contig panel."""

import io

from cornetto_tpu.pipelines import saliva


def test_saliva_chain(tmp_path):
    fq = tmp_path / "reads.fastq"
    fq.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\nIIII\n"
                  "@r3\nTTTT\n+\nIIII\n")
    cls = tmp_path / "cls.tsv"
    cls.write_text("readID\tseqID\ttaxID\n"
                   "r1\tseq\t9606\n"
                   "r2\tseq\t1280\n"
                   "r3\tseq\t9606\n")
    out = io.StringIO()
    kept, dropped = saliva.extract_human_reads(str(fq), str(cls), out=out)
    assert (kept, dropped) == (2, 1)
    assert "@r2" not in out.getvalue()

    rep = tmp_path / "report.tsv"
    rep.write_text("name\ttaxID\ttaxRank\tgenomeSize\tnumReads\n"
                   "Homo sapiens\t9606\tspecies\t3e9\t5000\n"
                   "Staph\t1280\tspecies\t2e6\t150\n"
                   "Rare\t999\tspecies\t1e6\t3\n")
    species = saliva.high_count_nonhuman_species(str(rep))
    assert species == {"1280"}

    asm = tmp_path / "asm.fasta"
    asm.write_text(">c1\nAAAA\n>c2\nCCCCCC\n")
    ccls = tmp_path / "ccls.tsv"
    ccls.write_text("readID\tseqID\ttaxID\n"
                    "c1\tx\t1280\nc2\tx\t9606\n")
    fa, bed = io.StringIO(), io.StringIO()
    names = saliva.extract_nonhuman_contigs(str(asm), str(ccls), species,
                                            fasta_out=fa, bed_out=bed)
    assert names == ["c1_nonhuman"]
    assert bed.getvalue() == "c1_nonhuman\t0\t4\n"
    assert fa.getvalue() == ">c1_nonhuman\nAAAA\n"

from cornetto_tpu.io.fasta import FastxRecord, read_fastx, open_maybe_gzip
from cornetto_tpu.io.bed import read_bed3, write_bed3, read_bedgraph_pair
from cornetto_tpu.io.paf import PafRec, parse_paf_line, read_paf

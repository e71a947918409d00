from cornetto_tpu.utils.cformat import c_round, c_div, wrap_i32, fmt_g, fmt_float
from cornetto_tpu.utils.natsort import strnum_cmp, strnum_key, mixed_numcompare, mixed_key
from cornetto_tpu.utils.parsing import parse_num_suffix

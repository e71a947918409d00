from cornetto_tpu.intervals.algebra import (IntervalSet, bed_sort, gnu_sort_bed,
                                            merge, subtract, intersect_wa)

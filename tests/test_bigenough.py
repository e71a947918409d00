"""Byte-parity for bigenough against the reference's shipped fixtures
(reference: test/test.sh:32-39, test/bigenough/hg002-cornetto-E_3/)."""

import io

import pytest

from cornetto_tpu.tools import bigenough


@pytest.mark.parametrize("inp,outbed,outcsv", [
    ("in.boringbits.bed", "out.boringbits.bed", "out.boringbits.csv"),
    ("in_dip.boringbits.bed", "out_dip.boringbits.bed",
     "out_dip.boringbits.csv"),
])
def test_fixture(bigenough_fixtures, tmp_path, inp, outbed, outcsv):
    csv_path = tmp_path / "a.txt"
    opt = bigenough.BigenoughOptions(outreadfish=str(csv_path))
    out = io.StringIO()
    bigenough.run(str(bigenough_fixtures / "chroms.bed"),
                  str(bigenough_fixtures / inp), opt, out=out)
    assert out.getvalue() == (bigenough_fixtures / outbed).read_text()
    assert csv_path.read_text() == (bigenough_fixtures / outcsv).read_text()

"""EPS -> PNG rasterizer (io.raster) on real minidot golden output."""

import io
import struct
import zlib

import numpy as np

from cornetto_tpu.io.raster import eps_to_png, rasterize_eps, write_png


def _png_dims_pixels(path):
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    # decode IDAT back to pixels to validate the encoder round-trips
    off = 8
    idat = b""
    while off < len(data):
        (ln,) = struct.unpack(">I", data[off:off + 4])
        tag = data[off + 4:off + 8]
        if tag == b"IDAT":
            idat += data[off + 8:off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * 3)
    assert np.all(img[:, 0] == 0)          # filter byte 0 per row
    return w, h, img[:, 1:].reshape(h, w, 3)


def test_rasterize_golden_minidot(gold, tmp_path):
    eps = (gold / "minidot.eps").read_text()
    img = rasterize_eps(eps, scale=1.5)
    h, w = img.shape[:2]
    # bounding box x scale
    bb = [l for l in eps.splitlines() if l.startswith("%%BoundingBox")][0]
    W, H = float(bb.split()[3]), float(bb.split()[4])
    assert (w, h) == (round(W * 1.5), round(H * 1.5))
    # the dotplot must contain red (forward) alignment pixels and the
    # frame/grid in non-white gray
    flat = img.reshape(-1, 3)
    red = np.all(flat == (255, 0, 0), axis=1) | (
        (flat[:, 0] == 255) & (flat[:, 1] == 0))
    assert int(red.sum()) > 50
    nonwhite = np.any(flat != 255, axis=1)
    assert int(nonwhite.sum()) > 1000
    # round-trip through the PNG encoder
    p = str(tmp_path / "dot.png")
    write_png(p, img)
    w2, h2, pix = _png_dims_pixels(p)
    assert (w2, h2) == (w, h)
    np.testing.assert_array_equal(pix, img)


def test_minidot_png_flag(gold, tmp_path, capsys):
    from cornetto_tpu.tools import minidot
    png = str(tmp_path / "out.png")
    ret = minidot.main(["--png", png,
                        str(gold.parent / "golden" / "fixasm_fixed.paf"),
                        "-f", "2"])
    assert ret == 0
    out = capsys.readouterr().out
    assert out.startswith("%!PS-Adobe")      # EPS still on stdout
    w, h, pix = _png_dims_pixels(png)
    assert w > 100 and h > 50
    assert int(np.any(pix != 255, axis=2).sum()) > 500


def test_eps_to_png_file(gold, tmp_path):
    p = str(tmp_path / "o.png")
    eps_to_png(str(gold / "minidot_raw.eps"), p, scale=1.0)
    w, h, pix = _png_dims_pixels(p)
    assert w > 10 and h > 10

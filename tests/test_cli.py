"""End-to-end CLI coverage (cli.main in-process on the CPU platform).

The flag surface mirrors the reference CLI (svgrasterize.py:3800-3812):
svg/path input, png output, -w, -bg, -id, --as-path; plus --platform.
In-process because a fresh subprocess pays minutes of XLA recompilation
(the persistent CPU cache does not reload across machines, CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pytest

from svgrasterize_tpu.cli import main
from svgrasterize_tpu.core.png import read_png

SVG = """<svg xmlns='http://www.w3.org/2000/svg' width='48' height='32'>
<rect id='box' x='4' y='4' width='20' height='24' fill='#d04020'/>
<circle cx='36' cy='16' r='10' fill='#2060c0'/>
</svg>"""


@pytest.fixture(scope="module")
def svg_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "doc.svg"
    path.write_text(SVG)
    return str(path)


def test_render_png(svg_file, tmp_path):
    out = str(tmp_path / "out.png")
    assert main([svg_file, out]) == 0
    img = np.asarray(read_png(open(out, "rb")))
    assert img.shape == (32, 48, 4)
    assert img[16, 10, 0] > 150 and img[16, 36, 2] > 150


def test_render_scaled(svg_file, tmp_path):
    out = str(tmp_path / "out2.png")
    assert main([svg_file, out, "-w", "96"]) == 0
    assert np.asarray(read_png(open(out, "rb"))).shape == (64, 96, 4)


def test_render_id_and_background(svg_file, tmp_path):
    out = str(tmp_path / "out3.png")
    assert main([svg_file, out, "-id", "box", "-bg", "#fffefd"]) == 0
    img = np.asarray(read_png(open(out, "rb")))
    # -id renders the sub-element at its own extent (rect is 20x24)
    assert img.shape[0] <= 32 and img.shape[1] <= 26
    assert img[12, 10, 0] > 150 and img[12, 10, 2] < 120  # the red rect
    assert (img[..., 3] == 255).all()  # -bg composes an opaque background


def test_as_path_dump(svg_file, capsys):
    assert main([svg_file, "-", "--as-path"]) == 0
    out = capsys.readouterr().out
    assert "M" in out and "Z" in out.upper()


def test_path_file_input(tmp_path):
    pfile = tmp_path / "tri.path"
    pfile.write_text("M2 2 L30 2 L16 28 Z")
    out = str(tmp_path / "tri.png")
    assert main([str(pfile), out]) == 0
    img = np.asarray(read_png(open(out, "rb")))
    assert img[4, 16, 3] > 200  # filled triangle interior


def test_cli_malformed_xml_clean_error(tmp_path, capsys):
    from svgrasterize_tpu.cli import main

    bad = tmp_path / "bad.svg"
    bad.write_text('<svg xmlns="http://www.w3.org/2000/svg"><rect')
    rc = main([str(bad), str(tmp_path / "out.png"), "--platform", "cpu"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "[error] cannot parse" in err

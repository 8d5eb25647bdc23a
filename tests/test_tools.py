"""Smoke tests for the tools/ CLIs."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from fullsubnet_tpu.data.wavio import write_wav

REPO = Path(__file__).resolve().parents[1]
ENV_PATCH = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}


def _run(args, **kw):
    import os

    env = {**os.environ, **ENV_PATCH}
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, env=env, **kw
    )


def _speech(sr=16000, seconds=1.0, seed=0, f=300):
    t = np.arange(int(sr * seconds)) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    return (0.4 * np.sin(2 * np.pi * f * t) * env).astype(np.float32)


def test_calculate_metrics_cli(tmp_path):
    sr = 16000
    ref_dir = tmp_path / "ref"
    est_dir = tmp_path / "est"
    ref_dir.mkdir()
    est_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        x = _speech(seed=i, f=250 + i * 100)
        write_wav(ref_dir / f"utt{i}.wav", x, sr)
        write_wav(est_dir / f"utt{i}.wav", x + 0.01 * rng.standard_normal(len(x)).astype(np.float32), sr)

    out = _run(
        [
            str(REPO / "tools" / "calculate_metrics.py"),
            "-R", str(ref_dir), "-E", str(est_dir),
            "-M", "SI_SDR,STOI", "--n_jobs", "2",
            "--export_dir", str(tmp_path / "export"),
        ]
    )
    assert out.returncode == 0, out.stderr
    assert "SI_SDR" in out.stdout and "STOI" in out.stdout
    assert (tmp_path / "export" / "SI_SDR.csv").exists()
    # the xlsx twin of the reference's tablib export: a real zip whose
    # sheet XML round-trips names + scores (incl. the mean row)
    import csv
    import zipfile
    import xml.etree.ElementTree as ET

    with open(tmp_path / "export" / "STOI.csv", newline="") as f:
        csv_rows = list(csv.reader(f))
    with zipfile.ZipFile(tmp_path / "export" / "STOI.xlsx") as z:
        assert not z.testzip()
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    xlsx_rows = []
    for row in ET.fromstring(sheet).iter(f"{ns}row"):
        cells = []
        for c in row.iter(f"{ns}c"):
            t = c.find(f"{ns}is/{ns}t")
            cells.append(t.text if t is not None else float(c.find(f"{ns}v").text))
        xlsx_rows.append(cells)
    assert xlsx_rows[0] == ["Speech", "STOI"]
    assert [r[0] for r in xlsx_rows[1:]] == [r[0] for r in csv_rows[1:]]
    np.testing.assert_allclose(
        [r[1] for r in xlsx_rows[1:]], [float(r[1]) for r in csv_rows[1:]]
    )
    assert xlsx_rows[-1][0] == "mean"


def test_find_wavs_cli(tmp_path):
    d = tmp_path / "wavs"
    d.mkdir()
    for n in ("a.wav", "b.wav"):
        write_wav(d / n, _speech(seconds=0.1), 16000)
    out_file = tmp_path / "list.txt"
    out = _run(
        [str(REPO / "tools" / "find_wavs.py"), "--dirs", str(d), "--output", str(out_file)]
    )
    assert out.returncode == 0, out.stderr
    lines = out_file.read_text().splitlines()
    assert len(lines) == 2 and lines[0].endswith("a.wav")


def test_preprocessing_dataset_cli(tmp_path):
    d = tmp_path / "clean"
    d.mkdir()
    # voiced, long enough
    write_wav(d / "good.wav", _speech(seconds=3.5), 16000)
    # too short
    write_wav(d / "short.wav", _speech(seconds=0.5), 16000)
    # silence
    write_wav(d / "silent.wav", np.zeros(16000 * 4, dtype=np.float32), 16000)
    out_file = tmp_path / "clean.txt"
    out = _run(
        [
            str(REPO / "tools" / "preprocessing_dataset.py"),
            "--dataset_dir", str(d), "--output", str(out_file),
            "--min_duration", "3.0", "--activity_threshold", "0.5",
        ]
    )
    assert out.returncode == 0, out.stderr
    lines = out_file.read_text().split()
    assert len(lines) == 1 and lines[0].endswith("good.wav")


def test_delete_silence_cli(tmp_path):
    sr = 16000
    for d in ("noisy", "clean", "txt"):
        (tmp_path / d).mkdir()
    x = _speech(seconds=1.0)
    write_wav(tmp_path / "noisy" / "single_AF01_x.wav", x, sr)
    write_wav(tmp_path / "clean" / "single_AF01_x.wav", x, sr)
    (tmp_path / "txt" / "single_AF01.wav.txt").write_text(
        "speech 0 4000\nsil 4000 8000\nspeech 8000 12000\n"
    )
    out = _run(
        [
            str(REPO / "tools" / "delete_silence.py"),
            "--noisy_dir", str(tmp_path / "noisy"),
            "--clean_dir", str(tmp_path / "clean"),
            "--text_dir", str(tmp_path / "txt"),
            "--dist_dir", str(tmp_path / "dist"),
        ]
    )
    assert out.returncode == 0, out.stderr
    from fullsubnet_tpu.data.wavio import read_wav

    y, _ = read_wav(tmp_path / "dist" / "clean" / "single_AF01_x.wav")
    assert len(y) == 8000  # two kept segments of 4000


def test_xlsx_numpy_scalars_and_nonfinite(tmp_path):
    # SpreadsheetML <v> must be a finite decimal literal: numpy 2.x scalars
    # repr as np.float64(...) and NaN/inf are invalid numeric cells — both
    # must serialize to something Excel accepts (review finding, round 3)
    import zipfile
    import xml.etree.ElementTree as ET

    from fullsubnet_tpu.xlsx import write_xlsx

    p = tmp_path / "t.xlsx"
    write_xlsx(
        p,
        [
            ("a", np.float64(1.5), np.int64(7), 0.1),
            ("c", 10**400, -(10**400), 2),
            ("b", float("nan"), float("inf"), True),
        ],
        headers=["name", "x", "y", "z"],
    )
    with zipfile.ZipFile(p) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "np.float64" not in sheet
    assert "<v>nan</v>" not in sheet and "<v>inf</v>" not in sheet
    root = ET.fromstring(sheet)  # must stay well-formed XML
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    rows = root.findall(".//m:row", ns)
    vals = [c.find("m:v", ns) for c in rows[1].findall("m:c", ns)]
    assert float(vals[1].text) == 1.5 and int(vals[2].text) == 7
    assert float(vals[3].text) == 0.1  # round-trips exactly at .17g

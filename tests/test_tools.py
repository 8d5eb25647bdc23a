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


def test_calculate_metrics_multichannel(tmp_path):
    # --num_channels N: per-mic est files (…_mic1/_mic2) shrink to one
    # utterance each; channel 0 (mic1) is scored (reference
    # tools/calculate_metrics.py:33-56 + reference_channel=0)
    sr = 16000
    ref_dir = tmp_path / "ref"
    est_dir = tmp_path / "est"
    ref_dir.mkdir()
    est_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        x = _speech(f=250 + i * 100)
        write_wav(ref_dir / f"utt{i}_room.wav", x, sr)
        # mic1 = near-clean (should score high), mic2 = garbage: the tool
        # must pick mic1, so SI_SDR stays high
        write_wav(
            est_dir / f"utt{i}_room_mic1.wav",
            x + 1e-4 * rng.standard_normal(len(x)).astype(np.float32), sr,
        )
        write_wav(
            est_dir / f"utt{i}_room_mic2.wav",
            rng.standard_normal(len(x)).astype(np.float32), sr,
        )

    out = _run(
        [
            str(REPO / "tools" / "calculate_metrics.py"),
            "-R", str(ref_dir), "-E", str(est_dir),
            "-M", "SI_SDR", "--n_jobs", "2", "--num_channels", "2",
        ]
    )
    assert out.returncode == 0, out.stderr
    si_sdr = float(out.stdout.split("SI_SDR:")[1].split("±")[0])
    assert si_sdr > 30.0, out.stdout  # mic2 would score << 0

    # shrink helper parity: strips the trailing _micN token
    sys.path.insert(0, str(REPO / "tools"))
    from calculate_metrics import shrink_multi_channel_path

    shrunk = shrink_multi_channel_path(
        ["a_rev_mic1.wav", "a_rev_mic2.wav", "b_rev_mic1.wav", "b_rev_mic2.wav"], 2
    )
    assert shrunk == ["a_rev.wav", "b_rev.wav"]


def test_calculate_metrics_multichannel_est_file(tmp_path):
    # an est FILE with 2 channels: channel 0 is scored (reference
    # compute_metric loads mono=False and takes est_wav[0])
    sr = 16000
    ref_dir = tmp_path / "ref"
    est_dir = tmp_path / "est"
    ref_dir.mkdir()
    est_dir.mkdir()
    x = _speech()
    write_wav(ref_dir / "u.wav", x, sr)
    stereo = np.stack([x, np.zeros_like(x)], axis=0)  # [C, T]
    write_wav(est_dir / "u.wav", stereo, sr)
    out = _run(
        [
            str(REPO / "tools" / "calculate_metrics.py"),
            "-R", str(ref_dir), "-E", str(est_dir),
            "-M", "SI_SDR", "--n_jobs", "1",
        ]
    )
    assert out.returncode == 0, out.stderr
    si_sdr = float(out.stdout.split("SI_SDR:")[1].split("±")[0])
    # channel 0 == ref exactly; a channel AVERAGE (half amplitude + zeros)
    # would still be high — but a channel-0 pick is bit-identical
    assert si_sdr > 50.0, out.stdout


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

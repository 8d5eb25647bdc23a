"""Released-checkpoint parity gate: certify this framework against the
reference PyTorch implementation with the SAME released weights.

Given a released FullSubNet checkpoint (the ``.tar`` from the reference's
release page — see /root/reference/docs/source/usage/release.md), this
tool loads the weights into BOTH the reference torch model (imported
read-only from /root/reference as the oracle) and our JAX model (via the
checkpoint converter), then certifies, per utterance:

1. **Mask parity** — the predicted cRM from both models on the same
   noisy magnitudes: ``max |ours - torch|`` must be <= ``--mask-tol``
   (default 1e-3).
2. **Enhancement parity** — the full ``full_band_crm_mask`` pipeline
   (mirrors /root/reference/recipes/dns_interspeech_2020/inferencer.py:131-146:
   cRM decompress -> complex mask multiply -> iSTFT) run through our
   inferencer vs the torch-side math; PESQ / STOI computed on both
   enhanced signals against clean must agree within ``--pesq-tol`` /
   ``--stoi-tol`` (defaults 0.01 / 0.001 — the BASELINE.json gate).

Inputs: either a DNS-style directory pair (``--noisy-dir``/``--clean-dir``,
e.g. the DNS-1 no_reverb testset the release tables quote) or, with no
dirs, a bundled deterministic synthetic testbed so the gate runs the
moment the weights land with zero extra downloads.

Usage:
    python tools/parity_gate.py -C /path/to/fullsubnet_best_model_58epochs.tar
    python tools/parity_gate.py -C ckpt.tar --noisy-dir .../no_reverb/noisy \
        --clean-dir .../no_reverb/clean --limit 150

Exit code 0 = all gates pass; 1 = any gate fails. One JSON line on
stdout carries the full verdict (also written with ``-O``).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _synthetic_pairs(n=4, sr=16000, seconds=4.0, seed=20260817):
    """Deterministic clean/noisy pairs: band-limited harmonic 'speech'
    with amplitude modulation + colored noise at mixed SNRs."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    pairs = []
    for i in range(n):
        f0 = 90.0 + 40.0 * rng.random()
        clean = np.zeros_like(t, dtype=np.float64)
        for k in range(1, 12):
            clean += rng.random() / k * np.sin(
                2 * np.pi * (k * f0) * t + rng.random() * 6.28
            )
        # syllabic-rate envelope with pauses
        env = 0.5 * (1 + np.sin(2 * np.pi * (2.0 + rng.random()) * t))
        env *= (np.sin(2 * np.pi * 0.4 * t + rng.random() * 6.28) > -0.4)
        clean *= env
        clean /= np.max(np.abs(clean)) + 1e-9
        noise = rng.standard_normal(len(t))
        # pink-ish tilt
        spec = np.fft.rfft(noise)
        spec /= np.maximum(1.0, np.arange(len(spec))) ** 0.4
        noise = np.fft.irfft(spec, len(t))
        noise /= np.std(noise) + 1e-12
        snr = (-2.0, 2.0, 7.0, 12.0)[i % 4]
        noise *= np.std(clean) * 10 ** (-snr / 20)
        noisy = clean + noise
        peak = np.max(np.abs(noisy)) + 1e-9
        pairs.append((
            f"synthetic_{i}_snr{snr:+.0f}dB",
            (clean / peak * 0.9).astype(np.float32),
            (noisy / peak * 0.9).astype(np.float32),
        ))
    return pairs


def _dir_pairs(noisy_dir, clean_dir, limit):
    from fullsubnet_tpu.data.wavio import read_wav

    noisy_dir, clean_dir = Path(noisy_dir), Path(clean_dir)
    pairs = []
    for npath in sorted(noisy_dir.glob("*.wav"))[: limit or None]:
        # DNS convention: noisy "..._fileid_N.wav" -> clean "clean_fileid_N.wav"
        fileid = npath.stem.split("fileid_")[-1]
        cands = list(clean_dir.glob(f"*fileid_{fileid}.wav")) or [
            clean_dir / npath.name
        ]
        if not cands[0].exists():
            continue
        ns, sr = read_wav(npath)
        cs, _ = read_wav(cands[0])
        n = min(len(ns), len(cs))
        pairs.append((npath.stem, cs[:n], ns[:n]))
    if not pairs:
        raise SystemExit(f"no usable wav pairs under {noisy_dir}")
    return pairs


def _load_torch_reference(state_dict):
    """Reference torch FullSubNet (flagship recipe config) with the
    released weights — imported read-only from /root/reference."""
    import torch

    from tests._reference_loader import load_reference_model

    ref_mod = load_reference_model("fullsubnet")
    tmodel = ref_mod.Model(
        num_freqs=257,
        look_ahead=2,
        sequence_model="LSTM",
        fb_num_neighbors=0,
        sb_num_neighbors=15,
        fb_output_activate_function="ReLU",
        sb_output_activate_function=False,
        fb_model_hidden_size=512,
        sb_model_hidden_size=384,
        norm_type="offline_laplace_norm",
        num_groups_in_drop_band=2,
        weight_init=False,
    )
    tmodel.load_state_dict(
        {k: torch.as_tensor(v) for k, v in state_dict.items()}
    )
    return tmodel.eval()


def _torch_enhance(tmodel, noisy, n_fft=512, hop=256, win=512):
    """Reference full_band_crm_mask pipeline in torch
    (inferencer.py:131-146)."""
    import torch

    x = torch.from_numpy(noisy)[None]
    window = torch.hann_window(win)
    c = torch.stft(
        x, n_fft, hop_length=hop, win_length=win, window=window,
        return_complex=True,
    )
    mag, real, imag = c.abs(), c.real, c.imag
    with torch.no_grad():
        crm = tmodel(mag.unsqueeze(1)).permute(0, 2, 3, 1)
    raw = crm
    # decompress_cIRM incl. the ±9.9 clamp (audio_zen/acoustics/mask.py)
    crm = torch.clamp(crm, -9.9, 9.9)
    crm = -10.0 * torch.log((10.0 - crm) / (10.0 + crm))
    er = crm[..., 0] * real - crm[..., 1] * imag
    ei = crm[..., 1] * real + crm[..., 0] * imag
    enhanced = torch.istft(
        torch.complex(er, ei), n_fft, hop_length=hop, win_length=win,
        window=window, length=x.size(-1),
    )
    # raw (pre-decompress) mask for the model-output delta check
    return raw.squeeze(0).numpy(), enhanced.squeeze(0).numpy()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-C", "--checkpoint", required=True,
                    help="released torch checkpoint .tar")
    ap.add_argument("--noisy-dir", help="DNS-style noisy wav dir")
    ap.add_argument("--clean-dir", help="matching clean wav dir")
    ap.add_argument("--limit", type=int, default=0,
                    help="max utterances from the dirs (0 = all)")
    ap.add_argument("--n-synthetic", type=int, default=4,
                    help="bundled-testbed utterance count")
    ap.add_argument("--synthetic-seconds", type=float, default=4.0)
    ap.add_argument("--mask-tol", type=float, default=1e-3)
    ap.add_argument("--pesq-tol", type=float, default=0.01)
    ap.add_argument("--stoi-tol", type=float, default=0.001)
    ap.add_argument("-O", "--output", help="write the JSON verdict here too")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from fullsubnet_tpu.acoustics.stft import istft, stft_complex
    from fullsubnet_tpu.checkpoint import convert_fullsubnet, load_torch_state_dict
    from fullsubnet_tpu.acoustics.mask import decompress_cIRM
    from fullsubnet_tpu.metrics import STOI, WB_PESQ
    from fullsubnet_tpu.models import FullSubNet

    state = load_torch_state_dict(args.checkpoint)
    tmodel = _load_torch_reference(state)
    params = convert_fullsubnet(state)
    model = FullSubNet()

    if args.noisy_dir:
        if not args.clean_dir:
            raise SystemExit("--noisy-dir requires --clean-dir")
        pairs = _dir_pairs(args.noisy_dir, args.clean_dir, args.limit)
    else:
        pairs = _synthetic_pairs(
            n=args.n_synthetic, seconds=args.synthetic_seconds
        )

    sr = 16000
    rows = []
    ok = True
    for name, clean, noisy in pairs:
        crm_t, enh_t = _torch_enhance(tmodel, noisy)

        spec = stft_complex(jnp.asarray(noisy)[None], 512, 256, 512)
        mag = jnp.abs(spec)[:, None]
        crm_j = model(params, mag)  # [1, 2, F, T]
        crm_j = jnp.transpose(crm_j, (0, 2, 3, 1))
        mask_delta = float(jnp.max(jnp.abs(crm_j - crm_t[None])))

        crm_d = decompress_cIRM(crm_j)
        er = crm_d[..., 0] * spec.real - crm_d[..., 1] * spec.imag
        ei = crm_d[..., 1] * spec.real + crm_d[..., 0] * spec.imag
        enh_j = np.asarray(
            istft(er + 1j * ei, 512, 256, 512, length=len(noisy))
        )[0]

        pesq_t = float(WB_PESQ(clean, enh_t))
        pesq_j = float(WB_PESQ(clean, enh_j))
        stoi_t = float(STOI(clean, enh_t, sr=sr))
        stoi_j = float(STOI(clean, enh_j, sr=sr))
        row = {
            "utt": name,
            "mask_max_delta": mask_delta,
            "pesq_torch": round(pesq_t, 4),
            "pesq_ours": round(pesq_j, 4),
            "pesq_delta": round(abs(pesq_j - pesq_t), 4),
            "stoi_torch": round(stoi_t, 5),
            "stoi_ours": round(stoi_j, 5),
            "stoi_delta": round(abs(stoi_j - stoi_t), 5),
            "wave_max_delta": float(np.max(np.abs(enh_j - enh_t))),
        }
        row["pass"] = bool(
            mask_delta <= args.mask_tol
            and row["pesq_delta"] <= args.pesq_tol
            and row["stoi_delta"] <= args.stoi_tol
        )
        ok &= row["pass"]
        rows.append(row)
        print(
            f"  {name}: mask Δ{mask_delta:.2e} "
            f"PESQ {pesq_j:.3f} (ref {pesq_t:.3f}) "
            f"STOI {stoi_j:.4f} (ref {stoi_t:.4f}) "
            f"{'PASS' if row['pass'] else 'FAIL'}",
            file=sys.stderr,
        )

    verdict = {
        "gate": "released-checkpoint-parity",
        "checkpoint": str(args.checkpoint),
        "testbed": "dns-dirs" if args.noisy_dir else "bundled-synthetic",
        "n_utterances": len(rows),
        "pass": bool(ok),
        "mask_max_delta": max(r["mask_max_delta"] for r in rows),
        "pesq_max_delta": max(r["pesq_delta"] for r in rows),
        "stoi_max_delta": max(r["stoi_delta"] for r in rows),
        "mean_pesq_ours": round(float(np.mean([r["pesq_ours"] for r in rows])), 4),
        "mean_stoi_ours": round(float(np.mean([r["stoi_ours"] for r in rows])), 5),
        "utterances": rows,
    }
    line = json.dumps(verdict)
    print(line)
    if args.output:
        Path(args.output).write_text(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

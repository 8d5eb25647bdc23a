#!/usr/bin/env python
"""Offline metric computation CLI.

Twin of the reference ``tools/calculate_metrics.py``: aligns
estimated/reference wav lists (directory or scp; dns_1/dns_2 fileid
matching), computes metrics in a parallel worker pool, prints means, and
optionally exports CSV + xlsx (dependency-free OOXML writer, matching
the reference's tablib Excel export).

    python tools/calculate_metrics.py \
        -R /path/to/clean_dir_or_scp -E /path/to/enhanced_dir_or_scp \
        -M SI_SDR,STOI [-D dns_1] [--export_dir out/]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from fullsubnet_tpu.data.datasets import find_audio_files
from fullsubnet_tpu.data.wavio import read_wav
from fullsubnet_tpu.metrics import REGISTERED_METRICS
from fullsubnet_tpu.utils import prepare_empty_dir


def load_wav_paths_from_scp(scp_path: str) -> list[str]:
    with open(os.path.abspath(os.path.expanduser(scp_path))) as f:
        return [os.path.abspath(os.path.expanduser(ln.rstrip("\n"))) for ln in f]


def get_basename(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def shrink_multi_channel_path(
    full_dataset_list: list[str], num_channels: int
) -> list[str]:
    """Collapse a per-microphone file list to one logical path per utterance.

    Twin of the reference ``tools/calculate_metrics.py:33-56``: the list is
    grouped in blocks of ``num_channels`` consecutive files (e.g.
    ``..._mic1.wav``/``..._mic2.wav``) and each group is represented by its
    first member with the trailing ``_micN`` token stripped.
    """
    assert len(full_dataset_list) % num_channels == 0, "Num error"
    shrunk = []
    for index in range(0, len(full_dataset_list), num_channels):
        full_path = full_dataset_list[index]
        shrunk.append(f"{'_'.join(full_path.split('_')[:-1])}.wav")
    assert len(shrunk) == len(full_dataset_list) // num_channels
    return shrunk


def check_two_aligned_list(a, b):
    assert len(a) == len(b), (
        f"The length of two lists are not equal: {len(a)} vs {len(b)}"
    )
    for z, (i, j) in enumerate(zip(a, b), start=1):
        assert get_basename(i) == get_basename(j), (
            f"There are different names in {z}\n\t {i}\n\t{j}."
        )


def pre_processing(est, ref, specific_dataset=None, num_channels=1):
    ref = Path(ref).expanduser().absolute()
    est = Path(est).expanduser().absolute()

    reference_wav_paths = (
        find_audio_files(ref) if ref.is_dir() else load_wav_paths_from_scp(str(ref))
    )
    estimated_wav_paths = (
        find_audio_files(est) if est.is_dir() else load_wav_paths_from_scp(str(est))
    )

    if num_channels > 1:
        # Per-mic estimated files (…_mic1.wav, …_mic2.wav): score channel 0
        # of each utterance (the reference's reference_channel = 0,
        # tools/calculate_metrics.py:102-104) and align the SHRUNK names
        # (sans _micN) against the single-channel references.
        if specific_dataset:
            raise NotImplementedError(
                "--num_channels > 1 is only supported with directory/scp "
                "alignment, not with -D dataset matching."
            )
        shrunk = shrink_multi_channel_path(estimated_wav_paths, num_channels)
        channel0 = estimated_wav_paths[::num_channels]
        check_two_aligned_list(reference_wav_paths, shrunk)
        return reference_wav_paths, channel0

    if not specific_dataset:
        check_two_aligned_list(reference_wav_paths, estimated_wav_paths)
    else:
        reordered = []
        if specific_dataset == "dns_1":
            # match "clean_fileid_<id>" references by estimated name suffix
            for ref_path in reference_wav_paths:
                for est_path in estimated_wav_paths:
                    est_base = get_basename(est_path)
                    if (
                        "clean_" + "_".join(est_base.split("_")[-2:])
                        == get_basename(ref_path)
                    ):
                        reordered.append(est_path)
        elif specific_dataset == "dns_2":
            for ref_path in reference_wav_paths:
                for est_path in estimated_wav_paths:
                    file_id = get_basename(est_path).split("_")[-1]
                    if f"synthetic_clean_fileid_{file_id}" == get_basename(ref_path):
                        reordered.append(est_path)
        else:
            raise NotImplementedError(
                f"Not supported specific dataset {specific_dataset}."
            )
        # a missing or doubly-matched estimated file must be an error, not
        # a silent off-by-one that pairs every later est with the wrong ref
        assert len(reordered) == len(reference_wav_paths), (
            f"{specific_dataset} matching paired {len(reordered)} estimated "
            f"files with {len(reference_wav_paths)} references — check for "
            "missing or ambiguously named estimated files"
        )
        estimated_wav_paths = reordered
    return reference_wav_paths, estimated_wav_paths


def _one(args):
    ref_path, est_path, sr, metric_type = args
    metric_function = REGISTERED_METRICS[metric_type]
    # reference-tool channel conventions (tools/calculate_metrics.py:134-137):
    # ref is librosa mono (channel AVERAGE); a multichannel est file is
    # loaded mono=False and channel 0 is scored
    ref_wav, _ = read_wav(ref_path, sr=sr, mono=True)
    est_wav, _ = read_wav(est_path, sr=sr, mono=False)
    if est_wav.ndim > 1:
        est_wav = est_wav[0]
    if len(ref_wav) != len(est_wav):
        print(
            f"[Warning] ref {len(ref_wav)} and est {len(est_wav)} are not "
            "in the same length"
        )
    n = min(len(ref_wav), len(est_wav))
    return get_basename(ref_path), float(metric_function(ref_wav[:n], est_wav[:n], sr=sr))


def compute_metric(reference_wav_paths, estimated_wav_paths, sr, metric_type, n_jobs=40):
    assert metric_type in REGISTERED_METRICS, f"Unsupported metric: {metric_type}."
    from joblib import Parallel, delayed

    tasks = [
        (r, e, sr, metric_type)
        for r, e in zip(reference_wav_paths, estimated_wav_paths)
    ]
    return Parallel(n_jobs=n_jobs)(delayed(_one)(t) for t in tasks)


def main(args):
    reference_wav_paths, estimated_wav_paths = pre_processing(
        args.estimated,
        args.reference,
        args.specific_dataset.lower() or None,
        num_channels=args.num_channels,
    )

    export_dir = None
    if args.export_dir:
        export_dir = Path(args.export_dir).expanduser().absolute()
        prepare_empty_dir([export_dir])

    print(f"=== {args.estimated} === {args.reference} ===")
    for metric_type in args.metric_types.split(","):
        rows = compute_metric(
            reference_wav_paths,
            estimated_wav_paths,
            args.sr,
            metric_type=metric_type,
            n_jobs=args.n_jobs,
        )
        values = [v for _, v in rows]
        print(f"{metric_type}: {np.mean(values):.4f} ± {np.std(values):.4f}")

        if export_dir:
            import csv

            with open(export_dir / f"{metric_type}.csv", "w", newline="") as f:
                writer = csv.writer(f)
                writer.writerow(["filename", metric_type])
                writer.writerows(rows)
                writer.writerow(["mean", float(np.mean(values))])

            # Excel workbook, matching the reference's tablib export
            # surface (tools/calculate_metrics.py:184-196) — one
            # <metric>.xlsx per metric with (Speech, metric) columns
            from fullsubnet_tpu.xlsx import write_xlsx

            write_xlsx(
                export_dir / f"{metric_type}.xlsx",
                rows + [("mean", float(np.mean(values)))],
                headers=("Speech", metric_type),
                sheet_name=metric_type,
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Calculate speech-enhancement metrics offline."
    )
    parser.add_argument("-R", "--reference", required=True, type=str)
    parser.add_argument("-E", "--estimated", required=True, type=str)
    parser.add_argument(
        "-M", "--metric_types", default="SI_SDR,STOI", type=str,
        help=f"Comma-separated; choose from {sorted(REGISTERED_METRICS)}",
    )
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument(
        "-D", "--specific_dataset", type=str, default="",
        help="dns_1 | dns_2 (manual est/ref alignment)",
    )
    parser.add_argument("--export_dir", type=str, default="")
    parser.add_argument("--n_jobs", type=int, default=40)
    parser.add_argument(
        "--num_channels", type=int, default=1,
        help="Per-mic estimated files per utterance (…_mic1.wav …_micN.wav); "
        "channel 0 is scored against the single-channel reference",
    )
    main(parser.parse_args())

"""Training runtime: pjit data-parallel trainer with the reference's
recipe semantics.

Twin of ``audio_zen/trainer/base_trainer.py`` + the per-recipe trainers
(``recipes/dns_interspeech_2020/*/trainer.py``), redesigned for TPU:

* One jitted SPMD train step over a device mesh: batch sharded on the
  ``data`` axis, params replicated; the gradient mean appears as an XLA
  psum over ICI (replacing DDP/NCCL). ``dist.barrier`` is unnecessary —
  collectives synchronize the step.
* bf16 compute policy replaces CUDA AMP/GradScaler (no loss scaling needed
  on TPU); master params stay fp32 in Adam.
* Target construction (STFT → cIRM → drop_band) happens inside the jitted
  step, device-resident.
* Checkpoints via Orbax with the latest/best/epoch-NNNN triplet
  (``base_trainer.py:194-237`` semantics), resume and warm-start preload.
* Validation improves on the reference (which idles all non-zero ranks,
  ``base_trainer.py:380``): every process enhances its shard and metrics
  reduce across hosts.
* Model selection score = (STOI + norm-PESQ)/2 (``base_trainer.py:364-370``)
  on the With_reverb split (``fullsubnet/trainer.py:181``), with PESQ from
  the native P.862 implementation (``fullsubnet_tpu.pesq``).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fullsubnet_tpu import config as config_lib
from fullsubnet_tpu.acoustics.feature import drop_band
from fullsubnet_tpu.acoustics.mask import (
    build_complex_ideal_ratio_mask,
    decompress_cIRM,
)
from fullsubnet_tpu.acoustics.stft import istft, stft_complex
from fullsubnet_tpu.checkpoint import CheckpointManager, load_torch_state_dict
from fullsubnet_tpu.data.loader import DataLoader
from fullsubnet_tpu.metrics import (
    SI_SDR,
    STOI,
    pesq_available,
    transform_pesq_range,
)
from fullsubnet_tpu.parallel.mesh import (
    batch_sharding,
    local_shard_info,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from fullsubnet_tpu.utils import ExecutionTime, prepare_empty_dir

logger = logging.getLogger(__name__)


class Trainer:
    # fold the on-device per-step loss list to the host every N steps
    # (bounds device-buffer count on 1e5+-step epochs; surfaces NaN
    # losses within a window instead of at epoch end)
    _LOSS_FOLD_STEPS = 256

    def __init__(
        self,
        config: dict,
        resume: bool = False,
        only_validation: bool = False,
        preloaded_model_path: str | None = None,
        output_dir: str | None = None,
        experiment_name: str = "experiment",
    ):
        self.config = config
        self.acoustics = config_lib.acoustics_args(config)
        trainer_cfg = config.get("trainer", {})
        self.train_cfg = trainer_cfg.get("train", {})
        self.val_cfg = trainer_cfg.get("validation", {})
        self.vis_cfg = trainer_cfg.get("visualization", {})

        self.epochs = int(self.train_cfg.get("epochs", 9999))
        self.save_checkpoint_interval = int(
            self.train_cfg.get("save_checkpoint_interval", 1)
        )
        self.validation_interval = int(self.val_cfg.get("validation_interval", 1))
        self.save_max_metric_score = bool(
            self.val_cfg.get("save_max_metric_score", True)
        )
        assert self.save_checkpoint_interval >= 1
        assert self.validation_interval >= 1
        self.only_validation = only_validation

        # host-RSS watchdog: at each epoch boundary, if the process's
        # resident set exceeds this many GB, write a resumable `latest`
        # checkpoint and re-exec (or exit 75 for a supervisor to restart
        # with -R). Guards long trainings against host-side memory growth
        # outside our control — e.g. the axon remote-PJRT client leaks
        # every host->device transfer's full size (measured: a 20k-step
        # run OOM-killed at 130 GB RSS), and a leaky co-tenant process
        # can squeeze the host the same way. 0 disables.
        self.host_rss_recycle_gb = float(
            self.train_cfg.get("host_rss_recycle_gb", 0)
        )
        # set by the CLI: the argv to re-exec for a self-managed recycle
        # (always includes -R); None means exit(75) and let the launching
        # supervisor (tools/train_quality.py, tools/train_soak.py) resume
        self.recycle_argv: list[str] | None = None

        self.seed = int(config.get("meta", {}).get("seed", 0))
        self.use_bf16 = bool(config.get("meta", {}).get("use_amp", False))

        # --- mesh + model -------------------------------------------------
        # [trainer.mesh] data/subband picks the mesh shape; default = all
        # devices on the data axis. `subband` > 1 spreads FullSubNet's
        # frequency-batched sub-band scan across chips (the reference can
        # only approximate this by *discarding* bands via drop_band).
        # `slices` > 1 lays the data axis out slice-major for multi-slice
        # pods: gradient sync reduces over ICI within each slice and
        # crosses DCN only once (see parallel/mesh.py:make_mesh).
        mesh_cfg = trainer_cfg.get("mesh", {})
        self.mesh = make_mesh(
            num_data=(
                int(mesh_cfg["data"]) if mesh_cfg.get("data") else None
            ),
            num_subband=int(mesh_cfg.get("subband", 1)),
            num_slices=int(mesh_cfg.get("slices", 1)),
        )
        self.num_devices = int(np.prod(self.mesh.devices.shape))

        self.model, model_init_kwargs = config_lib.build_model(config)
        self.loss_function = config_lib.build_loss(config)
        self.optimizer = config_lib.build_optimizer(config)

        key = jax.random.PRNGKey(self.seed)
        params = self.model.init(key, **model_init_kwargs)
        opt_state = self.optimizer.init(params)
        self.state = {
            "params": params,
            "opt_state": opt_state,
            "epoch": jnp.asarray(0, jnp.int32),
            # reference base_trainer.py:90: -inf when selecting on a
            # maximize metric, +inf for minimize-metric configs
            "best_score": jnp.asarray(
                -jnp.inf if self.save_max_metric_score else jnp.inf,
                jnp.float32,
            ),
        }

        # --- experiment dirs ---------------------------------------------
        save_dir = output_dir or config.get("meta", {}).get("save_dir", "runs")
        self.save_dir = Path(save_dir).expanduser().absolute() / experiment_name
        self.checkpoints_dir = self.save_dir / "checkpoints"
        self.logs_dir = self.save_dir / "logs"
        prepare_empty_dir([self.checkpoints_dir, self.logs_dir], resume=resume)
        self.ckpt = CheckpointManager(self.checkpoints_dir)

        if resume:
            self._resume_checkpoint()
        if preloaded_model_path:
            assert not resume, "Resume conflicts with preloaded model."
            self._preload_model(preloaded_model_path)

        self.state = replicate(self.state, self.mesh)

        # --- data ---------------------------------------------------------
        shard_index, num_shards = local_shard_info(self.mesh)
        self.train_dataset = config_lib.build_dataset(
            config["train_dataset"], "train"
        )
        dl_cfg = config["train_dataset"].get("dataloader", {})
        batch_size = int(dl_cfg.get("batch_size", 32))
        num_data_shards = int(self.mesh.devices.shape[0])
        assert batch_size % num_data_shards == 0, (
            f"batch_size={batch_size} must be divisible by the number of "
            f"devices on the data axis ({num_data_shards})."
        )
        # batch_size is the GLOBAL batch; each process loads its shard of
        # it and shard_batch assembles the global device array
        assert batch_size % num_shards == 0, (
            f"batch_size={batch_size} must be divisible by the process "
            f"count ({num_shards})."
        )
        self.train_loader = DataLoader(
            self.train_dataset,
            batch_size=batch_size // num_shards,
            shuffle=True,
            drop_last=bool(dl_cfg.get("drop_last", True)),
            num_workers=int(dl_cfg.get("num_workers", 0)),
            seed=self.seed,
            shard_index=shard_index,
            num_shards=num_shards,
        )
        self.valid_dataset = (
            config_lib.build_dataset(config["validation_dataset"], "validation")
            if "validation_dataset" in config
            else None
        )

        # --- logging -------------------------------------------------------
        self.writer = self._make_writer()
        self._dump_config()

        # --- compiled step -------------------------------------------------
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------
    # step construction
    # ------------------------------------------------------------------

    def _model_drop_band_groups(self) -> int:
        return int(getattr(self.model, "num_groups_in_drop_band", 0) or 0)

    def _is_waveform_model(self) -> bool:
        from fullsubnet_tpu.models import ImprovedFullSubNet

        return isinstance(self.model, ImprovedFullSubNet)

    def _build_train_step(self):
        a = self.acoustics
        n_fft, hop, win = a["n_fft"], a["hop_length"], a["win_length"]
        groups = self._model_drop_band_groups()
        waveform_model = self._is_waveform_model()
        loss_fn_inner = self.loss_function
        model = self.model
        optimizer = self.optimizer
        use_bf16 = self.use_bf16
        import inspect

        # models with a `training` kwarg route their sub-band stage through
        # the fused pipeline + custom-VJP Pallas kernel under jax.grad
        call_params = inspect.signature(model.__call__).parameters
        train_kwargs = {"training": True} if "training" in call_params else {}
        if "sharding_hint" in call_params and self.num_devices > 1:
            # spread the frequency-batched sub-band rows over the FULL mesh
            # (data x subband); the Pallas kernel shard_maps over the same
            # axes (rows are independent sequences, so the split is exact)
            from jax.sharding import NamedSharding, PartitionSpec as P

            sb_sh = NamedSharding(self.mesh, P(("data", "subband"), None, None))

            def sb_hint(x):
                return jax.lax.with_sharding_constraint(x, sb_sh)

            sb_hint.mesh = self.mesh
            sb_hint.row_axes = ("data", "subband")
            train_kwargs["sharding_hint"] = sb_hint

        def loss_fn(params, noisy, clean):
            if use_bf16:
                params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    params,
                )
            if waveform_model:
                enhanced = model(params, noisy, **train_kwargs)[:, 0]
                return loss_fn_inner(enhanced.astype(jnp.float32), clean)

            noisy_spec = stft_complex(noisy, n_fft, hop, win)
            clean_spec = stft_complex(clean, n_fft, hop, win)
            ground_truth_cirm = build_complex_ideal_ratio_mask(
                noisy_spec.real, noisy_spec.imag, clean_spec.real, clean_spec.imag
            )  # [B, F, T, 2]
            batch = noisy.shape[0]
            if groups > 1 and batch > groups:
                ground_truth_cirm = jnp.transpose(
                    drop_band(
                        jnp.transpose(ground_truth_cirm, (0, 3, 1, 2)), groups
                    ),
                    (0, 2, 3, 1),
                )
            noisy_mag = jnp.abs(noisy_spec)[:, None]
            if use_bf16:
                noisy_mag = noisy_mag.astype(jnp.bfloat16)
            crm = model(params, noisy_mag, **train_kwargs)  # [B, 2, F', T]
            crm = jnp.transpose(crm, (0, 2, 3, 1)).astype(jnp.float32)
            return loss_fn_inner(crm, ground_truth_cirm)

        # Gradient accumulation: [trainer.train] grad_accum_steps = N
        # forces a split, 1 disables, 0/absent = auto. Auto asks the
        # model's capacity picker (recommended_grad_accum) for the split
        # that maximizes measured audio-s/s — microbatching dominates the
        # in-step capacity escapes because each microbatch runs the plain
        # fused step (v5e, flagship: B=256 x 3.072 s 1220 audio-s/s vs
        # 887 time-chunked; B=256 x 30 s 986 vs 852 row-group remat).
        # Equal microbatches keep mean-reduced losses/grads exact; the
        # per-microbatch drop_band pattern matches the reference's
        # distributed semantics (applied per local DDP batch).
        accum_cfg = int(self.train_cfg.get("grad_accum_steps", 0))
        hop = a["hop_length"]
        data_div = int(self.mesh.shape.get("data", 1))

        def pick_accum(b, num_samples):
            if accum_cfg:
                from fullsubnet_tpu.train.accum import (
                    largest_compatible_accum,
                )

                g = largest_compatible_accum(accum_cfg, b, data_div)
                if g != accum_cfg:
                    # trace-time (static shapes): fires once per batch
                    # shape, not per step
                    logger.warning(
                        "grad_accum_steps=%d does not divide batch %d "
                        "(data axis %d); using the nearest compatible "
                        "split G=%d",
                        accum_cfg, b, data_div, g,
                    )
                return g
            picker = getattr(model, "recommended_grad_accum", None)
            if picker is None:
                return 1
            t = num_samples // hop + 1
            itemsize = 2 if use_bf16 else 4
            extra = 0
            if device_synth:
                # raw mixture components (clean + noise [B, L] f32 and
                # the RIR buffer) are live through the whole fused step
                # and shard over the data axis only — they shrink the
                # headroom the accum picker can hand the train step
                r = int(getattr(self.train_dataset, "rir_samples", 1))
                extra = (2 * b * num_samples + b * r) * 4 // max(data_div, 1)
            return picker(
                b, t, itemsize=itemsize,
                drop_groups=groups if groups > 1 and b > groups else 1,
                mesh=self.mesh if self.num_devices > 1 else None,
                extra_bytes=extra,
            )

        def microbatches(x, g):
            """[B, S] -> [G, B/G, S] with each microbatch still sharded
            over the data axis and NO cross-device movement: the split
            happens inside each device's contiguous shard (any equal
            partition of the batch is semantically equivalent — the
            mean-reduced grads are exact either way)."""
            b = x.shape[0]
            if data_div > 1:
                x = x.reshape(data_div, g, b // (data_div * g), -1)
                x = jnp.swapaxes(x, 0, 1).reshape(g, b // g, -1)
            else:
                x = x.reshape(g, b // g, -1)
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P(None, "data", None))
            )

        # device synthesis: the loader ships raw mixture components and
        # the mixing DSP (RIR reverb, SNR mix, loudness, clip rescue)
        # runs batched INSIDE this jitted step — the host does IO only
        # (data/device_mixer.py; [train_dataset.args] device_synthesis)
        device_synth = bool(
            getattr(self.train_dataset, "device_synthesis", False)
        )
        if device_synth:
            from fullsubnet_tpu.data.device_mixer import (
                make_device_synthesis,
            )

            synthesize = make_device_synthesis(
                target_db_fs=float(self.train_dataset.target_dB_FS)
            )

        def step(state, noisy, clean):
            g_accum = pick_accum(noisy.shape[0], noisy.shape[1])
            if g_accum > 1:
                from fullsubnet_tpu.train.accum import (
                    scan_accumulated_value_and_grad,
                )

                nm = microbatches(noisy, g_accum)
                cm = microbatches(clean, g_accum)
                loss, grads = scan_accumulated_value_and_grad(
                    loss_fn, state["params"], (nm, cm), g_accum
                )
            else:
                loss, grads = jax.value_and_grad(loss_fn)(
                    state["params"], noisy, clean
                )
                grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            updates, opt_state = optimizer.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            new_state = {**state, "params": params, "opt_state": opt_state}
            return new_state, loss

        data_sh = batch_sharding(self.mesh, ndim=2)
        repl = replicated_sharding(self.mesh)
        state_sh = jax.tree.map(lambda _: repl, self.state)
        if device_synth:
            vec_sh = batch_sharding(self.mesh, ndim=1)

            def step_synth(state, clean_c, noise_c, rir_c, flags, snr_c, tdb):
                noisy, clean = synthesize(
                    (clean_c, noise_c, rir_c, flags, snr_c, tdb)
                )
                return step(state, noisy, clean)

            return jax.jit(
                step_synth,
                in_shardings=(
                    state_sh, data_sh, data_sh, data_sh,
                    vec_sh, vec_sh, vec_sh,
                ),
                out_shardings=(state_sh, repl),
                donate_argnums=(0,),
            )
        return jax.jit(
            step,
            in_shardings=(state_sh, data_sh, data_sh),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def _resume_checkpoint(self):
        target = jax.tree.map(np.asarray, self.state)
        restored = self.ckpt.restore("latest", target)
        self.state = jax.tree.map(jnp.asarray, restored)
        print(
            f"Model checkpoint loaded. Training will begin at "
            f"{int(self.state['epoch']) + 1} epoch."
        )

    def _preload_model(self, path: str):
        path = Path(path).expanduser().absolute()
        assert path.exists(), f"The file {path} is not exist."
        if path.is_dir():
            # resolve against the directory the user actually passed —
            # typically another experiment's checkpoints dir, not this
            # (freshly created) experiment's
            from fullsubnet_tpu.checkpoint import CheckpointManager

            restored = CheckpointManager(path.parent, recover=False).restore(
                path.name
            )
            self.state["params"] = jax.tree.map(jnp.asarray, restored["params"])
        else:  # torch checkpoint warm start
            from fullsubnet_tpu.checkpoint import CONVERTERS
            from fullsubnet_tpu.infer.inferencer import _model_key_from_path

            key = _model_key_from_path(self.config["model"].get("path", ""))
            state_dict = load_torch_state_dict(path)
            loaded = CONVERTERS[key](state_dict)
            cur_struct = jax.tree.structure(self.state["params"])
            new_struct = jax.tree.structure(loaded)
            if cur_struct != new_struct:
                raise ValueError(
                    f"Preloaded checkpoint {path} does not match the "
                    f"configured model architecture: params tree "
                    f"{new_struct} vs model {cur_struct}"
                )
            mismatches = [
                (jax.tree_util.keystr(kp), tuple(cur.shape), tuple(new.shape))
                for (kp, cur), new in zip(
                    jax.tree_util.tree_flatten_with_path(self.state["params"])[0],
                    jax.tree.leaves(loaded),
                )
                if tuple(cur.shape) != tuple(new.shape)
            ]
            if mismatches:
                details = "; ".join(
                    f"{k}: model {a} vs checkpoint {b}" for k, a, b in mismatches[:5]
                )
                raise ValueError(
                    f"Preloaded checkpoint {path} does not match the "
                    f"configured model architecture: {details}"
                )
            self.state["params"] = loaded
        print(f"Model preloaded successfully from {path}.")

    def _save_checkpoint(
        self, epoch: int, is_best: bool, keep_weights_history: bool = True
    ):
        host_state = jax.tree.map(np.asarray, self.state)
        self.ckpt.save(
            host_state, epoch, is_best=is_best,
            keep_weights_history=keep_weights_history,
        )

    def _is_best_epoch(self, score: float) -> bool:
        best = float(np.asarray(self.state["best_score"]))
        if self.save_max_metric_score and score >= best:
            self.state["best_score"] = jnp.asarray(score, jnp.float32)
            return True
        if not self.save_max_metric_score and score <= best:
            self.state["best_score"] = jnp.asarray(score, jnp.float32)
            return True
        return False

    # ------------------------------------------------------------------
    # logging
    # ------------------------------------------------------------------

    def _make_writer(self):
        if jax.process_index() != 0:
            return None
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(log_dir=str(self.logs_dir), flush_secs=30)
        except Exception:
            return None

    def _dump_config(self):
        """Experiment bookkeeping: timestamped config dump + source state.

        The reference copies the full source tree into the experiment dir
        (``base_trainer.py:124-134``); we record the git commit + working
        diff instead — same reproducibility, none of the bloat.
        """
        if jax.process_index() != 0:
            return
        stamp = time.strftime("%Y-%m-%d--%H-%M-%S")
        with open(self.save_dir / f"{stamp}.json", "w") as f:
            json.dump(self.config, f, indent=2, default=str)
        try:
            import subprocess

            root = Path(__file__).resolve().parents[2]
            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=root,
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
            diff = subprocess.run(
                ["git", "diff", "HEAD"], cwd=root,
                capture_output=True, text=True, timeout=10,
            ).stdout
            (self.save_dir / f"{stamp}.source.txt").write_text(
                f"commit: {rev}\n\n{diff}"
            )
        except Exception:
            pass

    def _log_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    # ------------------------------------------------------------------
    # epochs
    # ------------------------------------------------------------------

    def _train_epoch(self, epoch: int):
        # keep losses on device during the epoch: a float() per step
        # would host-sync every step, serializing dispatch of batch k+1
        # against step k (expensive through a remote PJRT tunnel). Fold
        # the window to the host every _LOSS_FOLD_STEPS so a long epoch
        # holds a bounded number of tiny device buffers and a NaN loss
        # surfaces within a window, not at epoch end — the fold syncs
        # on step k - window while step k is already dispatched, so the
        # hot path stays async.
        losses = []
        loss_sum, loss_count = 0.0, 0

        def fold(pending):
            nonlocal loss_sum, loss_count
            window = np.asarray(jax.device_get(pending), np.float64)
            if not np.isfinite(window).all():
                bad = int(np.flatnonzero(~np.isfinite(window))[0])
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch} step "
                    f"~{loss_count + bad}: {window[bad]}"
                )
            loss_sum += float(window.sum())
            loss_count += len(window)

        self.train_loader.set_epoch(epoch)
        for batch in self.train_loader:
            # (noisy, clean) — or the 6 raw components under device
            # synthesis; either way batch-sharded over the data axis
            batch = shard_batch(
                tuple(jnp.asarray(x) for x in batch), self.mesh
            )
            self.state, loss = self._train_step(self.state, *batch)
            losses.append(loss)
            if len(losses) > self._LOSS_FOLD_STEPS:
                # fold everything but the just-dispatched step's loss, so
                # the device_get never waits on step k itself — step k+1's
                # dispatch overlaps step k's execution
                fold(losses[:-1])
                losses = losses[-1:]
        if losses:
            fold(losses)  # epoch tail keeps the finiteness check too
        if loss_count:
            mean = loss_sum / loss_count
            self._log_scalar("Loss/Train", mean, epoch)
            return mean
        return 0.0

    def _build_enhance_fn(self):
        """Jitted full enhancement + validation loss (compiled once per
        utterance length). The loss matches the reference's validation loss
        (``fullsubnet/trainer.py:160-169``): criterion(cRM, cIRM) with no
        drop_band for mask models, criterion(enhanced, clean) for waveform
        models."""
        a = self.acoustics
        model = self.model
        waveform = self._is_waveform_model()
        loss_fn_inner = self.loss_function
        from fullsubnet_tpu.infer.inferencer import model_call_kwargs

        kwargs = model_call_kwargs(model)

        def fn(params, noisy_j, clean_j):
            if waveform:
                enhanced = model(params, noisy_j)[:, 0]
                return enhanced, loss_fn_inner(enhanced, clean_j)
            spec = stft_complex(
                noisy_j, a["n_fft"], a["hop_length"], a["win_length"]
            )
            noisy_mag = jnp.abs(spec)[:, None]
            crm = model(params, noisy_mag, **kwargs)
            crm = jnp.transpose(crm, (0, 2, 3, 1))
            clean_spec = stft_complex(
                clean_j, a["n_fft"], a["hop_length"], a["win_length"]
            )
            cirm = build_complex_ideal_ratio_mask(
                spec.real, spec.imag, clean_spec.real, clean_spec.imag
            )
            loss = loss_fn_inner(crm, cirm)
            crm = decompress_cIRM(crm)
            er = crm[..., 0] * spec.real - crm[..., 1] * spec.imag
            ei = crm[..., 1] * spec.real + crm[..., 0] * spec.imag
            enhanced = istft(
                (er, ei),
                a["n_fft"],
                a["hop_length"],
                a["win_length"],
                length=noisy_j.shape[-1],
                input_type="real_imag",
            )
            return enhanced, loss

        return jax.jit(fn)

    def _bucketing_supported(self) -> bool:
        """Length-bucketed validation enhancement is exact only for models
        that implement ``valid_frames``: offline norms get masked
        statistics (mean / unbiased second moment over the true frame
        count), the causal norms (cumulative/forgetting) are unaffected
        by zero-padded tails by construction. Requires unidirectional
        stacks — a bidirectional RNN would leak pad frames backward.
        One gate shared with the Inferencer/serving bucketed paths.

        Wave-to-wave models bucket through ``valid_samples`` instead,
        when the validation loss has an exact masked form."""
        from fullsubnet_tpu.infer.inferencer import (
            bucketed_capable,
            time_domain_bucketed_capable,
        )
        from fullsubnet_tpu.train.loss import MASKED_WAVEFORM_LOSSES

        if self._is_waveform_model():
            return (
                time_domain_bucketed_capable(self.model)
                and self.loss_function in MASKED_WAVEFORM_LOSSES
            )
        return bucketed_capable(self.model, "full_band_crm_mask")

    def _build_bucketed_enhance_fn(self):
        """Bucketed twin of ``_build_enhance_fn``: inputs are zero-padded
        to a length bucket and the true sample count rides along as a
        traced scalar, so ONE compile serves every utterance length in the
        bucket — and the result over the true samples is EXACTLY the
        unpadded run's:

        * the offline center-pad's tail reflection is re-created at the
          true length with a dynamic slice/update,
        * padded spectrum frames are zeroed before the model and the model
          computes its norm statistics with the true count
          (``valid_frames``),
        * the masked iSTFT excludes padded frames from both signal and
          envelope, and the masked-MSE loss rescales to the true count.

        Wave-to-wave models (Improved FullSubNet) instead pass the true
        sample count straight to the model (``valid_samples`` re-creates
        the tail reflection and masks the internal norms/iSTFT) and the
        waveform loss takes its exact masked form
        (``loss.masked_waveform_loss``).
        """
        from fullsubnet_tpu.acoustics.stft import (
            insert_tail_reflection,
            traced_num_frames,
        )
        from fullsubnet_tpu.infer.inferencer import model_call_kwargs
        from fullsubnet_tpu.train.loss import masked_waveform_loss

        bucket_kwargs = model_call_kwargs(self.model)
        a = self.acoustics
        model = self.model
        loss_fn_inner = self.loss_function
        n_fft, hop, win = a["n_fft"], a["hop_length"], a["win_length"]

        if self._is_waveform_model():

            def fn_td(params, noisy_j, clean_j, true_len):
                smask = (
                    jnp.arange(noisy_j.shape[-1]) < true_len
                ).astype(jnp.float32)
                enhanced = (
                    model(params, noisy_j, valid_samples=true_len)[:, 0]
                    * smask
                )
                loss = masked_waveform_loss(
                    loss_fn_inner, enhanced, clean_j, smask, true_len
                )
                return enhanced, loss

            return jax.jit(fn_td)

        def reflect(y, true_len):  # y: [1, bucket]
            return insert_tail_reflection(y[0], true_len, n_fft)[None]

        def fn(params, noisy_j, clean_j, true_len):
            spec = stft_complex(
                reflect(noisy_j, true_len), n_fft, hop, win
            )
            t_pad = spec.shape[-1]
            frames_real = traced_num_frames(true_len, hop, n_fft)
            tmask = (jnp.arange(t_pad) < frames_real).astype(jnp.float32)
            noisy_mag = jnp.abs(spec)[:, None] * tmask
            crm = model(params, noisy_mag, valid_frames=frames_real,
                        **bucket_kwargs)
            crm = jnp.transpose(crm, (0, 2, 3, 1))
            clean_spec = stft_complex(
                reflect(clean_j, true_len), n_fft, hop, win
            )
            cirm = build_complex_ideal_ratio_mask(
                spec.real, spec.imag, clean_spec.real, clean_spec.imag
            )
            # masked loss == loss over the real frames only
            m4 = tmask[None, None, :, None]
            loss = loss_fn_inner(crm * m4, cirm * m4) * (
                t_pad / frames_real.astype(jnp.float32)
            )
            crm = decompress_cIRM(crm)
            er = (crm[..., 0] * spec.real - crm[..., 1] * spec.imag) * tmask
            ei = (crm[..., 1] * spec.real + crm[..., 0] * spec.imag) * tmask
            enhanced = istft(
                (er, ei), n_fft, hop, win,
                length=noisy_j.shape[-1],
                input_type="real_imag",
                frame_mask=tmask,
            )
            return enhanced, loss

        return jax.jit(fn)

    # validation utterances are padded up to a multiple of this many
    # seconds (+ one FFT frame of reflection headroom): a handful of
    # compiles serve any utterance-length distribution
    _BUCKET_SECONDS = 1.0

    def _enhance_utterance(self, noisy: np.ndarray, clean: np.ndarray):
        """Full enhancement + validation loss of one utterance, host API
        (jit-cached per LENGTH BUCKET for models supporting masked norms,
        per exact length otherwise)."""
        length = int(min(len(noisy), len(clean)))
        # the bucketed path's tail reflection needs length > n_fft//2
        # (dynamic_slice would clamp a negative start and insert wrong
        # data); degenerate ultra-short utterances take the exact path
        if self._bucketing_supported() and length > self.acoustics["n_fft"] // 2:
            if not hasattr(self, "_enhance_bucket_fn"):
                self._enhance_bucket_fn = self._build_bucketed_enhance_fn()
            step = int(self._BUCKET_SECONDS * self.acoustics["sr"])
            n_fft = self.acoustics["n_fft"]
            bucket = -(-(length + n_fft) // step) * step
            noisy_b = np.zeros(bucket, np.float32)
            clean_b = np.zeros(bucket, np.float32)
            noisy_b[:length] = noisy[:length]
            clean_b[:length] = clean[:length]
            enhanced, loss = self._enhance_bucket_fn(
                self.state["params"],
                jnp.asarray(noisy_b)[None],
                jnp.asarray(clean_b)[None],
                jnp.asarray(length, jnp.int32),
            )
            return np.asarray(enhanced[0][:length]), float(loss)

        if not hasattr(self, "_enhance_fn"):
            self._enhance_fn = self._build_enhance_fn()
        enhanced, loss = self._enhance_fn(
            self.state["params"],
            jnp.asarray(noisy[:length])[None],
            jnp.asarray(clean[:length])[None],
        )
        return np.asarray(enhanced[0]), float(loss)

    def spec_audio_visualization(self, noisy, enhanced, clean, name, epoch, sr):
        """Audio clips + magma spectrogram triptych to TensorBoard
        (reference ``base_trainer.py:277-314``)."""
        if self.writer is None:
            return
        try:  # tensorboardX audio encoding needs soundfile; optional
            self.writer.add_audio(f"Audio/{name}_Noisy", noisy[:, None], epoch, sample_rate=sr)
            self.writer.add_audio(f"Audio/{name}_Enhanced", enhanced[:, None], epoch, sample_rate=sr)
            self.writer.add_audio(f"Audio/{name}_Clean", clean[:, None], epoch, sample_rate=sr)
        except Exception:
            pass

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            a = self.acoustics
            fig, axes = plt.subplots(3, 1, figsize=(6, 6))
            for ax, (y, label) in zip(
                axes, [(noisy, "Noisy"), (enhanced, "Enhanced"), (clean, "Clean")]
            ):
                # host-side spectrogram: TB figures must not burn device
                # time (and extra device programs destabilize the remote
                # tunnel this runs through — measured: an on-device stft
                # here broke the NEXT utterance's validation transfer)
                n_fft, hop = a["n_fft"], a["hop_length"]
                win = np.hanning(a["win_length"] + 1)[:-1]
                if len(win) < n_fft:  # torch-style center pad to n_fft
                    lp = (n_fft - len(win)) // 2
                    win = np.pad(win, (lp, n_fft - len(win) - lp))
                yp = np.pad(np.asarray(y, np.float32), (n_fft // 2, n_fft // 2), mode="reflect")
                starts = np.arange(0, len(yp) - n_fft + 1, hop)
                frames = yp[starts[:, None] + np.arange(n_fft)] * win
                mag = np.abs(np.fft.rfft(frames, axis=1)).T
                ax.imshow(
                    20 * np.log10(mag + 1e-8),
                    origin="lower", aspect="auto", cmap="magma",
                )
                ax.set_title(
                    f"{label}: mean {np.mean(y):.3f}, std {np.std(y):.3f}"
                )
            plt.tight_layout()
            self.writer.add_figure(f"Spectrogram/{name}", fig, epoch)
            plt.close(fig)
        except Exception:
            pass

    def _psum_across_processes(self, arr: np.ndarray) -> np.ndarray:
        """Element-wise sum of a host array over all JAX processes (no-op
        single-process). The cross-host reduction behind sharded
        validation — the reference instead idles every non-zero rank
        (``base_trainer.py:380``)."""
        if jax.process_count() == 1:
            return arr
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(jnp.asarray(arr))
        return np.asarray(gathered).sum(axis=0)

    def metrics_visualization(self, rows, epoch: int, all_types=None) -> float:
        """Parallel metric computation + Noisy-vs-Enhanced scalars
        (reference ``base_trainer.py:316-370``). rows: list of
        (noisy, clean, enhanced, speech_type) — the LOCAL shard; per-type
        metric sums reduce across processes before scoring, so every host
        returns the same global score. ``all_types``: the full speech-type
        set (must agree across hosts); defaults to the local rows' types."""
        sr = self.acoustics["sr"]
        use_pesq = pesq_available()
        n_jobs = int(self.vis_cfg.get("num_workers", 10))

        from joblib import Parallel, delayed

        keys = ["stoi_n", "stoi_e", "sisdr_n", "sisdr_e"]
        if use_pesq:
            keys += ["pesq_n", "pesq_e"]

        def one(noisy, clean, enhanced):
            out = {
                "stoi_n": STOI(clean, noisy, sr=sr),
                "stoi_e": STOI(clean, enhanced, sr=sr),
                "sisdr_n": SI_SDR(clean, noisy, sr=sr),
                "sisdr_e": SI_SDR(clean, enhanced, sr=sr),
            }
            if use_pesq:
                from fullsubnet_tpu.metrics import WB_PESQ

                out["pesq_n"] = WB_PESQ(clean, noisy, sr=sr)
                out["pesq_e"] = WB_PESQ(clean, enhanced, sr=sr)
            return out

        per_type: dict[str, list] = {}
        results = Parallel(n_jobs=n_jobs)(
            delayed(one)(n, c, e) for n, c, e, _ in rows
        )
        for (_, _, _, speech_type), res in zip(rows, results):
            per_type.setdefault(speech_type, []).append(res)

        if all_types is None:
            all_types = sorted(per_type)
        # [type, metric-sums + count] — one reduction for everything
        mat = np.array(
            [
                [
                    float(sum(it[k] for it in per_type.get(t, [])))
                    for k in keys
                ]
                + [float(len(per_type.get(t, [])))]
                for t in all_types
            ],
            np.float64,
        ).reshape(len(all_types), len(keys) + 1)
        mat = self._psum_across_processes(mat)

        scores = {}
        for speech_type, row in zip(all_types, mat):
            count = row[-1]
            if count == 0:
                continue
            mean = dict(zip(keys, row[:-1] / count))
            self._log_scalar(f"Validation/STOI_{speech_type}_Noisy", mean["stoi_n"], epoch)
            self._log_scalar(f"Validation/STOI_{speech_type}_Enhanced", mean["stoi_e"], epoch)
            self._log_scalar(f"Validation/SI_SDR_{speech_type}_Noisy", mean["sisdr_n"], epoch)
            self._log_scalar(f"Validation/SI_SDR_{speech_type}_Enhanced", mean["sisdr_e"], epoch)
            if use_pesq:
                self._log_scalar(
                    f"Validation/WB_PESQ_{speech_type}_Noisy", mean["pesq_n"], epoch
                )
                self._log_scalar(
                    f"Validation/WB_PESQ_{speech_type}_Enhanced", mean["pesq_e"], epoch
                )
                # reference model-selection score (base_trainer.py:364-370)
                scores[speech_type] = (
                    mean["stoi_e"] + transform_pesq_range(mean["pesq_e"])
                ) / 2
            else:
                scores[speech_type] = mean["stoi_e"]

        # reference selects on the With_reverb split (fullsubnet/trainer.py:181)
        if "With_reverb" in scores:
            score = scores["With_reverb"]
        else:
            score = float(np.mean(list(scores.values()))) if scores else 0.0
        # the model-selection score itself (the reference only consumes it
        # for best-checkpoint selection; logging it makes the trajectory
        # auditable — tools/train_soak.py reads it back)
        self._log_scalar("Validation/Score", score, epoch)
        return score

    def _validation_epoch(self, epoch: int) -> float:
        """Sharded validation: process p enhances utterances p, p+P, ...;
        per-type losses and metric sums reduce across hosts, so all
        processes compute (and agree on) the global score. Fixes the
        reference's rank-0-only validation (``base_trainer.py:380``)."""
        if self.valid_dataset is None:
            return 0.0
        sr = self.acoustics["sr"]
        n_samples_vis = int(self.vis_cfg.get("n_samples", 10))
        num_procs = jax.process_count()
        pid = jax.process_index()
        total = len(self.valid_dataset)

        rows = []
        loss_sum: dict[str, float] = {}
        loss_cnt: dict[str, int] = {}
        for i in range(pid, total, num_procs):
            noisy, clean, name, speech_type = self.valid_dataset[i]
            enhanced, val_loss = self._enhance_utterance(noisy, clean)
            length = min(len(enhanced), len(clean))
            enhanced, clean_c, noisy_c = (
                enhanced[:length], clean[:length], noisy[:length],
            )
            rows.append((noisy_c, clean_c, enhanced, speech_type))
            loss_sum[speech_type] = loss_sum.get(speech_type, 0.0) + val_loss
            loss_cnt[speech_type] = loss_cnt.get(speech_type, 0) + 1
            if i < n_samples_vis:
                self.spec_audio_visualization(
                    noisy_c, enhanced, clean_c, f"{speech_type}_{name}", epoch, sr
                )

        if hasattr(self.valid_dataset, "speech_type_of"):
            # full type set from path metadata — consistent across hosts
            all_types = sorted(
                {self.valid_dataset.speech_type_of(i) for i in range(total)}
            )
        else:
            # local types only: fine single-process, but with sharding the
            # hosts could disagree on the matrix shape/order
            assert num_procs == 1, (
                "multi-host sharded validation needs the dataset to expose "
                "speech_type_of(i) so every host agrees on the type set"
            )
            all_types = sorted(loss_cnt)

        # per-type validation loss (reference fullsubnet/trainer.py:160-169)
        loss_mat = np.array(
            [
                [loss_sum.get(t, 0.0), float(loss_cnt.get(t, 0))]
                for t in all_types
            ],
            np.float64,
        ).reshape(len(all_types), 2)
        loss_mat = self._psum_across_processes(loss_mat)
        for speech_type, (s, c) in zip(all_types, loss_mat):
            if c > 0:
                self._log_scalar(f"Validation/Loss_{speech_type}", s / c, epoch)

        return self.metrics_visualization(rows, epoch, all_types=all_types)

    def train(self):
        self._install_preemption_hook()
        start_epoch = int(np.asarray(self.state["epoch"])) + 1
        for epoch in range(start_epoch, self.epochs + 1):
            print(f"{'=' * 15} epoch {epoch} {'=' * 15}")
            timer = ExecutionTime()

            if self.only_validation:
                score = self._validation_epoch(epoch)
                if self._is_best_epoch(score):
                    self._save_checkpoint(epoch, is_best=True)
                return

            self._train_epoch(epoch)
            self.state["epoch"] = jnp.asarray(epoch, jnp.int32)

            if epoch % self.save_checkpoint_interval == 0:
                self._save_checkpoint(epoch, is_best=False)

            if epoch % self.validation_interval == 0:
                print(
                    f"[{timer.duration():.2f} seconds] Training has finished, "
                    "validation is in progress..."
                )
                score = self._validation_epoch(epoch)
                if self._is_best_epoch(score):
                    self._save_checkpoint(epoch, is_best=True)

            print(f"[{timer.duration():.2f} seconds] This epoch is finished.")
            if epoch < self.epochs:
                self._maybe_recycle(epoch)

    # ------------------------------------------------------------------
    # host-RSS recycle (graceful mid-training process replacement)
    # ------------------------------------------------------------------

    @staticmethod
    def _host_rss_gb() -> float:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1]) / 2**20
        except OSError:
            pass
        return 0.0

    # exit code signalling a PLANNED recycle (EX_TEMPFAIL): supervisors
    # must relaunch with -R and not count it as a failure
    RECYCLE_EXIT_CODE = 75

    def _maybe_recycle(self, epoch: int):
        """Checkpoint-and-replace this process when host RSS crosses the
        configured threshold. The `latest` checkpoint is written first
        (atomic Orbax swap), so the resumed process continues at
        epoch + 1 with zero lost work — unlike an OOM kill, which loses
        everything since the last scheduled checkpoint."""
        if not self.host_rss_recycle_gb or jax.process_count() > 1:
            # multi-host: one host exec'ing would desync the collective;
            # rely on the preemption/restart story there
            return
        rss = self._host_rss_gb()
        if rss < self.host_rss_recycle_gb:
            return
        print(
            f"[recycle] host RSS {rss:.1f} GB >= "
            f"{self.host_rss_recycle_gb:.1f} GB after epoch {epoch}: "
            "checkpointing and replacing the process to reclaim memory."
        )
        self._save_checkpoint(epoch, is_best=False, keep_weights_history=False)
        import os
        import sys

        try:
            if self.writer is not None:
                self.writer.close()
        except Exception:
            pass
        sys.stdout.flush()
        sys.stderr.flush()
        if self.recycle_argv:
            # exec replaces the image in-place: same PID, fresh heap.
            # Python's non-inheritable fds close across exec, so the
            # multiprocessing forkserver/resource-tracker wind down on
            # their control-pipe EOF.
            os.execv(self.recycle_argv[0], self.recycle_argv)
        os._exit(self.RECYCLE_EXIT_CODE)

    def _install_preemption_hook(self):
        """TPU-pod preemption safety: on SIGTERM, write a resumable
        ``latest`` checkpoint before exiting (the reference's only recovery
        is manual restart with -R; here the restart always has a fresh
        resume point)."""
        import os
        import signal
        import sys

        def handler(signum, frame):
            epoch = int(np.asarray(self.state["epoch"]))
            print(f"SIGTERM received: checkpointing epoch {epoch} before exit.")
            try:
                self._save_checkpoint(epoch, is_best=False)
            finally:
                # hard exit: sys.exit raises SystemExit from whatever frame
                # the signal interrupted, and interpreter shutdown then joins
                # non-daemon threads — observed to deadlock forever when the
                # signal lands mid device call (backend service threads never
                # join). The save above is synchronous (atomic Orbax swap has
                # committed), so skipping cleanup is safe once buffered TB
                # events are flushed; a preempted trainer that never exits
                # would hold the TPU past its grace window.
                try:
                    if self.writer is not None:
                        self.writer.flush()
                except Exception:
                    pass
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(143)

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # not in the main thread (tests)
